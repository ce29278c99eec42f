"""Orbax checkpoint layout: epoch-tagged save/load/latest (``utils/utils.py:
264-321`` semantics)."""

import numpy as np
import jax.numpy as jnp

from mumpy_tpu.train import checkpoint as ckpt


def _state(seed):
    rng = np.random.default_rng(seed)
    return {
        "params": {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)},
        "opt": {"mu": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)},
        "step": jnp.asarray(seed, jnp.int32),
    }


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path / "run")
    s3, s7 = _state(3), _state(7)
    ckpt.save(d, s3, epoch=3, extra={"best_val_loss": 0.5})
    ckpt.save(d, s7, epoch=7)

    assert ckpt.available_epochs(d) == [3, 7]

    template = _state(0)
    r3 = ckpt.load_epoch(d, template, 3)
    np.testing.assert_array_equal(np.asarray(r3["params"]["w"]),
                                  np.asarray(s3["params"]["w"]))
    latest = ckpt.load_latest(d, template)
    np.testing.assert_array_equal(np.asarray(latest["opt"]["mu"]),
                                  np.asarray(s7["opt"]["mu"]))
    assert int(latest["step"]) == 7

    # metadata record written alongside (``save_checkpoint`` pickles args)
    import json, os

    meta = json.load(open(os.path.join(d, "meta_3.json")))
    assert meta == {"epoch": 3, "best_val_loss": 0.5}


def test_load_latest_empty(tmp_path):
    assert ckpt.load_latest(str(tmp_path / "none"), {"a": jnp.zeros(1)}) is None
