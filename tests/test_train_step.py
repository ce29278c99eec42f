"""Train-step tests on the virtual 8-device CPU mesh: sharded step runs, loss drops,
and the three LR groups are labeled like the reference's optimizer split."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mumpy_tpu.configs.model_config import tiny_config
from mumpy_tpu.parallel.mesh import make_mesh, shard_batch
from mumpy_tpu.train.optim import OptimConfig, label_params
from mumpy_tpu.train.trainer import create_train_state, make_jitted_steps


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    opt = OptimConfig(lr=1e-2, lr_cnn=1e-3, lr_cva=1e-2, accumulation_steps=1)
    state = create_train_state(cfg, opt, iter_max=100, rng=jax.random.PRNGKey(0))
    return cfg, opt, state


def test_label_split(setup):
    _, _, state = setup
    labels = label_params(state.params)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(labels)
    vals = set(flat.values())
    assert vals == {"enc", "dec", "cva"}
    for k, v in flat.items():
        if any("cva" in p for p in k):
            assert v == "cva"
        elif "decoder" in k[:2]:
            assert v == "dec"


def test_sharded_train_step_runs_and_learns(setup):
    cfg, opt, state = setup
    assert jax.device_count() == 8, "conftest must provide 8 virtual CPU devices"
    mesh, jtrain, jval = make_jitted_steps(make_mesh())

    rng = np.random.default_rng(0)
    kb = 8  # one per device
    batch = {
        "image": rng.standard_normal((kb, 3, cfg.image_size, cfg.image_size, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(kb, cfg.image_size * cfg.image_size)) > 0.8).astype(np.float32),
    }
    batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)

    losses = []
    for _ in range(5):
        state, m = jtrain(state, batch, key)
        losses.append(float(m["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss should drop when overfitting one batch: {losses}"

    vm = jval(state, batch)
    assert np.isfinite(float(vm["total"]))


def test_bf16_train_step(setup):
    """Mixed precision: bf16 forward/backward with f32 master params still learns."""
    cfg, opt, _ = setup
    state = create_train_state(cfg, opt, iter_max=100, rng=jax.random.PRNGKey(2))
    mesh, jtrain, _ = make_jitted_steps(make_mesh(), compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    batch = {
        "image": rng.standard_normal((8, 3, cfg.image_size, cfg.image_size, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(8, cfg.image_size * cfg.image_size)) > 0.8).astype(np.float32),
    }
    batch = shard_batch(batch, mesh)
    losses = []
    for _ in range(4):
        state, m = jtrain(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # master params stay f32
    assert all(
        x.dtype == jnp.float32
        for x in jax.tree_util.tree_leaves(state.params)
    )


def test_accumulation_steps(setup):
    cfg, _, _ = setup
    opt = OptimConfig(accumulation_steps=2)
    state = create_train_state(cfg, opt, iter_max=100, rng=jax.random.PRNGKey(1))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    rng = np.random.default_rng(1)
    batch = {
        "image": rng.standard_normal((2, 3, cfg.image_size, cfg.image_size, 3)).astype(np.float32),
        "mask": np.zeros((2, cfg.image_size * cfg.image_size), np.float32),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    from mumpy_tpu.train.trainer import train_step

    # first micro-step: params unchanged (grads only accumulated)
    state, _ = train_step(state, batch, jax.random.PRNGKey(0))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    # second micro-step: update applied
    state, _ = train_step(state, batch, jax.random.PRNGKey(0))
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p2))


def test_train_scan_unroll_parity(setup):
    """cfg.train_scan_unroll only changes scheduling (lax.scan unroll), not
    math or rng consumption: losses over two steps match the rolled scan."""
    import dataclasses

    cfg, opt, _ = setup
    from mumpy_tpu.train.trainer import train_step

    rng = np.random.default_rng(4)
    batch = {
        "image": rng.standard_normal(
            (2, 3, cfg.image_size, cfg.image_size, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(2, cfg.image_size**2)) > 0.8).astype(
            np.float32),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    losses = {}
    for unroll in (False, True):
        c = dataclasses.replace(cfg, train_scan_unroll=unroll,
                                drop_path_rate=0.1)
        state = create_train_state(c, opt, iter_max=100,
                                   rng=jax.random.PRNGKey(5))
        ls = []
        for i in range(2):
            state, m = train_step(state, batch, jax.random.PRNGKey(i))
            ls.append(float(m["total"]))
        losses[unroll] = ls
    np.testing.assert_allclose(losses[False], losses[True], rtol=2e-6)


def test_uint8_batch_matches_f32(setup):
    """uint8 images normalized on-device give the same loss as the host-
    normalized f32 path (DataLoader normalize_on_host=False contract)."""
    cfg, opt, _ = setup
    from mumpy_tpu.configs.data_config import MEAN, STD
    from mumpy_tpu.train.trainer import val_step

    state = create_train_state(cfg, opt, iter_max=100, rng=jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (2, 3, cfg.image_size, cfg.image_size, 3),
                      dtype=np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - np.asarray(MEAN, np.float32)) / \
        np.asarray(STD, np.float32)
    mask = (rng.uniform(size=(2, cfg.image_size**2)) > 0.8).astype(np.float32)

    m_u8 = val_step(state, {"image": jnp.asarray(u8), "mask": jnp.asarray(mask)})
    m_f32 = val_step(state, {"image": jnp.asarray(f32), "mask": jnp.asarray(mask)})
    np.testing.assert_allclose(
        float(m_u8["total"]), float(m_f32["total"]), rtol=1e-6)
