"""Baseline single-view ablation model family (``modelFactory.py:76-93``,
``encoder.py:22-30``, ``decoder.py:228-284``)."""

import jax
import jax.numpy as jnp
import numpy as np

from mumpy_tpu.models.baseline import (BaselineModel, create_baseline,
                                       tiny_baseline_config)


def test_baseline_forward_and_grad():
    cfg = tiny_baseline_config()
    model = BaselineModel(cfg)
    clip = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), clip)
    logits = model.apply(params, clip)
    assert logits.shape == (2, cfg.image_size, cfg.image_size, 1)
    assert np.isfinite(np.asarray(logits)).all()

    g = jax.grad(lambda p: jnp.mean(model.apply(p, clip) ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_baseline_factory_default_shape():
    model = create_baseline()
    assert model.cfg.num_features == 1024  # embed 128 * 2^3 (``swinTransformer.py:544``)
