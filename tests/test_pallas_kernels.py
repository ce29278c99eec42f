"""Correctness of the fused window-attention kernel vs the XLA reference math.

Runs in Pallas interpret mode on CPU; the same kernel compiles for TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mumpy_tpu.ops.pallas.window_attention import fused_window_attention


def _reference(q, k, v, bias_rows):
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("rqd,rkd->rqk", q, k) * scale + bias_rows
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("rqk,rkd->rqd", p, v)


@pytest.mark.parametrize("n,d,heads,windows", [(49, 32, 3, 4), (16, 32, 4, 2)])
def test_fused_window_attention_interpret(n, d, heads, windows):
    rng = np.random.default_rng(0)
    r = windows * heads * 2  # 2 batch elements
    q = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)), jnp.float32)

    out = fused_window_attention(q, k, v, bias, interpret=True)
    ref = _reference(q, k, v, jnp.tile(bias, (r // heads, 1, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_window_attention_period_full():
    # bias period == full window*head block (shifted-window case)
    rng = np.random.default_rng(1)
    windows, heads, n, d = 4, 2, 49, 16
    p = windows * heads
    r = p * 3
    q = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((p, n, n)), jnp.float32)
    out = fused_window_attention(q, k, v, bias, interpret=True)
    ref = _reference(q, k, v, jnp.tile(bias, (3, 1, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_window_attention_large_period():
    # bias period > the 64-row tile target (e.g. 192 windows x 4 heads at stage 0
    # of the 224^2 model) — exercises per-step periodic bias block indexing
    rng = np.random.default_rng(3)
    p, n, d = 96, 49, 16  # period 96 > 64 -> tile 48, 2 bias blocks
    r = p * 2
    q = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((r, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((p, n, n)), jnp.float32)
    out = fused_window_attention(q, k, v, bias, interpret=True)
    ref = _reference(q, k, v, jnp.tile(bias, (2, 1, 1)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shift", [0, 2])
def test_window_attention_module_fused_matches_einsum(shift):
    """The model's WindowAttention produces identical outputs and gradients on the
    fused (interpret-mode pallas) and pure-XLA paths, incl. the shifted-mask case."""
    from mumpy_tpu.models.swin import SwinBlock
    from mumpy_tpu.ops.pallas import window_attention as pwa

    rng = np.random.default_rng(2)
    b, hw, c, heads, win = 2, 8, 12, 3, 4
    x = jnp.asarray(rng.standard_normal((b, hw * hw, c)), jnp.float32)
    blk = SwinBlock(dim=c, input_resolution=(hw, hw), num_heads=heads,
                    window_size=win, shift_size=shift)
    params = blk.init(jax.random.PRNGKey(0), x)

    def loss(p, xx):
        return jnp.sum(blk.apply(p, xx) ** 2)

    try:
        pwa.set_mode("off")
        ref, ref_grads = jax.value_and_grad(loss)(params, x)
        pwa.set_mode("interpret")
        got, got_grads = jax.value_and_grad(loss)(params, x)
    finally:
        pwa.set_mode(None)

    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)
    flat_r = jax.tree_util.tree_leaves(ref_grads)
    flat_g = jax.tree_util.tree_leaves(got_grads)
    for a, g in zip(flat_r, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a), atol=2e-4, rtol=2e-3)
