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
