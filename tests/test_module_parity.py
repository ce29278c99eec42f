"""Module-level cross-framework parity: flax modules vs independent torch math
on transplanted weights (SURVEY.md §4 oracle (c)).

The torch side is written from the Swin formulas (qkv projection, relative
position bias lookup, windowed softmax attention, pre-LN MLP) — not imported
from anywhere — and our weight layout conventions (kernel transposes) are
exercised in the torch->flax direction.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from flax.traverse_util import flatten_dict, unflatten_dict

from mumpy_tpu.models.swin import SwinBlock, WindowAttention, relative_position_index


def _torch_window_attention(x, wqkv, bqkv, wproj, bproj, table, idx, heads):
    """(B_, N, C) windows -> attention output, torch fp64 for a tight oracle."""
    b, n, c = x.shape
    hd = c // heads
    qkv = x @ wqkv.T + bqkv  # torch Linear convention: y = x W^T + b
    qkv = qkv.reshape(b, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd**-0.5) @ k.transpose(-2, -1)
    bias = table[idx.reshape(-1)].reshape(n, n, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias[None], dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    return out @ wproj.T + bproj


def test_window_attention_matches_torch_math():
    rng = np.random.default_rng(0)
    b, win, c, heads = 6, 4, 24, 3
    n = win * win
    x = rng.standard_normal((b, n, c)).astype(np.float64)

    wqkv = rng.standard_normal((3 * c, c)) * 0.1
    bqkv = rng.standard_normal(3 * c) * 0.1
    wproj = rng.standard_normal((c, c)) * 0.1
    bproj = rng.standard_normal(c) * 0.1
    table = rng.standard_normal(((2 * win - 1) ** 2, heads)) * 0.1
    idx = relative_position_index(win, win)

    ref = _torch_window_attention(
        torch.from_numpy(x), torch.from_numpy(wqkv), torch.from_numpy(bqkv),
        torch.from_numpy(wproj), torch.from_numpy(bproj),
        torch.from_numpy(table), torch.from_numpy(np.asarray(idx, np.int64)), heads,
    ).numpy()

    mod = WindowAttention(c, (win, win), heads)
    params = {
        "params": {
            # torch Linear weight (out, in) -> flax kernel (in, out)
            "qkv": {"kernel": jnp.asarray(wqkv.T, jnp.float32),
                    "bias": jnp.asarray(bqkv, jnp.float32)},
            "proj": {"kernel": jnp.asarray(wproj.T, jnp.float32),
                     "bias": jnp.asarray(bproj, jnp.float32)},
            "relative_position_bias_table": jnp.asarray(table, jnp.float32),
        }
    }
    got = mod.apply(params, jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-4)


def test_swin_block_grid_semantics():
    """Shifted vs unshifted blocks differ; a uniform field is shift-invariant."""
    rng = np.random.default_rng(1)
    hw, c, heads, win = 8, 12, 3, 4
    blk0 = SwinBlock(dim=c, input_resolution=(hw, hw), num_heads=heads,
                     window_size=win, shift_size=0)
    blk2 = SwinBlock(dim=c, input_resolution=(hw, hw), num_heads=heads,
                     window_size=win, shift_size=2)
    x = jnp.asarray(rng.standard_normal((1, hw * hw, c)), jnp.float32)
    p = blk0.init(jax.random.PRNGKey(0), x)
    y0 = blk0.apply(p, x)
    y2 = blk2.apply(p, x)
    assert not np.allclose(np.asarray(y0), np.asarray(y2))

    # spatially-uniform input: windows all identical -> shift must not matter
    u = jnp.ones((1, hw * hw, c)) * jnp.asarray(rng.standard_normal(c), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(blk0.apply(p, u)), np.asarray(blk2.apply(p, u)), atol=1e-5
    )
