"""Parity tests for the low-level ops against torch functional oracles.

These pin the semantics the model depends on: torch-style bilinear resize (both
align_corners flavours), ``F.grid_sample`` align_corners=True, pixel shuffle, average
pooling, window partition round-trips, and the DCT band filter math.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mumpy_tpu.ops.resize import resize_bilinear
from mumpy_tpu.ops.grid_sample import grid_sample_bilinear
from mumpy_tpu.ops.pixel import pixel_shuffle, avg_pool_2d
from mumpy_tpu.ops.window import window_partition, window_reverse, shifted_window_mask
from mumpy_tpu.ops.dct import dct_matrix, faf

RNG = np.random.default_rng(0)


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))


def _to_nhwc(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("inout", [(7, 14), (14, 28), (7, 28), (224, 112), (13, 17)])
def test_resize_bilinear_matches_torch(align, inout):
    h_in, h_out = inout
    x = RNG.standard_normal((2, h_in, h_in, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (h_out, h_out), align))
    theirs = _to_nhwc(
        F.interpolate(_nchw(x), size=(h_out, h_out), mode="bilinear", align_corners=align)
    )
    # torch computes source coordinates in float32; on large grids that costs ~1e-4
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_grid_sample_matches_torch():
    b, h, w, c, n = 3, 7, 7, 8, 49
    x = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    # include out-of-range points to exercise zero padding
    grid = (RNG.uniform(-1.3, 1.3, size=(b, n, 2))).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    theirs = F.grid_sample(
        _nchw(x), torch.from_numpy(grid).view(b, 1, n, 2),
        mode="bilinear", align_corners=True,
    )  # (B, C, 1, N)
    theirs = theirs.squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_pixel_shuffle_matches_torch():
    x = RNG.standard_normal((2, 7, 7, 32)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = _to_nhwc(F.pixel_shuffle(_nchw(x), 2))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_avg_pool_matches_torch():
    x = RNG.standard_normal((2, 16, 16, 5)).astype(np.float32)
    ours = np.asarray(avg_pool_2d(jnp.asarray(x), 2))
    theirs = _to_nhwc(F.avg_pool2d(_nchw(x), 2, 2))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    # k=3 divisible + the overlapping-stride reduce_window fallback
    x = RNG.standard_normal((2, 9, 9, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(avg_pool_2d(jnp.asarray(x), 3)),
        _to_nhwc(F.avg_pool2d(_nchw(x), 3, 3)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(avg_pool_2d(jnp.asarray(x), 3, 1)),
        _to_nhwc(F.avg_pool2d(_nchw(x), 3, 1)), atol=1e-6)


def test_dap_pool_matches_composite():
    """dap_pool == avg_pool(pixel_shuffle(x, k), k) (torch-checked composite)."""
    from mumpy_tpu.ops.pixel import dap_pool

    for k in (2, 3):
        x = RNG.standard_normal((2, 5, 7, 8 * k * k)).astype(np.float32)
        composite = _to_nhwc(F.avg_pool2d(_nchw(
            _to_nhwc(F.pixel_shuffle(_nchw(x), k))), k, k))
        np.testing.assert_allclose(
            np.asarray(dap_pool(jnp.asarray(x), k)), composite, atol=1e-6)


def test_window_partition_roundtrip_and_order():
    b, h, w, c, ws = 2, 14, 14, 4, 7
    x = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    wins = window_partition(jnp.asarray(x), ws)
    assert wins.shape == (b * 4, ws, ws, c)
    # torch reference order: batch-major then row-major windows
    np.testing.assert_allclose(np.asarray(wins[0]), x[0, :7, :7])
    np.testing.assert_allclose(np.asarray(wins[1]), x[0, :7, 7:])
    np.testing.assert_allclose(np.asarray(wins[4]), x[1, :7, :7])
    back = window_reverse(wins, ws, h, w)
    np.testing.assert_allclose(np.asarray(back), x)


def test_shifted_window_mask_matches_reference_construction():
    h = w = 14
    ws, shift = 7, 3
    mask = np.asarray(shifted_window_mask(h, w, ws, shift))
    # torch construction (swinTransformer.py:233-252)
    img = torch.zeros((1, h, w, 1))
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for wsl in slices:
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = img.view(1, h // ws, ws, w // ws, ws, 1).permute(0, 1, 3, 2, 4, 5)
    mw = mw.reshape(-1, ws * ws)
    ref = (mw.unsqueeze(1) - mw.unsqueeze(2))
    ref = ref.masked_fill(ref != 0, -100.0).masked_fill(ref == 0, 0.0).numpy()
    np.testing.assert_allclose(mask, ref)


def test_dct_matrix_orthonormal_and_faf_matches_torch():
    size = 32
    d = dct_matrix(size)
    np.testing.assert_allclose(d @ d.T, np.eye(size), atol=1e-5)

    x = RNG.standard_normal((2, size, size, 3)).astype(np.float32)
    ours = np.asarray(faf(jnp.asarray(x)))  # (2, H, W, 9)

    # torch oracle replicating dct.py:71-79 semantics
    dt = torch.from_numpy(d)
    xt = _nchw(x)  # (2,3,H,W)
    freq = dt @ xt @ dt.T
    i = torch.arange(size)[:, None]
    j = torch.arange(size)[None, :]
    s = i + j
    # reference floor-divides: ``size // 2.82`` (``dct.py:66-67``), so the
    # boundary anti-diagonal belongs to both the low and mid bands
    bounds = [(0.0, size // 2.82), (size // 2.82, size // 2), (float(size), 2.0 * size)]
    outs = []
    for lo, hi in bounds:
        m = ((s >= lo) & (s <= hi)).float()
        outs.append(dt.T @ (freq * m) @ dt)
    theirs = torch.cat(outs, dim=1)  # (2, 9, H, W) band-major
    # ours is (..., H, W, 3*C) band-major over C=3 channels
    np.testing.assert_allclose(ours, _to_nhwc(theirs), atol=1e-4, rtol=1e-4)


def test_small_conv_matches_conv_lowering(monkeypatch):
    """Decoder SmallConv stencil form == XLA conv lowering (same params)."""
    import jax
    import jax.numpy as jnp
    from mumpy_tpu.models.decoder import SmallConv

    rng = np.random.default_rng(5)
    for kh, kw, cin, cout, pad in [
        (3, 3, 4, 4, ((1, 1), (1, 1))),
        (3, 3, 1, 1, ((1, 1), (1, 1))),
        (7, 1, 6, 4, ((3, 3), (0, 0))),
        (1, 7, 4, 1, ((0, 0), (3, 3))),
    ]:
        x = jnp.asarray(rng.standard_normal((2, 10, 12, cin)), jnp.float32)
        mod = SmallConv(cout, (kh, kw), pad)
        params = mod.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("MUMPY_SMALL_CONV", "1")
        fast = mod.apply(params, x)
        monkeypatch.setenv("MUMPY_SMALL_CONV", "0")
        ref = mod.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_permutation_take_grad_matches_scatter_form():
    """permutation_take fwd == jnp.take; its gather-form VJP == take's scatter VJP."""
    import jax
    from mumpy_tpu.ops.window import img_to_window_perm, permutation_take

    perm = img_to_window_perm(14, 14, 7, 3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 196, 5)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 196, 5)), jnp.float32)

    f_fast = lambda x: jnp.sum(permutation_take(x, perm) * g)
    f_ref = lambda x: jnp.sum(jnp.take(x, jnp.asarray(perm), axis=1) * g)
    np.testing.assert_allclose(np.asarray(f_fast(x)), np.asarray(f_ref(x)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_fast)(x)), np.asarray(jax.grad(f_ref)(x)), rtol=1e-6)


def test_rel_pos_bias_matmul_matches_gather():
    """One-hot-matmul rel-pos bias == table[idx] gather, values and table grads."""
    import jax
    from mumpy_tpu.models.swin import rel_pos_bias, relative_position_index

    wh = ww = 7
    h = 4
    n = wh * ww
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal(((2 * wh - 1) ** 2, h)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((h, n, n)), jnp.float32)
    idx = jnp.asarray(relative_position_index(wh, ww))

    def ref(t):
        return jnp.sum(t[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1) * g)

    fast = lambda t: jnp.sum(rel_pos_bias(t, wh, ww) * g)
    np.testing.assert_allclose(np.asarray(fast(table)), np.asarray(ref(table)),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.grad(fast)(table)), np.asarray(jax.grad(ref)(table)),
        atol=1e-4, rtol=1e-4)
