"""Parity of the fused whole-PAIR kernel (ops/pallas/swin_pair.py) vs the
composed reference: shift-gather -> block -> gather-back -> block."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mumpy_tpu.ops.pallas.swin_pair import (fused_pair_prepared, pair_supported,
                                            prepare_pair)
from mumpy_tpu.ops.window import (partition_tokens, shifted_window_mask,
                                  unpartition_tokens)

from test_fused_block import _make_weights, _reference_block


def _pair_reference(x, wa, wb, mb_s, bias_p, *, gh, gw, window, shift, heads):
    """shift-gather -> reference shifted block -> gather back -> plain block."""
    b = x.shape[0] * x.shape[1] // (gh * gw)
    n, c = x.shape[-2:]
    img = unpartition_tokens(x, gh, gw, window, 0)
    ws = partition_tokens(img, gh, gw, window, shift)
    ya = _reference_block(ws, mb_s, wa, heads)
    img = unpartition_tokens(ya, gh, gw, window, shift)
    wp = partition_tokens(img, gh, gw, window, 0)
    return _reference_block(wp, bias_p, wb, heads)


@pytest.mark.parametrize("case", [
    # (b, window, shift, nwh, nww, c, heads)
    dict(b=2, window=4, shift=2, nwh=2, nww=2, c=48, heads=3),
    dict(b=2, window=4, shift=1, nwh=3, nww=2, c=32, heads=2),
    dict(b=2, window=7, shift=3, nwh=2, nww=2, c=64, heads=2),   # stage2 v12
    dict(b=1, window=7, shift=3, nwh=6, nww=2, c=64, heads=2),   # stage2 v3
])
def test_fused_pair_matches_composed_reference(case):
    b, window, shift = case["b"], case["window"], case["shift"]
    nwh, nww, c, heads = case["nwh"], case["nww"], case["c"], case["heads"]
    gh, gw = nwh * window, nww * window
    n, nw = window * window, nwh * nww
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b * nw, n, c)), jnp.float32)
    wa = _make_weights(rng, c, 4 * c)
    wb = _make_weights(rng, c, 4 * c)
    mask = shifted_window_mask(gh, gw, window, shift)
    bias_s = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    bias_p = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    mb_s = mask[:, None] + bias_s[None]  # (nW, H, n, n)
    assert pair_supported(c, 4 * c, n, nw)

    prepared = prepare_pair(wa, wb, mb_s, bias_p[None], wdtype=jnp.float32)
    got = fused_pair_prepared(x, prepared, heads=heads, w=window, s=shift,
                              nwh=nwh, nww=nww, interpret=True)
    ref = _pair_reference(x, wa, wb, mb_s, bias_p[None], gh=gh, gw=gw,
                          window=window, shift=shift, heads=heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-3)


def test_plain_block_pair_module_parity(monkeypatch):
    """PlainBlockPair with MUMPY_PAIR_FUSION=1 (interpret) matches the
    per-block path on a pre-windowed carry, including the temporal fold."""
    from mumpy_tpu.models.encoder import PlainBlockPair
    from mumpy_tpu.ops.pallas import swin_block as psb

    rng = np.random.default_rng(7)
    b, hw, c, heads, win, tdim = 2, 8, 24, 3, 4, 3
    gh, gw = tdim * hw, hw
    nw = (gh // win) * (gw // win)
    n = win * win
    x = jnp.asarray(rng.standard_normal((b * nw, n, c)), jnp.float32)
    kw = dict(dim=c, input_resolution=(hw, hw), num_heads=heads,
              window_size=win, shift_size=2, temporal_dim=tdim,
              deterministic=True)
    pair = PlainBlockPair(pre_windowed=True, **kw)
    dp = jnp.zeros((2,), jnp.float32)
    monkeypatch.setenv("MUMPY_PAIR_FUSION", "0")
    # init must run the image-layout path (params don't exist yet, so the
    # pre-windowed fused dispatch is ineligible) — like the encoder, which
    # only uses the window-domain carry at inference
    x_img = jnp.asarray(
        rng.standard_normal((b, tdim * hw * hw, c)), jnp.float32)
    params = PlainBlockPair(pre_windowed=False, **kw).init(
        jax.random.PRNGKey(0), x_img, dp)
    try:
        psb.set_mode("interpret")
        ref, _ = pair.apply(params, x, dp)
        monkeypatch.setenv("MUMPY_PAIR_FUSION", "1")
        got, _ = pair.apply(params, x, dp)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-3)


def test_full_model_serving_with_pair_fusion(monkeypatch):
    """End-to-end composition: the tiny model at imsize 128 (stage-2 grid 8x8
    > window 4, so the scanned pairs really shift) gives identical serving
    outputs with MUMPY_PAIR_FUSION on and off, through the
    prepare_for_inference capture path."""
    from mumpy_tpu.configs.model_config import tiny_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.ops.pallas import swin_block as psb
    from mumpy_tpu.utils.serving import prepare_for_inference

    cfg = tiny_config(image_size=128)
    model = Mumpy(cfg)
    rng = np.random.default_rng(3)
    clip = jnp.asarray(
        rng.standard_normal((1, 3, cfg.image_size, cfg.image_size, 3)),
        jnp.float32)
    monkeypatch.setenv("MUMPY_PAIR_FUSION", "0")
    variables = model.init(jax.random.PRNGKey(0), clip)
    try:
        psb.set_mode("interpret")
        v_off = prepare_for_inference(model, variables, clip)
        ref = model.apply(v_off, clip)
        monkeypatch.setenv("MUMPY_PAIR_FUSION", "1")
        v_on = prepare_for_inference(model, variables, clip)
        # the pair path must actually engage: its prepared operands are
        # cached under a "pair" variable (vacuous parity otherwise)
        paths = [jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_flatten_with_path(v_on["prepared"])[0]]
        assert any("pair" in p for p in paths), paths[:10]
        got = model.apply(v_on, clip)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)
