"""Parity of the fused whole-Swin-block kernel vs straight-line XLA math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mumpy_tpu.ops.pallas.swin_block import fused_swin_block, supported


def _make_weights(rng, c, m):
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    return {
        "ln1_scale": jnp.ones((c,)), "ln1_bias": jnp.zeros((c,)),
        "qkv_kernel": r(c, 3 * c), "qkv_bias": r(3 * c),
        "proj_kernel": r(c, c), "proj_bias": r(c),
        "ln2_scale": jnp.ones((c,)) * 1.1, "ln2_bias": r(c),
        "fc1_kernel": r(c, m), "fc1_bias": r(m),
        "fc2_kernel": r(m, c), "fc2_bias": r(c),
    }


def _ln(x, s, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * s + b


def _reference_block(x, mask_bias, w, heads):
    r, n, c = x.shape
    hd = c // heads
    h1 = _ln(x, w["ln1_scale"], w["ln1_bias"])
    qkv = h1 @ w["qkv_kernel"] + w["qkv_bias"]
    qkv = qkv.reshape(r, n, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("rqhd,rkhd->rhqk", q * hd**-0.5, k)
    p_w = mask_bias.shape[0]
    mb = jnp.tile(mask_bias, (r // p_w, 1, 1, 1))
    attn = jax.nn.softmax(attn + mb, axis=-1)
    o = jnp.einsum("rhqk,rkhd->rqhd", attn, v).reshape(r, n, c)
    x = x + (o @ w["proj_kernel"] + w["proj_bias"])
    h2 = _ln(x, w["ln2_scale"], w["ln2_bias"])
    y = jax.nn.gelu(h2 @ w["fc1_kernel"] + w["fc1_bias"], approximate=False)
    return x + (y @ w["fc2_kernel"] + w["fc2_bias"])


@pytest.mark.parametrize("shift,tdim", [(0, 1), (2, 1), (0, 3)])
def test_swin_block_module_fused_matches_xla(shift, tdim):
    """The model's SwinBlock gives identical deterministic outputs on the fused
    (interpret pallas) and XLA paths, incl. shifted windows and temporal folds."""
    from mumpy_tpu.models.swin import SwinBlock
    from mumpy_tpu.ops.pallas import swin_block as psb

    rng = np.random.default_rng(4)
    b, hw, c, heads, win = 2, 8, 24, 3, 4
    x = jnp.asarray(rng.standard_normal((b, tdim * hw * hw, c)), jnp.float32)
    blk = SwinBlock(dim=c, input_resolution=(hw, hw), num_heads=heads,
                    window_size=win, shift_size=shift, temporal_dim=tdim)
    params = blk.init(jax.random.PRNGKey(0), x)
    try:
        psb.set_mode("off")
        ref = blk.apply(params, x)
        psb.set_mode("interpret")
        got = blk.apply(params, x)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-3)


@pytest.mark.parametrize("rows,c,m", [(49, 32, 128), (100, 24, 96)])
def test_fused_ln_mlp_matches_reference(rows, c, m):
    from mumpy_tpu.ops.pallas.ln_mlp import fused_ln_mlp

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, rows, c)), jnp.float32)
    lns = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.standard_normal((c, m)), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)
    w2 = jnp.asarray(0.1 * rng.standard_normal((m, c)), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)

    got = fused_ln_mlp(x, lns, lnb, w1, b1, w2, b2, interpret=True)
    ref = x + jax.nn.gelu(_ln(x, lns, lnb) @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-3)


@pytest.mark.parametrize("r", [3, 5, 20])
def test_fused_block_odd_tiles(r):
    """Regression: odd window counts (tile 3/5) must not crash the chunked MLP
    (found by review: batch 5 at stage 2 gives r=20 -> tile 5)."""
    rng = np.random.default_rng(6)
    n, c, heads = 16, 32, 2
    x = jnp.asarray(rng.standard_normal((r, n, c)), jnp.float32)
    mb = jnp.asarray(rng.standard_normal((1, heads, n, n)), jnp.float32)
    w = _make_weights(rng, c, 4 * c)
    got = fused_swin_block(x, mb, w, heads=heads, interpret=True)
    ref = _reference_block(x, jnp.tile(mb, (1, 1, 1, 1)), w, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-3)


def test_prepared_serving_path_matches():
    """prepare_for_inference captures the 'prepared' collection; the fast apply
    gives identical outputs to the inline-prep fused path and the XLA path."""
    import dataclasses

    import jax.numpy as jnp

    from mumpy_tpu.configs.model_config import tiny_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.ops.pallas import swin_block as psb
    from mumpy_tpu.utils.serving import prepare_for_inference

    cfg = tiny_config()
    model = Mumpy(cfg)
    rng = np.random.default_rng(5)
    clip = jnp.asarray(
        rng.standard_normal((2, 3, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), clip)
    try:
        psb.set_mode("off")
        ref = model.apply(variables, clip)
        psb.set_mode("interpret")
        inline = model.apply(variables, clip)
        prepared = prepare_for_inference(model, variables, clip)
        assert "prepared" in prepared and prepared["prepared"], "capture stored ops"
        fast = model.apply(prepared, clip)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(inline), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=5e-4, rtol=5e-3)


@pytest.mark.parametrize("form", ["perhead", "hoist"])
@pytest.mark.parametrize("case", [
    dict(nW=4, b=2, n=49, c=96, heads=3, period=1),     # unshifted, small period
    dict(nW=4, b=2, n=49, c=96, heads=3, period=4),     # shifted: period == nW
    dict(nW=12, b=2, n=16, c=64, heads=2, period=12),   # larger window count
])
def test_fused_swin_block_matches_reference(case, form):
    """Both softmax layouts stay parity-covered: the non-default ``hoist``
    form is kept for per-runtime re-A/B (PERF.md "attention-layout probe")
    and must not silently rot (ADVICE r4)."""
    rng = np.random.default_rng(0)
    r = case["nW"] * case["b"]
    n, c, heads = case["n"], case["c"], case["heads"]
    x = jnp.asarray(rng.standard_normal((r, n, c)), jnp.float32)
    mb = jnp.asarray(rng.standard_normal((case["period"], heads, n, n)), jnp.float32)
    w = _make_weights(rng, c, 4 * c)
    assert supported(c, 4 * c, n)

    got = fused_swin_block(x, mb, w, heads=heads, interpret=True, form=form)
    ref = _reference_block(x, mb, w, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-3)


@pytest.mark.parametrize("shift,tdim", [(2, 1), (0, 3), (2, 3)])
def test_swin_block_pre_windowed_matches_xla(shift, tdim):
    """Window-domain carry: calling SwinBlock with pre-partitioned (unshifted
    window-major) tokens gives the same result as the image-layout paths."""
    from mumpy_tpu.models.swin import SwinBlock
    from mumpy_tpu.ops.pallas import swin_block as psb
    from mumpy_tpu.ops.window import img_to_window_perm, win_to_img_perm

    rng = np.random.default_rng(11)
    b, hw, c, heads, win = 2, 8, 24, 3, 4
    gh, gw = tdim * hw, hw
    x = jnp.asarray(rng.standard_normal((b, gh * gw, c)), jnp.float32)
    blk = SwinBlock(dim=c, input_resolution=(hw, hw), num_heads=heads,
                    window_size=win, shift_size=shift, temporal_dim=tdim)
    params = blk.init(jax.random.PRNGKey(0), x)
    try:
        psb.set_mode("off")
        ref = blk.apply(params, x)
        psb.set_mode("interpret")
        wins = jnp.take(x, jnp.asarray(img_to_window_perm(gh, gw, win, 0)), axis=1)
        wins = wins.reshape(-1, win * win, c)
        out = blk.apply(params, wins, True, None, True)  # pre_windowed=True
        got = jnp.take(out.reshape(b, gh * gw, c),
                       jnp.asarray(win_to_img_perm(gh, gw, win, 0)), axis=1)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-3)


def test_stages_window_domain_matches_xla():
    """Full encoder parity with a config whose deep stage has SHIFTED scanned
    pairs at a resolution above the window (the window-domain gather path)."""
    import dataclasses

    from mumpy_tpu.configs.model_config import tiny_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.ops.pallas import swin_block as psb

    cfg = tiny_config()
    views = tuple(dataclasses.replace(v, depths=(4, 1, 2, 1)) for v in cfg.views)
    cfg = dataclasses.replace(cfg, views=views)  # stage0: res 8, win 4, shift 2, 1 pair + rem
    model = Mumpy(cfg)
    rng = np.random.default_rng(12)
    clip = jnp.asarray(
        rng.standard_normal((2, 3, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), clip)
    try:
        psb.set_mode("off")
        ref = model.apply(variables, clip)
        psb.set_mode("interpret")
        got = model.apply(variables, clip)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=5e-3)


@pytest.mark.parametrize("r,n,c,heads,period", [(14, 9, 24, 3, 1), (8, 16, 32, 2, 4)])
def test_fused_attn_ln_matches_reference(r, n, c, heads, period):
    from mumpy_tpu.ops.pallas.attn_ln import fused_attn_ln

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((r, n, c)), jnp.float32)
    mb = jnp.asarray(rng.standard_normal((period, heads, n, n)), jnp.float32)
    s = lambda *sh: jnp.asarray(rng.standard_normal(sh) * 0.05, jnp.float32)
    w = {
        "ln_scale": jnp.ones((c,)), "ln_bias": s(c),
        "qkv_kernel": s(c, 3 * c), "qkv_bias": s(3 * c),
        "proj_kernel": s(c, c), "proj_bias": s(c),
    }
    y, out = fused_attn_ln(x, mb, w, heads=heads, interpret=True)

    hd = c // heads
    h1 = _ln(x, w["ln_scale"], w["ln_bias"])
    qkv = (h1 @ w["qkv_kernel"] + w["qkv_bias"]).reshape(r, n, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("rqhd,rkhd->rhqk", q * hd**-0.5, k)
    attn = jax.nn.softmax(attn + jnp.tile(mb, (r // period, 1, 1, 1)), axis=-1)
    o = jnp.einsum("rhqk,rkhd->rqhd", attn, v).reshape(r, n, c)
    yref = o @ w["proj_kernel"] + w["proj_bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), atol=3e-4, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x + yref), atol=3e-4, rtol=3e-3)


@pytest.mark.parametrize("path", ["block", "halves"])
def test_vit_block_fused_matches_xla(monkeypatch, path):
    """Whole-block kernel path, and the attn_ln+ln_mlp fallback when the full
    weight set does not fit VMEM (simulated by forcing supported() False)."""
    monkeypatch.setenv("MUMPY_FUSED_ATTN_SITES", "all")
    from mumpy_tpu.models.swin import VitBlock
    from mumpy_tpu.ops.pallas import swin_block as psb

    rng = np.random.default_rng(9)
    b, n, c, heads = 10, 3, 48, 4
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    blk = VitBlock(dim=c, num_heads=heads, mlp_dim=4 * c)
    params = blk.init(jax.random.PRNGKey(0), x)
    try:
        psb.set_mode("off")
        ref = blk.apply(params, x)
        if path == "halves":
            monkeypatch.setattr(psb, "supported", lambda *a, **k: False)
        psb.set_mode("interpret")
        got = blk.apply(params, x)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-3)


def test_cross_swin_block_fused_matches_xla(monkeypatch):
    """Fused CrossSwinBlock (gather + attn kernel + CVA-on-windows + mlp kernel)
    matches the XLA path, including the partner `out` stream and the reference's
    double residual around CVA."""
    monkeypatch.setenv("MUMPY_FUSED_ATTN_SITES", "all")
    from mumpy_tpu.models.encoder import CrossSwinBlock
    from mumpy_tpu.ops.pallas import swin_block as psb

    rng = np.random.default_rng(10)
    hw, win, c1, c2, heads = 8, 4, 24, 48, 3
    b1, t1, t2 = 2, 1, 3
    x1 = jnp.asarray(rng.standard_normal((b1, t1 * hw * hw, c1)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((b1, t2 * hw * hw, c2)), jnp.float32)
    blk = CrossSwinBlock(dim1=c1, dim2=c2, input_resolution=(hw, hw),
                         num_heads=heads, window_size=win)
    params = blk.init(jax.random.PRNGKey(1), x1, x2)
    try:
        psb.set_mode("off")
        ref_x, ref_out = blk.apply(params, x1, x2)
        psb.set_mode("interpret")
        got_x, got_out = blk.apply(params, x1, x2)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x), atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=5e-4, rtol=5e-3)


@pytest.mark.parametrize("ratio,c,heads,b1",
                         [(1, 24, 3, 2), (3, 24, 2, 2), (1, 48, 4, 2),
                          # b1=8, ratio=3 -> r=24 is divisible by lcm(8,3)=24,
                          # so the IN-KERNEL segmented ratio fold engages
                          # (b1=2 shapes exercise the outside-fold fallback)
                          (3, 24, 2, 8)])
def test_swin_dattention_fused_matches_xla(ratio, c, heads, b1, monkeypatch):
    """Fused deformable-CVA kernel (offsets -> bilinear sample -> attention ->
    ratio fold) matches the XLA SwinDAttention path."""
    monkeypatch.setenv("MUMPY_FUSED_ATTN_SITES", "all")
    from mumpy_tpu.models.deformable import SwinDAttention
    from mumpy_tpu.ops.pallas import swin_block as psb

    rng = np.random.default_rng(13)
    ws = 7
    n = ws * ws
    x1 = jnp.asarray(rng.standard_normal((b1, n, c)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((b1 * ratio, n, c)), jnp.float32)
    mod = SwinDAttention(dim=c, num_heads=heads, n_groups=3, window=ws)
    params = mod.init(jax.random.PRNGKey(2), x1, x2)
    # proj_out is zero-init (faithful to the reference) — randomize it so the
    # test actually checks the output projection and bias handling
    params = jax.tree_util.tree_map(lambda a: a, params)
    po = params["params"]["proj_out"]
    po["kernel"] = jnp.asarray(rng.standard_normal(po["kernel"].shape) * 0.05, jnp.float32)
    po["bias"] = jnp.asarray(rng.standard_normal(po["bias"].shape) * 0.05, jnp.float32)
    try:
        psb.set_mode("off")
        ref = mod.apply(params, x1, x2)
        psb.set_mode("interpret")
        got = mod.apply(params, x1, x2)
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=5e-3)


@pytest.mark.parametrize("dtype,r,c,heads", [
    (jnp.float32, 20, 48, 4),    # no aligned tile divisor -> single grid step
    (jnp.float32, 32, 48, 4),    # tiled grid
    (jnp.bfloat16, 32, 128, 4),  # serving dtype
])
def test_vit3_time_major_kernel_matches_xla(monkeypatch, dtype, r, c, heads):
    """Specialized n=3 whole-layer ViT kernel (ops/pallas/vit3.py) in the
    time-major (3, R, C) layout matches the token-major XLA body."""
    monkeypatch.setenv("MUMPY_FUSED_ATTN_SITES", "vit3")
    from mumpy_tpu.models.swin import VitBlock
    from mumpy_tpu.ops.pallas import swin_block as psb

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, r, c)), dtype)
    blk = VitBlock(dim=c, num_heads=heads, mlp_dim=4 * c)
    params = blk.init(jax.random.PRNGKey(0), x, time_major=True)
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    try:
        psb.set_mode("off")
        # fallback path == token-major body on the transposed carry
        ref_tm = blk.apply(params, x, time_major=True)
        ref = blk.apply(params, x.transpose(1, 0, 2))
        np.testing.assert_array_equal(
            np.asarray(ref_tm), np.asarray(ref.transpose(1, 0, 2)))
        psb.set_mode("interpret")
        got = blk.apply(params, x, time_major=True)
    finally:
        psb.set_mode(None)
    tol = dict(atol=3e-4, rtol=3e-3) if dtype == jnp.float32 else \
        dict(atol=6e-2, rtol=6e-2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref_tm, np.float32), **tol)


def test_encoder_time_major_vit3_matches_token_major(monkeypatch):
    """Encoder-level plumbing: the time-major global-ViT layout (slab carry +
    lane concat) produces the same features as the token-major path."""
    from mumpy_tpu.configs.model_config import tiny_config
    from mumpy_tpu.models.encoder import MumpyEncoder
    from mumpy_tpu.ops.pallas import swin_block as psb

    cfg = tiny_config()
    model = MumpyEncoder(cfg)
    rng = np.random.default_rng(12)
    clip = jnp.asarray(
        rng.standard_normal((2, 3, cfg.image_size, cfg.image_size, 3)),
        jnp.float32)
    monkeypatch.setenv("MUMPY_FUSED_ATTN_SITES", "none")
    params = model.init(jax.random.PRNGKey(0), clip)
    try:
        psb.set_mode("off")
        ref = model.apply(params, clip, deterministic=True)[0]
        monkeypatch.setenv("MUMPY_FUSED_ATTN_SITES", "vit3")
        psb.set_mode("interpret")
        got = model.apply(params, clip, deterministic=True)[0]
    finally:
        psb.set_mode(None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=3e-4, rtol=3e-3)
