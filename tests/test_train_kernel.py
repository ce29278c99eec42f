"""Custom-VJP fused training block: value + full gradient parity vs XLA autodiff.

The backward kernel recomputes the forward from x in-kernel and spills the
weight-grad operands; this test differentiates both the pallas (interpret-mode)
path and the pure-XLA reference (``xla_block_reference``) with jax.grad and
compares every gradient: dx, d(rel-pos-bias term), and all 12 weight grads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mumpy_tpu.ops.pallas.swin_block_vjp as vjp_mod

RNG = np.random.default_rng(11)


def _mk(c=24, heads=3, n=16, r=8, p_w=1, m_ratio=4):
    m = c * m_ratio
    w = {
        "ln1s": 1.0 + 0.1 * RNG.standard_normal((1, c)),
        "ln1b": 0.1 * RNG.standard_normal((1, c)),
        "wqkv": RNG.standard_normal((c, 3 * c)) / np.sqrt(c),
        "bqkv": 0.1 * RNG.standard_normal((1, 3 * c)),
        "wproj": RNG.standard_normal((c, c)) / np.sqrt(c),
        "bproj": 0.1 * RNG.standard_normal((1, c)),
        "ln2s": 1.0 + 0.1 * RNG.standard_normal((1, c)),
        "ln2b": 0.1 * RNG.standard_normal((1, c)),
        "wfc1": RNG.standard_normal((c, m)) / np.sqrt(c),
        "bfc1": 0.1 * RNG.standard_normal((1, m)),
        "wfc2": RNG.standard_normal((m, c)) / np.sqrt(m),
        "bfc2": 0.1 * RNG.standard_normal((1, c)),
    }
    w = {k: jnp.asarray(v, jnp.float32) for k, v in w.items()}
    x = jnp.asarray(RNG.standard_normal((r, n, c)), jnp.float32)
    mb = jnp.asarray(0.5 * RNG.standard_normal((p_w, heads, n, n)), jnp.float32)
    if p_w > 1:
        # shifted-window masks: a large negative constant on masked pairs
        mask = (RNG.uniform(size=(p_w, 1, n, n)) < 0.2) * -100.0
        mb = mb + jnp.asarray(mask, jnp.float32)
    return x, mb, w


@pytest.mark.parametrize("dw_mode", ["spill", "kernel"])
@pytest.mark.parametrize("p_w,keep_dropped", [(1, False), (4, True)])
def test_fused_train_block_grads(p_w, keep_dropped, dw_mode, monkeypatch):
    # both backward forms: "spill" (weight-grad GEMMs in XLA over spilled
    # activations) and "kernel" (in-kernel f32 dW accumulation — the
    # production bf16 default, which dtype alone would never select under
    # this f32 test)
    monkeypatch.setenv("MUMPY_BWD_DW", dw_mode)
    heads, n, r = 3, 16, 8
    x, mb, w = _mk(heads=heads, n=n, r=r, p_w=p_w)
    keep1 = jnp.ones((r, 1), jnp.float32)
    keep2 = jnp.ones((r, 1), jnp.float32)
    if keep_dropped:
        # stochastic depth actually dropping some rows (scaled keep)
        keep1 = keep1.at[1:3].set(0.0) * 1.25
        keep2 = keep2.at[4:5].set(0.0) * 1.25

    def loss_kernel(x, mb, w):
        y = vjp_mod.fused_block_train(x, mb, w, keep1, keep2, heads, n, p_w,
                                      True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, mb, w):
        y = vjp_mod.xla_block_reference(x, mb, w, keep1, keep2, heads=heads,
                                        n=n, p_w=p_w)
        return jnp.sum(jnp.sin(y))

    # forward parity
    yk = vjp_mod.fused_block_train(x, mb, w, keep1, keep2, heads, n, p_w, True)
    yr = vjp_mod.xla_block_reference(x, mb, w, keep1, keep2, heads=heads, n=n,
                                     p_w=p_w)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=2e-5,
                               rtol=1e-5)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, mb, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, mb, w)

    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=3e-4, rtol=1e-3)  # dx
    # dmb: the kernel returns the row-total in slot 0 (the bias broadcast sums
    # over slots anyway); compare slot-summed totals
    np.testing.assert_allclose(
        np.asarray(gk[1].sum(0)), np.asarray(gr[1].sum(0)), atol=3e-4, rtol=1e-3)
    for k in sorted(w):
        np.testing.assert_allclose(
            np.asarray(gk[2][k]), np.asarray(gr[2][k]), atol=5e-4, rtol=2e-3,
            err_msg=f"weight grad mismatch: {k}")


def test_fused_attn_ln_train_grads():
    """Attention-half train kernel (CrossSwinBlock): the W-MSA output is used
    twice (partner stream + residual), so the loss feeds BOTH outputs and the
    backward must combine both cotangents."""
    import mumpy_tpu.ops.pallas.attn_ln_vjp as alv

    heads, n, r, c = 3, 16, 8, 24
    x, mb, w = _mk(heads=heads, n=n, r=r, p_w=1)
    w = {"lns": w["ln1s"], "lnb": w["ln1b"], "wqkv": w["wqkv"],
         "bqkv": w["bqkv"], "wproj": w["wproj"], "bproj": w["bproj"]}
    keep1 = jnp.ones((r, 1), jnp.float32).at[2:4].set(0.0) * 1.25

    def loss_kernel(x, mb, w):
        y, out = alv.fused_attn_ln_train(x, mb, w, keep1, heads, n, 1, True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(jnp.cos(out))

    def loss_ref(x, mb, w):
        y, out = alv.xla_attn_ln_reference(x, mb, w, keep1, heads=heads, n=n,
                                           p_w=1)
        return jnp.sum(jnp.sin(y)) + jnp.sum(jnp.cos(out))

    yk, outk = alv.fused_attn_ln_train(x, mb, w, keep1, heads, n, 1, True)
    yr, outr = alv.xla_attn_ln_reference(x, mb, w, keep1, heads=heads, n=n,
                                         p_w=1)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=2e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(outk), np.asarray(outr), atol=2e-5,
                               rtol=1e-5)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, mb, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, mb, w)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=3e-4, rtol=1e-3)  # dx
    np.testing.assert_allclose(
        np.asarray(gk[1].sum(0)), np.asarray(gr[1].sum(0)), atol=3e-4,
        rtol=1e-3)  # dmb (row-total in slot 0)
    for k in sorted(w):
        np.testing.assert_allclose(
            np.asarray(gk[2][k]), np.asarray(gr[2][k]), atol=5e-4, rtol=2e-3,
            err_msg=f"weight grad mismatch: {k}")


@pytest.mark.parametrize("rows", [64, 36])  # 36: not an 8-multiple (ViT tail)
def test_fused_ln_mlp_train_grads(rows):
    import mumpy_tpu.ops.pallas.ln_mlp_vjp as lmv

    c, m = 24, 96
    w = {
        "lns": 1.0 + 0.1 * RNG.standard_normal((1, c)),
        "lnb": 0.1 * RNG.standard_normal((1, c)),
        "wfc1": RNG.standard_normal((c, m)) / np.sqrt(c),
        "bfc1": 0.1 * RNG.standard_normal((1, m)),
        "wfc2": RNG.standard_normal((m, c)) / np.sqrt(m),
        "bfc2": 0.1 * RNG.standard_normal((1, c)),
    }
    w = {k: jnp.asarray(v, jnp.float32) for k, v in w.items()}
    x = jnp.asarray(RNG.standard_normal((rows, c)), jnp.float32)
    keep = (jnp.ones((rows, 1), jnp.float32).at[3:7].set(0.0)) * 1.25

    def loss_kernel(x, w):
        return jnp.sum(jnp.sin(lmv.fused_ln_mlp_train(x, w, keep, True)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(lmv.xla_ln_mlp_reference(x, w, keep)))

    yk = lmv.fused_ln_mlp_train(x, w, keep, True)
    yr = lmv.xla_ln_mlp_reference(x, w, keep)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=2e-5,
                               rtol=1e-5)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(x, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               atol=3e-4, rtol=1e-3)
    for k in sorted(w):
        np.testing.assert_allclose(
            np.asarray(gk[1][k]), np.asarray(gr[1][k]), atol=5e-4, rtol=2e-3,
            err_msg=f"weight grad mismatch: {k}")


def test_mlp_site_width_gate(monkeypatch):
    """The round-5 bisect root-caused the compiled ln_mlp worker crash to the
    c=1024 instance alone (PERF.md "ln_mlp root cause"): the mlp site is back
    in the default train-site set, with the 1024 width excluded in COMPILED
    mode unless MUMPY_ALLOW_CRASHING_KERNELS=1 re-probes it.  Interpret mode
    (this suite) keeps exercising the 1024 instance."""
    from mumpy_tpu.models.swin import mlp_site_width_allowed

    monkeypatch.delenv("MUMPY_FUSED_TRAIN_SITES", raising=False)
    monkeypatch.delenv("MUMPY_ALLOW_CRASHING_KERNELS", raising=False)
    monkeypatch.delenv("MUMPY_MLP_SITE_WIDTHS", raising=False)

    # mlp is in the default site set again
    assert vjp_mod.train_site_enabled("mlp")
    assert vjp_mod.train_site_enabled("block")

    vjp_mod.set_train_mode("compiled")
    try:
        assert not mlp_site_width_allowed(1024)   # the faulting instance
        assert mlp_site_width_allowed(768)
        monkeypatch.setenv("MUMPY_ALLOW_CRASHING_KERNELS", "1")
        assert mlp_site_width_allowed(1024)       # explicit re-probe knob
        monkeypatch.delenv("MUMPY_ALLOW_CRASHING_KERNELS")
        # the bisect inclusion filter composes with the exclusion
        monkeypatch.setenv("MUMPY_MLP_SITE_WIDTHS", "96,768")
        assert mlp_site_width_allowed(768)
        assert not mlp_site_width_allowed(512)
        assert not mlp_site_width_allowed(1024)
    finally:
        vjp_mod.set_train_mode(None)
        monkeypatch.delenv("MUMPY_MLP_SITE_WIDTHS", raising=False)
    vjp_mod.set_train_mode("interpret")
    try:
        assert mlp_site_width_allowed(1024)       # CPU parity coverage stays
        assert vjp_mod.train_site_enabled("mlp")
    finally:
        vjp_mod.set_train_mode(None)


def test_xla_reference_matches_flax_block():
    """The XLA reference itself reproduces SwinBlock's math (sanity anchor):
    identical layernorm epsilon, gelu, residual order."""
    import flax.linen as nn

    from mumpy_tpu.models.swin import SwinBlock, partition_tokens

    c, heads, win, res = 24, 3, 4, (8, 8)
    blk = SwinBlock(c, res, heads, window_size=win, shift_size=0)
    x_img = jnp.asarray(RNG.standard_normal((2, res[0] * res[1], c)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x_img)["params"]
    y_flax = blk.apply({"params": params}, x_img, True)

    from mumpy_tpu.models.swin import relative_position_index

    n = win * win
    table = params["attn"]["relative_position_bias_table"]
    idx = jnp.asarray(relative_position_index(win, win))
    bias = table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1)[None]

    w = {
        "ln1s": params["norm1"]["scale"][None], "ln1b": params["norm1"]["bias"][None],
        "wqkv": params["attn"]["qkv"]["kernel"],
        "bqkv": params["attn"]["qkv"]["bias"][None],
        "wproj": params["attn"]["proj"]["kernel"],
        "bproj": params["attn"]["proj"]["bias"][None],
        "ln2s": params["norm2"]["scale"][None], "ln2b": params["norm2"]["bias"][None],
        "wfc1": params["mlp"]["fc1"]["kernel"], "bfc1": params["mlp"]["fc1"]["bias"][None],
        "wfc2": params["mlp"]["fc2"]["kernel"], "bfc2": params["mlp"]["fc2"]["bias"][None],
    }
    wins = partition_tokens(x_img, res[0], res[1], win, 0)
    r = wins.shape[0]
    ones = jnp.ones((r, 1), jnp.float32)
    y_ref = vjp_mod.xla_block_reference(wins, bias, w, ones, ones, heads=heads,
                                        n=n, p_w=1)
    from mumpy_tpu.models.swin import unpartition_tokens

    y_ref_img = unpartition_tokens(y_ref, res[0], res[1], win, 0)
    np.testing.assert_allclose(np.asarray(y_ref_img), np.asarray(y_flax),
                               atol=2e-5, rtol=1e-5)


def test_train_step_fused_matches_xla_path():
    """Full tiny-model training step with the fused train kernels (interpret)
    == pure-XLA step: same loss, same updated parameters (drop_path=0 in the
    tiny config, so the paths are numerically identical)."""
    from mumpy_tpu.configs.model_config import tiny_config
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import create_train_state, train_step

    cfg = tiny_config()
    rng = np.random.default_rng(17)
    batch = {
        "image": jnp.asarray(rng.standard_normal(
            (2, 3, cfg.image_size, cfg.image_size, 3)), jnp.float32),
        "mask": jnp.asarray(
            (rng.uniform(size=(2, cfg.image_size**2)) > 0.8), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    vjp_mod.set_train_mode("off")
    try:
        s1 = create_train_state(cfg, OptimConfig(), 10, jax.random.PRNGKey(5))
        _, m1 = train_step(s1, batch, key)
        s1b = create_train_state(cfg, OptimConfig(), 10, jax.random.PRNGKey(5))
        vjp_mod.set_train_mode("interpret")
        s2, m2 = train_step(s1b, batch, key)
    finally:
        vjp_mod.set_train_mode(None)

    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                               rtol=1e-5)
