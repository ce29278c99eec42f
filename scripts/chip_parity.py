#!/usr/bin/env python
"""On-chip fused-kernel vs pure-XLA parity check (compiled Mosaic, real TPU).

The test suite proves kernel parity in interpret mode on CPU; this script
closes the remaining gap — a Mosaic COMPILATION bug (layout, tiling, dtype)
would only show up on the real chip.  It runs the flagship forward twice in
one process (all serving kernels on vs. pure XLA) and compares logits, then
does the same for the training step's loss/grads (custom-VJP kernels on/off).

f32 is the primary comparison (both paths accumulate f32; kernels store f32
temporaries, so differences are pure reassociation noise ~1e-4); a bf16 pass
is reported for the production config.

Usage: python scripts/chip_parity.py [--batch 4] [--train-batch 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.flatten_util
import jax.numpy as jnp


def forward_outs(model, params_f32, clip, dtype, sites, with_oracle=False):
    """Logits with serving kernels on (given sites) vs pure XLA.

    When ``with_oracle`` is set (f32 only), also runs the XLA path under
    ``jax.default_matmul_precision('highest')``.  On TPU the MXU runs
    default-precision f32 matmuls in reduced-precision passes, so the honest
    f32 check is *calibrated*: both the kernel path and the default-XLA path
    are compared against the highest-precision oracle, and the kernel must not
    be materially further from it than default XLA is.
    """
    import mumpy_tpu.ops.pallas.swin_block as sb
    from mumpy_tpu.utils.serving import prepare_for_inference

    params = params_f32
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params)
    clip = clip.astype(dtype)

    variants = [("kernel", None, sites, None), ("xla", "off", "none", None)]
    if with_oracle:
        variants.append(("oracle", "off", "none", "highest"))

    outs = {}
    for name, mode, env_sites, prec in variants:
        os.environ["MUMPY_FUSED_ATTN_SITES"] = env_sites
        sb.set_mode(mode)
        try:
            p = (prepare_for_inference(model, params, clip)
                 if name == "kernel" else params)

            def fwd(p, c):
                return model.apply(p, c, deterministic=True)

            if prec is not None:
                with jax.default_matmul_precision(prec):
                    out = jax.jit(fwd)(p, clip)
            else:
                out = jax.jit(fwd)(p, clip)
            outs[name] = np.asarray(out.astype(jnp.float32))
        finally:
            sb.set_mode(None)
            os.environ.pop("MUMPY_FUSED_ATTN_SITES", None)
    return outs


def train_pair(cfg, batch):
    """Train-step loss + grad-tree with custom-VJP kernels on vs off."""
    import mumpy_tpu.ops.pallas.swin_block_vjp as vjp_mod
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import _loss_for_batch, create_train_state

    state = create_train_state(
        cfg, OptimConfig(), iter_max=100, rng=jax.random.PRNGKey(0))

    def loss_and_grads(mode):
        vjp_mod.set_train_mode(mode)
        try:
            loss, g = jax.jit(jax.value_and_grad(
                lambda p: _loss_for_batch(
                    state.apply_fn, p, batch, jax.random.PRNGKey(1), False,
                    None)[0]
            ))(state.params)
            return float(loss), jax.tree_util.tree_map(np.asarray, g)
        finally:
            vjp_mod.set_train_mode(None)
    return loss_and_grads("compiled"), loss_and_grads("off")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--train-batch", type=int, default=4)
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--config", default="flagship",
                   choices=["flagship", "mid", "tiny"])
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import (
        mid_config, multiswin_config, tiny_config)
    from mumpy_tpu.models.mumpy import Mumpy

    cfg = {"flagship": multiswin_config, "mid": mid_config,
           "tiny": tiny_config}[args.config]()
    model = Mumpy(cfg)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.standard_normal(
        (args.batch, 3, cfg.image_size, cfg.image_size, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), clip[:1])

    fail = False
    for dtype, tol in ((jnp.float32, 3e-3), (jnp.bfloat16, 1e-1)):
        outs = forward_outs(model, params, clip, dtype, "cross,cva,vit3",
                            with_oracle=(dtype == jnp.float32))
        a, b = outs["kernel"], outs["xla"]
        diff = np.max(np.abs(a - b))
        rel = diff / max(np.max(np.abs(b)), 1e-9)
        if "oracle" in outs:
            # calibrated check: the MXU's default-precision f32 matmuls are
            # reduced-precision passes, so raw kernel-vs-xla diff sits at that
            # shared noise floor.  Require the kernel to be no further from
            # the highest-precision oracle than default XLA is (3x headroom
            # for reassociation), falling back to the absolute tol when the
            # floor is genuinely tiny.
            err_x = np.max(np.abs(outs["xla"] - outs["oracle"]))
            err_k = np.max(np.abs(outs["kernel"] - outs["oracle"]))
            ok = err_k < max(3.0 * err_x, tol)
            print(f"forward float32 (vs highest-precision oracle): "
                  f"xla-default err {err_x:.2e}, kernel err {err_k:.2e} "
                  f"{'OK' if ok else 'FAIL'}", flush=True)
        else:
            ok = diff < tol
        fail |= not ok
        print(f"forward {jnp.dtype(dtype).name}: max|kernel-xla| {diff:.2e} "
              f"(rel {rel:.2e}, logits range {np.abs(b).max():.2f}) "
              f"{'OK' if ok else 'FAIL'}", flush=True)

    if not args.skip_train:
        batch = {
            "image": jnp.asarray(rng.standard_normal(
                (args.train_batch, 3, cfg.image_size, cfg.image_size, 3)),
                jnp.float32),
            "mask": jnp.asarray(
                (rng.uniform(size=(args.train_batch, cfg.image_size ** 2))
                 > 0.9).astype(np.float32)),
        }
        (l1, g1), (l0, g0) = train_pair(cfg, batch)
        dl = abs(l1 - l0)
        flat1, _ = jax.flatten_util.ravel_pytree(g1)
        flat0, _ = jax.flatten_util.ravel_pytree(g0)
        gdiff = float(np.max(np.abs(flat1 - flat0)))
        gscale = float(np.max(np.abs(flat0)))
        ok = dl < 1e-4 and gdiff < 3e-3 * max(gscale, 1.0)
        fail |= not ok
        print(f"train f32: |loss_k-loss_x| {dl:.2e}; max grad diff {gdiff:.2e} "
              f"(grad scale {gscale:.2e}) {'OK' if ok else 'FAIL'}", flush=True)

    print("chip_parity:", "FAIL" if fail else "PASS")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
