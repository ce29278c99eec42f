#!/usr/bin/env python
"""Minimal standalone repro/bisect harness for the compiled ln_mlp_vjp TPU
worker crash (PERF.md "ln_mlp worker crash": any MUMPY_FUSED_TRAIN_SITES
variant including ``mlp`` kills the TPU worker process on the first train
step on the current axon runtime; reproduced at round-2 HEAD, i.e. a runtime
regression, not a repo change).

Strategy: a worker crash takes the whole client process down, so every case
runs in a FRESH SUBPROCESS; the parent records pass/crash per case and prints
a bisect table.  Cases isolate the candidate factors one at a time:

* forward-only vs full VJP (which kernel faults?)
* 8-multiple rows vs the padded non-8-multiple path (the ViT tail's
  B*49*3 rows)
* bf16 vs f32
* production widths (c=768, m=3072) vs small
* raised vmem limit vs Mosaic default (MUMPY_VMEM_LIMIT_MB)

``--collect`` abstract-traces the flagship DVI train step with the mlp site
force-enabled and prints the exact (rows, c, m, dtype) set the production
step feeds the kernel — no device work, pure jax.eval_shape.

Usage:
    python scripts/ln_mlp_repro.py --collect      # list production shapes
    python scripts/ln_mlp_repro.py                # run the bisect sweep
    python scripts/ln_mlp_repro.py --case vit_tail_grad   # one case, in-process
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> (rows, c, m, dtype, grad)
CASES = {
    # harness sanity (small, 8-multiple rows)
    "small_fwd": (64, 96, 384, "float32", False),
    "small_grad": (64, 96, 384, "float32", True),
    # the global-ViT tail: B*49*3 = 1764 rows at DVI batch 12 — NOT an
    # 8-multiple, exercises the _pad_rows path at production width
    "vit_tail_fwd": (1764, 768, 3072, "bfloat16", False),
    "vit_tail_grad": (1764, 768, 3072, "bfloat16", True),
    # same width, 8-multiple rows: isolates the pad path
    "vit_tail_pad8_grad": (1760, 768, 3072, "bfloat16", True),
    # f32 at the same shape: isolates dtype
    "vit_tail_f32_grad": (1764, 768, 3072, "float32", True),
    # representative cross-block tails (stage dims x mlp ratio 4)
    "cross_s0_grad": (37632, 96, 384, "bfloat16", True),
    "cross_s2_grad": (2352, 512, 2048, "bfloat16", True),
    # Round 5: the REMAINING production instances — the round-4 "all 8
    # production shapes" sweep was collected per-(rows,c,m) FAMILY and missed
    # these six; an eval_shape recount of the flagship train step (batch 12)
    # shows 9 distinct instances.  The big view-3 rows (112896, 28224) were
    # never run standalone — candidate culprits for the composed-only crash.
    "v3_s0_grad": (112896, 128, 512, "bfloat16", True),
    "v3_s1_grad": (28224, 256, 1024, "bfloat16", True),
    "v12_s1_grad": (9408, 192, 768, "bfloat16", True),
    "v3_s2_grad": (7056, 512, 2048, "bfloat16", True),
    "v12_s2_grad": (2352, 384, 1536, "bfloat16", True),
    "v3_s3_grad": (1764, 1024, 4096, "bfloat16", True),
    "merged_vit_grad": (588, 768, 3072, "bfloat16", True),
}


def collect_shapes():
    """eval_shape-trace the flagship train step with the mlp site enabled and
    print every (rows, c, m, dtype) fed to fused_ln_mlp_train."""
    os.environ["MUMPY_FUSED_TRAIN_SITES"] = "all"
    os.environ["MUMPY_ALLOW_CRASHING_KERNELS"] = "1"
    os.environ["MUMPY_FUSED_TRAIN"] = "interpret"  # trace-only; nothing runs

    import jax
    import jax.numpy as jnp

    import mumpy_tpu.ops.pallas.ln_mlp_vjp as lmv
    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import create_train_state, train_step

    seen = set()
    orig = lmv.fused_ln_mlp_train

    def recording(x, weights, keep, interpret=False):
        seen.add((x.shape[0], x.shape[1], weights["wfc1"].shape[1],
                  str(x.dtype)))
        return orig(x, weights, keep, interpret)

    lmv.fused_ln_mlp_train = recording
    try:
        cfg = multiswin_config()
        batch = {
            "image": jax.ShapeDtypeStruct((12, 3, 224, 224, 3), jnp.float32),
            "mask": jax.ShapeDtypeStruct((12, 224 * 224), jnp.float32),
        }

        def step(params_rng, key):
            state = create_train_state(cfg, OptimConfig(), 10, params_rng)
            b = {k: jnp.zeros(v.shape, v.dtype) for k, v in batch.items()}
            return train_step(state, b, key, compute_dtype=jnp.bfloat16)

        jax.eval_shape(step, jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    finally:
        lmv.fused_ln_mlp_train = orig
    print("production fused_ln_mlp_train shapes (rows, c, m, dtype):")
    for s in sorted(seen):
        print("  ", s)


def run_case(name: str):
    rows, c, m, dtype, grad = CASES[name]
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mumpy_tpu.ops.pallas.ln_mlp_vjp as lmv

    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, c)), dt)
    keep = jnp.ones((rows, 1), jnp.float32)
    w = {
        "lns": jnp.ones((1, c), dt), "lnb": jnp.zeros((1, c), dt),
        "wfc1": jnp.asarray(rng.standard_normal((c, m)) / np.sqrt(c), dt),
        "bfc1": jnp.zeros((1, m), dt),
        "wfc2": jnp.asarray(rng.standard_normal((m, c)) / np.sqrt(m), dt),
        "bfc2": jnp.zeros((1, c), dt),
    }

    def loss(x, w):
        return jnp.sum(lmv.fused_ln_mlp_train(x, w, keep, False)
                       .astype(jnp.float32))

    fn = jax.jit(jax.value_and_grad(loss) if grad else loss)
    out = fn(x, w)
    v = out[0] if grad else out
    print(f"[{name}] OK value={float(v):.4f}", flush=True)


# ---------------------------------------------------------------------------
# Composed bisect (round 5, VERDICT r4 item 2).  Round-4 state: the kernel is
# standalone-CLEAN at all 8 production shapes, but the mlp site ALONE inside
# the FULL flagship train step kills the worker.  These cases halve the
# COMPOSED program two ways, each in a fresh subprocess:
#   * depth: reduced-stage flagship (all view depths (1,1,1,1), 2-layer global
#     ViT) — same instance shapes, ~10x smaller surrounding program (also
#     compiles ~10x faster through the tunnel);
#   * instance: full program, MUMPY_MLP_SITE_WIDTHS restricting the kernel to
#     one channel width (96 / 384 / 512 / 768 — the production instance set).
# name -> (reduced_model, widths or None)
COMPOSED_CASES = {
    "reduced_all_widths": (True, None),
    "reduced_vit_only": (True, "768"),
    "reduced_cross_only": (True, "96,128,192,256,384,512"),
    "full_vit_only": (False, "768"),
    "full_s0_only": (False, "96"),
}


def run_composed(name: str, batch: int = 12, fwd_only: bool = False):
    """One flagship (or reduced-stage flagship) train step with ONLY the mlp
    train-kernel site enabled, optionally width-filtered.  Crashing cases kill
    the TPU worker (and this process); the parent records rc != 0.

    ``name`` may also be a custom spec "custom:<reduced|full>:<widths|all>"
    (widths comma-joined with '+' so the spec stays one shell token), e.g.
    ``custom:reduced:768+512`` — the deep-bisect splits are generated, not
    hand-listed."""
    if name.startswith("custom:"):
        _, model, wspec = name.split(":")
        reduced = model == "reduced"
        widths = None if wspec == "all" else wspec.replace("+", ",")
    else:
        reduced, widths = COMPOSED_CASES[name]
    os.environ["MUMPY_FUSED_TRAIN_SITES"] = "mlp"
    os.environ["MUMPY_ALLOW_CRASHING_KERNELS"] = "1"
    if widths:
        os.environ["MUMPY_MLP_SITE_WIDTHS"] = widths
    else:
        os.environ.pop("MUMPY_MLP_SITE_WIDTHS", None)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import mumpy_tpu.ops.pallas.swin_block_vjp as vjp_mod
    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import create_train_state, make_jitted_steps

    cfg = multiswin_config()
    if reduced:
        views = tuple(dataclasses.replace(v, depths=(1, 1, 1, 1))
                      for v in cfg.views)
        ge = dataclasses.replace(cfg.global_encoder, num_layers=2)
        cfg = dataclasses.replace(cfg, views=views, global_encoder=ge)
    rng = np.random.default_rng(0)
    b = {
        "image": jnp.asarray(rng.standard_normal(
            (batch, 3, 224, 224, 3)), jnp.float32),
        "mask": jnp.asarray(
            (rng.uniform(size=(batch, 224 * 224)) > 0.9), jnp.float32),
    }
    vjp_mod.set_train_mode("compiled")
    state = create_train_state(cfg, OptimConfig(), iter_max=1000,
                               rng=jax.random.PRNGKey(0))
    if fwd_only:
        # value only, deterministic=False so the TRAIN mlp-site kernel's
        # FORWARD runs without its backward — splits the fwd/bwd dimension of
        # the composed crash.
        from mumpy_tpu.train.trainer import _loss_for_batch

        @jax.jit
        def fwd(params, b, rng):
            loss, _ = _loss_for_batch(
                state.apply_fn, params, b, rng, False, jnp.bfloat16)
            return loss
        v = fwd(state.params, b, jax.random.PRNGKey(1))
        print(f"[{name}] OK loss={float(v):.4f} (fwd-only)", flush=True)
        return
    _, jtrain, _ = make_jitted_steps(mesh=None, compute_dtype=jnp.bfloat16)
    state, m = jtrain(state, b, jax.random.PRNGKey(1))
    print(f"[{name}] OK loss={float(m['total']):.4f}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", default=None)
    p.add_argument("--collect", action="store_true")
    p.add_argument("--composed", action="store_true",
                   help="run the composed (full-train-step) bisect cases")
    p.add_argument("--composed-case", default=None)
    p.add_argument("--fwd-only", action="store_true",
                   help="composed case: run the value only (train-kernel fwd "
                        "without its backward)")
    p.add_argument("--timeout", type=int, default=900,
                   help="per-case compile+run budget (tunnel compiles are slow)")
    args = p.parse_args()
    if args.collect:
        collect_shapes()
        return
    if args.composed_case:
        run_composed(args.composed_case, fwd_only=args.fwd_only)
        return
    if args.composed:
        results = {}
        for name in COMPOSED_CASES:
            print(f"=== {name} {COMPOSED_CASES[name]} ===", flush=True)
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--composed-case", name],
                    timeout=args.timeout, capture_output=True, text=True,
                )
                ok = r.returncode == 0 and "OK" in r.stdout
                results[name] = "PASS" if ok else f"FAIL rc={r.returncode}"
                tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
            except subprocess.TimeoutExpired:
                results[name] = "TIMEOUT"
                tail = []
            for line in tail:
                print("   ", line)
            print(f"--> {results[name]}", flush=True)
        print("\ncomposed bisect table:")
        for name, res in results.items():
            print(f"  {name:22s} {COMPOSED_CASES[name]!s:36s} {res}")
        return
    if args.case:
        run_case(args.case)
        return
    results = {}
    for name in CASES:
        print(f"=== {name} {CASES[name]} ===", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", name],
            timeout=args.timeout, capture_output=True, text=True,
        )
        ok = r.returncode == 0 and "OK" in r.stdout
        results[name] = "PASS" if ok else f"FAIL rc={r.returncode}"
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        for line in tail:
            print("   ", line)
        print(f"--> {results[name]}", flush=True)
    print("\nbisect table:")
    for name, res in results.items():
        print(f"  {name:24s} {CASES[name]!s:44s} {res}")


if __name__ == "__main__":
    main()
