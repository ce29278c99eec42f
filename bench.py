#!/usr/bin/env python
"""Benchmark: localization frames/sec on one TPU chip (flagship 224^2 model).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where the
extra fields implement the cross-round measurement protocol (VERDICT r3 item
5): alongside the candidate (current defaults), the SAME process compiles and
interleaves a PINNED CONTROL — the pure-XLA forward under an explicit,
never-changing env set (``CONTROL_ENV``).  Cross-process drift on the tunnel
reaches ~10% (PERF.md), so the only drift-immune cross-round comparison is
``candidate_over_control``; the raw f/s value is kept for continuity but moves
with the day's runtime.

Methodology: a scalar data dependency is chained through the iterations (each
step's input is perturbed by the previous step's output) and the final carry is
FETCHED to the host, which forces the entire chain to execute.  Weaker syncs
report fantasy numbers through the remote-TPU tunnel: `block_until_ready` on an
un-fetched buffer resolves without proving execution (a known-size 8192^3 matmul
"ran" at 130x chip peak under it; with the fetch it lands at 189 TFLOP/s, i.e.
~96% of v5e bf16 peak, validating this harness).  Throughput is taken as the
slope between a short and a long chain so the one-time round-trip cancels, and
candidate/control chains are interleaved per round so drift hits both equally.

Baseline note: the reference repo publishes no throughput numbers (BASELINE.md).
``vs_baseline`` therefore compares against ONE documented analytic estimate of
the PyTorch reference on its published rig (RTX 3090 Ti), fixed in
``REF_FPS`` below and derived in BASELINE.md ("Reference throughput estimate"):
174.3 GFLOP/clip (XLA post-optimization cost analysis of the architecture-
identical forward, batch-1 f32; FMA = 2 flops) against 35.6 TFLOP/s fp32 peak
at 40% sustained utilization — generous for research-grade eager PyTorch.
"""

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# The one documented reference-throughput estimate (see module docstring and
# BASELINE.md).  174.3 GFLOP/clip measured once via
#   jax.jit(forward).lower(...).compile().cost_analysis()["flops"]
# on the flagship 224^2 model, batch 1, f32, pure-XLA path (pallas custom calls
# hide flops from the cost analysis, so the XLA lowering is the honest count).
REF_CLIP_FLOPS = 174.3e9
REF_GPU_SUSTAINED_FLOPS = 35.6e12 * 0.40  # RTX 3090 Ti fp32 peak x 40% util
REF_FPS = REF_GPU_SUSTAINED_FLOPS / REF_CLIP_FLOPS  # ~81.7 frames/s

# The PINNED control: pure-XLA forward with every mumpy trace-time gate fixed
# to an explicit value.  DO NOT EDIT — editing it breaks comparability of every
# recorded BENCH_r*.json; add a new field instead if a second control is needed.
CONTROL_ENV = {
    "MUMPY_FUSED_BLOCK": "off",
    "MUMPY_FUSED_ATTN_SITES": "none",
    "MUMPY_VIT_UNROLLED": "1",
    "MUMPY_DECODER_FAST": "1",
    "MUMPY_DAP_EARLY": "1",
    "MUMPY_PADDED_CARRY": "0",
    "MUMPY_SMALL_CONV": "0",
    "MUMPY_CVA_KERNEL_MIN_C": "0",
    "MUMPY_CVA_OFFSET_DEDUP": "1",
}


def main():
    p = argparse.ArgumentParser()
    # serving batch 32 measured best on v5e with the full-width kernels
    # (scripts/batch_scaling.py: 8/16/32 -> 247/252/259 frames/s)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    # 5 rounds: enough per-round ratio samples to quote median + min/max
    # (the spread fields below); each round is ~5s of chain time at batch 32
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--no-control", action="store_true",
                   help="skip the pinned pure-XLA control (halves compile time)")
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.utils.serving import prepare_for_inference

    cfg = multiswin_config()
    model = Mumpy(cfg)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.standard_normal((args.batch, 3, cfg.image_size, cfg.image_size, 3)),
        dtype=jnp.float32,
    )
    params0 = jax.jit(model.init)(jax.random.PRNGKey(0), clip[:1])
    if dtype == jnp.bfloat16:
        params0 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params0,
        )

    def build(name, env):
        """Trace-time env gates -> prepared params + compiled step."""
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            v = prepare_for_inference(model, params0, clip.astype(dtype))

            @jax.jit
            def step(params, clip, carry):
                out = model.apply(
                    params, (clip * (1.0 + carry)).astype(dtype),
                    deterministic=True,
                )
                probs = jax.nn.sigmoid(out.astype(jnp.float32))
                return jnp.mean(probs) * 1e-6  # scalar carry -> serial dep

            t0 = time.time()
            # Keep and invoke the AOT-compiled executable directly (ADVICE
            # r4): run_chain must never fall back to the jitted wrapper,
            # which could re-trace under the AMBIENT env after CONTROL_ENV
            # is restored if a future JAX separates the AOT and call caches.
            compiled = step.lower(v, clip, jnp.float32(0.0)).compile()
            print(f"[compile] {name}: {time.time() - t0:.0f}s", flush=True)
            return compiled, v
        finally:
            for k, old in saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old

    variants = {"candidate": build("candidate", {})}
    if not args.no_control:
        variants["control"] = build("control", CONTROL_ENV)

    def run_chain(which, n):
        step, v = variants[which]
        c = jnp.float32(0.0)
        c = step(v, clip, c)
        float(c)  # warm fetch
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(v, clip, c)
        val = float(c)  # force the whole chain to execute
        assert np.isfinite(val)
        return time.perf_counter() - t0

    for which in variants:
        run_chain(which, 3)  # warm
    n_short = max(2, args.iters // 4)
    fps = {which: [] for which in variants}
    for _ in range(args.rounds):
        for which in variants:  # interleaved: drift hits both equally
            t_short = run_chain(which, n_short)
            t_long = run_chain(which, args.iters)
            dt = (t_long - t_short) / (args.iters - n_short)
            fps[which].append(args.batch / dt)

    cand = float(np.median(fps["candidate"]))
    out = {
        "metric": "localization_frames_per_sec_per_chip",
        "value": round(cand, 2),
        "unit": "frames/s",
        "vs_baseline": round(cand / REF_FPS, 2),
    }
    if "control" in fps:
        ctrl = float(np.median(fps["control"]))
        out["control_fps"] = round(ctrl, 2)
        # PER-ROUND ratios (candidate round i / control round i — the chains
        # are interleaved, so pairing by round cancels drift), quoted as
        # median + min/max so a few-percent cross-round move is legible as
        # noise or signal (VERDICT r4 weak #3).  Convention (PERF.md): compare
        # rounds on the median; treat moves inside the min..max band as noise.
        ratios = sorted(c / k for c, k in zip(fps["candidate"], fps["control"]))
        out["candidate_over_control"] = round(float(np.median(ratios)), 4)
        out["ratio_min"] = round(ratios[0], 4)
        out["ratio_max"] = round(ratios[-1], 4)
        out["ratio_rounds"] = len(ratios)
        out["control"] = "pure-XLA forward, pinned env (bench.py CONTROL_ENV)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
