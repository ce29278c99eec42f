#!/usr/bin/env python
"""Interleaved A/B throughput comparison on the flagship model.

Run-to-run bench variance through the tunnel is ~±8% (identical configs have
measured 209-228 f/s across runs), so single-run comparisons are meaningless.
This harness compiles EVERY variant in one process and interleaves timed
chains (A B C A B C ...), so chip/tunnel drift hits all variants equally.
Timing per chain follows bench.py's honest protocol: scalar data dependency
through iterations + host fetch, slope implicit in the per-chain mean over
rounds.

Usage: python scripts/ab_bench.py --variants none,vit,cross,cva,all --batch 8
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10, help="steps per chain")
    p.add_argument("--rounds", type=int, default=4, help="interleaved rounds")
    p.add_argument("--variants", default="none,all")
    p.add_argument("--fused-block", default=None,
                   help="override MUMPY_FUSED_BLOCK per variant list, e.g. 'off'")
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.utils.serving import prepare_for_inference

    cfg = multiswin_config()
    model = Mumpy(cfg)
    rng = np.random.default_rng(0)
    clip = jnp.asarray(
        rng.standard_normal((args.batch, 3, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), clip[:1])
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    clip16 = clip.astype(jnp.bfloat16)

    steps = {}
    for variant in args.variants.split(","):
        # variant syntax: "<sites>[/<fused_block>]", e.g. "none/off" = pure XLA;
        # "+" in sites stands for "," (variants themselves are comma-separated).
        # A "nounroll" site token instead disables the unrolled small-n ViT
        # attention (MUMPY_VIT_UNROLLED=0) for this variant.
        # ... and a "slowdec" token disables the decoder fast paths
        # (MUMPY_DECODER_FAST=0: transpose+concat TemporalSqueeze,
        # reduce_window avg-pool) for this variant.
        sites, _, block = variant.partition("/")
        tokens = sites.replace("+", ",").split(",")
        os.environ["MUMPY_VIT_UNROLLED"] = "0" if "nounroll" in tokens else "1"
        os.environ["MUMPY_DECODER_FAST"] = "0" if "slowdec" in tokens else "1"
        os.environ["MUMPY_CVA_KERNEL_MIN_C"] = "192" if "cvawide" in tokens else "0"
        # "nodedup" reverts the CVA offset-branch ratio dedup for this variant
        os.environ["MUMPY_CVA_OFFSET_DEDUP"] = "0" if "nodedup" in tokens else "1"
        # "dapstrided" reverts the DAP channel-block mean to strided slices
        if "dapstrided" in tokens:
            os.environ["MUMPY_DAP_FORM"] = "strided"
        else:
            os.environ.pop("MUMPY_DAP_FORM", None)
        # "padcarry" opts into the padded (sublane-rounded) window scan carry
        # (measured slower at batch 32 — default off, see encoder.py)
        os.environ["MUMPY_PADDED_CARRY"] = "1" if "padcarry" in tokens else "0"
        # "smallconv" opts into the decoder stencil-form convs (measured
        # slower at batch 32 — default off, see decoder._small_conv_enabled)
        os.environ["MUMPY_SMALL_CONV"] = "1" if "smallconv" in tokens else "0"
        # "latedap" reverts the DAP-before-upsample reorder in decoder_5
        os.environ["MUMPY_DAP_EARLY"] = "0" if "latedap" in tokens else "1"
        # "hoistsm" reverts the whole-block kernel to the round-2 hoisted
        # all-head softmax (default is per-head since the round-4 runtime)
        os.environ["MUMPY_SOFTMAX_FORM"] = ("hoist" if "hoistsm" in tokens
                                            else "perhead")
        if "bigtiles" in tokens:  # 2MB per-buffer tile cap (default 768KB)
            os.environ["MUMPY_PER_BUF_CAP_KB"] = "2048"
        else:
            os.environ.pop("MUMPY_PER_BUF_CAP_KB", None)
        # "pairfuse" opts into the whole-PAIR kernel for the scanned stage-2
        # pairs (ops/pallas/swin_pair.py; default off)
        os.environ["MUMPY_PAIR_FUSION"] = "1" if "pairfuse" in tokens else "0"
        sites = ",".join(t for t in tokens
                         if t not in ("nounroll", "slowdec", "cvawide",
                                      "bigtiles", "nodedup", "dapstrided",
                                      "padcarry", "smallconv", "latedap",
                                      "hoistsm", "pairfuse"))\
            or "none"
        os.environ["MUMPY_FUSED_ATTN_SITES"] = sites
        os.environ["MUMPY_FUSED_BLOCK"] = (
            block or args.fused_block or "auto"
        )
        v = prepare_for_inference(model, params, clip16)

        def step(v, clip, carry):
            out = model.apply(v, (clip * (1.0 + carry)).astype(jnp.bfloat16),
                              deterministic=True)
            return jnp.mean(jax.nn.sigmoid(out.astype(jnp.float32))) * 1e-6

        jitted = jax.jit(step)
        t0 = time.time()
        jitted(v, clip, jnp.float32(0.0)).block_until_ready()
        print(f"[compile] {variant}: {time.time()-t0:.0f}s", flush=True)
        steps[variant] = (jitted, v)

    def run_chain(name, n):
        jitted, v = steps[name]
        c = jnp.float32(0.0)
        c = jitted(v, clip, c)
        float(c)  # sync entry
        t0 = time.perf_counter()
        for _ in range(n):
            c = jitted(v, clip, c)
        assert np.isfinite(float(c))
        return time.perf_counter() - t0

    names = list(steps)
    for name in names:  # warm
        run_chain(name, 2)
    times = {n: [] for n in names}
    for r in range(args.rounds):
        for name in names:
            times[name].append(run_chain(name, args.iters) / args.iters)
    print("\nper-step seconds (per round):")
    for name in names:
        ts = np.array(times[name])
        fps = args.batch / ts
        print(f"  {name:8s}: {' '.join(f'{t*1e3:7.2f}ms' for t in ts)}"
              f"  -> fps med {np.median(fps):7.1f}  best {fps.max():7.1f}")


if __name__ == "__main__":
    main()
