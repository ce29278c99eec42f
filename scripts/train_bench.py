#!/usr/bin/env python
"""Interleaved training-step throughput comparison (flagship model, DVI recipe).

Variants are remat strategies for the scanned deep-stage block pairs:
  full   recompute everything in the bwd pass (O(1) activation memory)
  dots   save matmul outputs, recompute elementwise only
  none   no remat (checkpointing off)
Batch = 6 clips x 2 inpainting streams = 12 (the reference DVI recipe,
scripts/train_davis.sh), bf16 compute with f32 master params.
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--variants", default="full,dots,none")
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import create_train_state, make_jitted_steps

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal(
            (args.batch, 3, 224, 224, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(args.batch, 224 * 224)) > 0.9).astype(np.float32),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    import mumpy_tpu.ops.pallas.swin_block_vjp as vjp_mod

    progs = {}
    for variant in args.variants.split(","):
        # "<remat>[+kernel][+unroll][+sites:a.b]": +kernel enables the
        # custom-VJP fused train kernels, +unroll unrolls the training-path
        # scans, +sites:block.cross.mlp restricts which train-kernel call
        # sites fire ("." separates because "," separates variants; the gate
        # is trace-time, so setting the env before the compile call works)
        base, *suffixes = variant.split("+")
        cfg = multiswin_config()
        if base == "none":
            cfg = dataclasses.replace(cfg, remat=False)
        else:
            cfg = dataclasses.replace(cfg, remat_policy=base)
        if "unroll" in suffixes:
            cfg = dataclasses.replace(cfg, train_scan_unroll=True)
        os.environ.pop("MUMPY_FUSED_TRAIN_SITES", None)
        os.environ.pop("MUMPY_BWD_DW", None)
        for sfx in suffixes:
            if sfx.startswith("sites:"):
                os.environ["MUMPY_FUSED_TRAIN_SITES"] = sfx[6:].replace(".", ",")
            if sfx == "dwspill":  # spill-form block backward (A/B vs in-kernel dW)
                os.environ["MUMPY_BWD_DW"] = "spill"
        vjp_mod.set_train_mode("compiled" if "kernel" in suffixes else "off")
        state = create_train_state(
            cfg, OptimConfig(), iter_max=1000, rng=jax.random.PRNGKey(0)
        )
        _, jtrain, _ = make_jitted_steps(mesh=None, compute_dtype=jnp.bfloat16)
        t0 = time.time()
        try:
            # the step donates its input state; keep the returned one
            state, m = jtrain(state, batch, jax.random.PRNGKey(1))
            float(m["total"])
        except Exception as e:
            print(f"[FAIL] {variant}: {str(e)[:300]}", flush=True)
            # free this variant's device buffers (an OOM'd variant otherwise
            # poisons every later create_train_state in the process)
            jax.tree_util.tree_map(
                lambda a: a.delete() if hasattr(a, "delete") else None, state)
            del state
            continue
        finally:
            vjp_mod.set_train_mode(None)
        print(f"[compile] {variant}: {time.time()-t0:.0f}s", flush=True)
        progs[variant] = [jtrain, state]

    def run_chain(name, n):
        jtrain, state = progs[name]
        key = jax.random.PRNGKey(2)
        state, m = jtrain(state, batch, key)
        float(m["total"])
        t0 = time.perf_counter()
        for i in range(n):
            state, m = jtrain(state, batch, jax.random.fold_in(key, i))
        v = float(m["total"])
        assert np.isfinite(v)
        dt = time.perf_counter() - t0
        progs[name][1] = state
        return dt

    names = list(progs)
    for nm in names:
        run_chain(nm, 2)
    times = {nm: [] for nm in names}
    for _ in range(args.rounds):
        for nm in names:
            times[nm].append(run_chain(nm, args.iters) / args.iters)
    print("\ntrain step ms (per round):")
    for nm in names:
        ts = np.array(times[nm]) * 1e3
        cps = args.batch / (ts / 1e3)
        print(f"  {nm:6s}: {' '.join(f'{t:7.1f}' for t in ts)}"
              f"  med {np.median(ts):7.1f} ms = {np.median(cps):6.1f} clips/s")


if __name__ == "__main__":
    main()
