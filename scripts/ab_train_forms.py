#!/usr/bin/env python
"""Interleaved A/B of the scatter-VJP vs exact-rewrite gather forms on the
FULL flagship value_and_grad (DVI recipe batch).

Variant "scatter": MUMPY_PERM_TAKE=scatter MUMPY_RELPOS=gather (the naive
forms whose VJPs are TPU scatters).  Variant "exact": the default rewrites
(inverse-perm custom-VJP take + one-hot-matmul rel-pos bias).  Both trace in
ONE process (the gates are trace-time) and run interleaved.
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
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import (
        _loss_for_batch, create_train_state)

    cfg = multiswin_config()
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal(
            (args.batch, 3, 224, 224, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(args.batch, 224 * 224)) > 0.9).astype(
            np.float32),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    state = create_train_state(
        cfg, OptimConfig(), iter_max=1000, rng=jax.random.PRNGKey(0))
    params0 = jax.tree_util.tree_map(jnp.copy, state.params)
    key = jax.random.PRNGKey(2)

    def mk(form):
        if form == "scatter":
            os.environ["MUMPY_PERM_TAKE"] = "scatter"
            os.environ["MUMPY_RELPOS"] = "gather"
        else:
            os.environ["MUMPY_PERM_TAKE"] = ""
            os.environ["MUMPY_RELPOS"] = ""

        @jax.jit
        def jgrad(params, batch, rng):
            g = jax.grad(
                lambda p: _loss_for_batch(
                    state.apply_fn, p, batch, rng, False, jnp.bfloat16)[0]
            )(params)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)), g, 0.0)

        t0 = time.time()
        v = jgrad(params0, batch, jax.random.fold_in(key, 0))
        print(f"[compile] {form}: {time.time()-t0:.0f}s |g|={float(v):.4f}",
              flush=True)
        os.environ["MUMPY_PERM_TAKE"] = ""
        os.environ["MUMPY_RELPOS"] = ""
        return jgrad

    fns = {form: mk(form) for form in ("exact", "scatter")}

    def run(f, n):
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(n):
            c = f(params0, batch, jax.random.fold_in(key, i)) + c * 0
        assert np.isfinite(float(c))
        return (time.perf_counter() - t0) / n

    for f in fns.values():
        run(f, 2)  # warm
    times = {nm: [] for nm in fns}
    for _ in range(args.rounds):
        for nm, f in fns.items():
            times[nm].append(run(f, args.iters) * 1e3)
    print("\nvalue_and_grad ms/call (per round):")
    for nm, ts in times.items():
        print(f"  {nm:8s}: {' '.join(f'{t:7.1f}' for t in ts)}"
              f"  med {np.median(ts):7.1f} ms")


if __name__ == "__main__":
    main()
