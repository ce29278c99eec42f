#!/usr/bin/env python
"""Decompose the training step: fwd-only vs fwd+bwd vs full step (interleaved).

Isolates where the DVI-recipe train step time goes:
  fwd    loss value only (no grad), same remat/kernel config as training
  grad   value_and_grad, gradients reduced to a scalar (no optimizer)
  step   the real train step (fwd+bwd+3-group optimizer, donated state)

All variants compile in ONE process and run interleaved (PERF.md: cross-run
drift through the tunnel is ±8%; within-run spread ±0.3%).
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
    p.add_argument("--tiny", action="store_true", help="CPU smoke test config")
    args = p.parse_args()

    from mumpy_tpu.configs.model_config import multiswin_config, tiny_config
    from mumpy_tpu.train.optim import OptimConfig
    from mumpy_tpu.train.trainer import (
        _loss_for_batch, create_train_state, make_jitted_steps)

    cfg = tiny_config() if args.tiny else multiswin_config()
    size = cfg.image_size
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal(
            (args.batch, 3, size, size, 3)).astype(np.float32),
        "mask": (rng.uniform(size=(args.batch, size * size)) > 0.9).astype(
            np.float32),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    state = create_train_state(
        cfg, OptimConfig(), iter_max=1000, rng=jax.random.PRNGKey(0))
    _, jtrain, _ = make_jitted_steps(mesh=None, compute_dtype=jnp.bfloat16)
    # jtrain donates its state; fwd/grad need their own param buffers
    params0 = jax.tree_util.tree_map(jnp.copy, state.params)

    @jax.jit
    def jfwd(params, batch, rng):
        loss, _ = _loss_for_batch(
            state.apply_fn, params, batch, rng, False, jnp.bfloat16)
        return loss

    @jax.jit
    def jgrad(params, batch, rng):
        g = jax.grad(
            lambda p: _loss_for_batch(
                state.apply_fn, p, batch, rng, False, jnp.bfloat16)[0]
        )(params)
        # reduce grads to one scalar so only a scalar is fetched; the sum
        # itself is one cheap pass over the grad tree
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)), g, 0.0)

    key = jax.random.PRNGKey(2)

    def run_fwd(n):
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(n):
            c = jfwd(params0, batch, jax.random.fold_in(key, i)) + c * 0
        assert np.isfinite(float(c))
        return time.perf_counter() - t0

    def run_grad(n):
        c = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(n):
            c = jgrad(params0, batch, jax.random.fold_in(key, i)) + c * 0
        assert np.isfinite(float(c))
        return time.perf_counter() - t0

    st = [state]

    def run_step(n):
        t0 = time.perf_counter()
        m = None
        for i in range(n):
            st[0], m = jtrain(st[0], batch, jax.random.fold_in(key, i))
        assert np.isfinite(float(m["total"]))
        return time.perf_counter() - t0

    variants = {"fwd": run_fwd, "grad": run_grad, "step": run_step}
    for nm, fn in variants.items():
        t0 = time.time()
        fn(1)
        print(f"[compile] {nm}: {time.time()-t0:.0f}s", flush=True)
    for fn in variants.values():
        fn(2)  # warm

    times = {nm: [] for nm in variants}
    for _ in range(args.rounds):
        for nm, fn in variants.items():
            times[nm].append(fn(args.iters) / args.iters)
    print("\ncomponent ms (per round):")
    for nm in variants:
        ts = np.array(times[nm]) * 1e3
        print(f"  {nm:5s}: {' '.join(f'{t:7.1f}' for t in ts)}"
              f"  med {np.median(ts):7.1f} ms")
    f, g, s = (np.median(np.array(times[nm]) * 1e3) for nm in variants)
    print(f"\nfwd {f:.1f} | bwd {g - f:.1f} | optimizer+update {s - g:.1f} "
          f"| total {s:.1f} ms")


if __name__ == "__main__":
    main()
