#!/usr/bin/env python
"""Intra-kernel time breakdown for the fused Swin-block kernel via ablation.

The fused block is one opaque custom call — the xplane trace cannot attribute
time inside it.  This probe compiles ABLATED variants of the kernel (skip
softmax, skip attention matmuls, skip the MLP, ...) at a given stage shape and
interleaves timed chains, so the deltas give the per-phase cost.  Ablations
change the math (outputs are garbage); only the timing is meaningful.

Usage: python scripts/kernel_probe.py --shape stage2v3 [--iters 30 --rounds 4]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mumpy_tpu.ops.pallas.swin_block import (_choose_tile, _erf, _ln,
                                             fused_swin_block)

# (r, n, c, heads, mlp_ratio, p_w) — r at serving batch 16
SHAPES = {
    # stage-2 view3: 14x14 res, t=3 -> 12 windows/clip, c=512, 16 heads
    "stage2v3": (192, 49, 512, 16, 4, 12),
    # stage-2 view1/2: c=384, 12 heads
    "stage2v12": (192, 49, 384, 12, 4, 12),
    # stage-0 view3: 56x56 res, t=3 -> 192 windows/clip, c=128
    "stage0v3": (3072, 49, 128, 4, 4, 192),
    # CPU-sanity size (use with --cpu: interpret-mode check that every
    # ablation traces and runs)
    "tiny": (8, 49, 64, 2, 4, 4),
}


def ablated_kernel(
    x_ref, mb_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    out_ref, qkv_scr, o_scr,
    *, heads, n_valid, scale,
    do_ln1=True, do_qkv=True, do_scores=True, do_softmax=True, do_pv=True,
    do_proj=True, do_mlp=True, hoist_softmax=False, scores_scr=None,
    scr3d=False, pack=0, qp_scr=None, kp_scr=None, sp_scr=None,
    head_batch=False, qhb_scr=None, khb_scr=None, vhb_scr=None,
):
    """Copy of swin_block._block_kernel with phase switches.

    hoist_softmax: write all heads' scores to a scratch, run ONE softmax over
    (heads*tile, npad, npad), then a second per-head loop for p@v — the
    candidate layout for cutting per-head op-dispatch overhead.
    """
    tile, npad, c = x_ref.shape
    hd = c // heads
    x = x_ref[:]
    dtype = x.dtype

    if do_ln1:
        h1 = _ln(
            x.astype(jnp.float32), ln1s_ref[:].astype(jnp.float32),
            ln1b_ref[:].astype(jnp.float32),
        ).astype(dtype)
    else:
        h1 = x
    if do_qkv:
        h2d = h1.reshape(tile * npad, c)
        qkv = (jax.lax.dot_general(
            h2d, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[:].astype(jnp.float32)).astype(dtype)
        qkv_scr[:] = qkv.reshape(qkv_scr.shape)
    else:
        if scr3d:
            qkv_scr[:, :, :c] = h1
        else:
            qkv_scr[:, :c] = h1.reshape(tile * npad, c)

    key_ids = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), dimension=1)

    if pack:
        # LANE-PACKED scores: P heads share one matmul.  q/k of head i sit in
        # lane block [i*hd, (i+1)*hd) and row block i — disjoint lane supports
        # make every off-diagonal (q_i · k_j, i != j) block exactly zero, so
        # ONE (P*npad, P*hd) @ (P*hd, P*kb) matmul yields all P heads' scores
        # on its block diagonal.  Key rows are placed on 64-row blocks so the
        # extraction lane offsets are 64-aligned.
        P, kb = pack, 64
        qp_scr[:] = jnp.zeros_like(qp_scr)
        kp_scr[:] = jnp.zeros_like(kp_scr)
        for g in range(heads // P):
            for i in range(P):
                h = g * P + i
                qp_scr[:, i * npad:(i + 1) * npad, i * hd:(i + 1) * hd] = (
                    qkv_scr[:, :, h * hd:(h + 1) * hd])
                kp_scr[:, i * kb:i * kb + npad, i * hd:(i + 1) * hd] = (
                    qkv_scr[:, :, c + h * hd:c + (h + 1) * hd])
            sp_scr[:] = jax.lax.dot_general(
                qp_scr[:], kp_scr[:], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for i in range(P):
                h = g * P + i
                scores_scr[h * tile:(h + 1) * tile] = (
                    sp_scr[:, i * npad:(i + 1) * npad, i * kb:i * kb + npad]
                    * scale + mb_ref[h].astype(jnp.float32))
        sall = scores_scr[:]
        sall = jnp.where(key_ids[None] < n_valid, sall, -1e30)
        m = jnp.max(sall, axis=-1, keepdims=True)
        e = jnp.exp(sall - m)
        scores_scr[:] = e / jnp.sum(e, axis=-1, keepdims=True)
        for h in range(heads):
            v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            p = scores_scr[h * tile:(h + 1) * tile].astype(dtype)
            o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                p, v3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
    elif head_batch:
        # HEAD-BATCHED attention (the PERF.md round-3 lead): copy each head's
        # hd-lane q/k/v slice into head-major sublane-batched scratches
        # (heads*tile, npad, hd), then run scores, softmax and p@v as ONE
        # batched matmul each over all heads (batch dim = heads*tile) instead
        # of per-head loops.  The per-head work shrinks to 3 lane-slice copies;
        # mb arrives pre-expanded to (heads*tile, npad, npad) so the bias add
        # is one elementwise pass (prepare_weights could build that layout on
        # the host).  Copies are lane-shift VMEM moves — this probe measures
        # whether they cost less than the per-head matmul dispatch they save.
        for h in range(heads):
            qhb_scr[h * tile:(h + 1) * tile] = qkv_scr[:, :, h * hd:(h + 1) * hd]
            khb_scr[h * tile:(h + 1) * tile] = (
                qkv_scr[:, :, c + h * hd:c + (h + 1) * hd])
            vhb_scr[h * tile:(h + 1) * tile] = (
                qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd])
        scores_scr[:] = jax.lax.dot_general(
            qhb_scr[:], khb_scr[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + mb_ref[:].astype(jnp.float32)
        sall = scores_scr[:]
        sall = jnp.where(key_ids[None] < n_valid, sall, -1e30)
        m = jnp.max(sall, axis=-1, keepdims=True)
        e = jnp.exp(sall - m)
        scores_scr[:] = e / jnp.sum(e, axis=-1, keepdims=True)
        ohb = jax.lax.dot_general(
            scores_scr[:].astype(dtype), vhb_scr[:],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        for h in range(heads):  # sublane value slice -> lane-aligned store
            o_scr[:, :, h * hd:(h + 1) * hd] = ohb[h * tile:(h + 1) * tile]
    elif scr3d:
        # 3D scratches: per-head q/k/v access is a pure lane slice — no
        # (tile*npad, hd) -> (tile, npad, hd) sublane-splitting value reshape
        # per head (the 2D layout does 3*heads of them per grid step).
        for h in range(heads):
            q3 = qkv_scr[:, :, h * hd:(h + 1) * hd]
            k3 = qkv_scr[:, :, c + h * hd:c + (h + 1) * hd]
            v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            scores = jax.lax.dot_general(
                q3, k3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale + mb_ref[h].astype(jnp.float32)
            scores = jnp.where(key_ids[None] < n_valid, scores, -1e30)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                p, v3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
    elif hoist_softmax:
        for h in range(heads):
            q3 = qkv_scr[:, h * hd:(h + 1) * hd].reshape(tile, npad, hd)
            k3 = qkv_scr[:, c + h * hd:c + (h + 1) * hd].reshape(tile, npad, hd)
            s = jax.lax.dot_general(
                q3, k3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale + mb_ref[h].astype(jnp.float32)
            scores_scr[h * tile:(h + 1) * tile] = s
        sall = scores_scr[:]
        sall = jnp.where(key_ids[None] < n_valid, sall, -1e30)
        m = jnp.max(sall, axis=-1, keepdims=True)
        e = jnp.exp(sall - m)
        scores_scr[:] = e / jnp.sum(e, axis=-1, keepdims=True)
        for h in range(heads):
            v3 = qkv_scr[:, 2 * c + h * hd:2 * c + (h + 1) * hd].reshape(
                tile, npad, hd)
            p = scores_scr[h * tile:(h + 1) * tile].astype(dtype)
            o_scr[:, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                p, v3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype).reshape(tile * npad, hd)
    else:
        for h in range(heads):
            q3 = qkv_scr[:, h * hd:(h + 1) * hd].reshape(tile, npad, hd)
            k3 = qkv_scr[:, c + h * hd:c + (h + 1) * hd].reshape(tile, npad, hd)
            v3 = qkv_scr[:, 2 * c + h * hd:2 * c + (h + 1) * hd].reshape(
                tile, npad, hd)
            if do_scores:
                scores = jax.lax.dot_general(
                    q3, k3, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale + mb_ref[h].astype(jnp.float32)
            else:
                scores = (q3[:, :, :1] + k3[:, :1, :1]).astype(
                    jnp.float32) * jnp.ones((1, 1, npad), jnp.float32)
            if do_softmax:
                scores = jnp.where(key_ids[None] < n_valid, scores, -1e30)
                m = jnp.max(scores, axis=-1, keepdims=True)
                e = jnp.exp(scores - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            else:
                p = scores.astype(dtype)
            if do_pv:
                o_scr[:, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                    p, v3, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(dtype).reshape(tile * npad, hd)
            else:
                o_scr[:, h * hd:(h + 1) * hd] = (
                    v3 + p[:, :, :1]).astype(dtype).reshape(tile * npad, hd)
    o2d = o_scr[:].reshape(tile * npad, c)
    if do_proj:
        proj = jax.lax.dot_general(
            o2d, wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[:].astype(jnp.float32)
        x = x + proj.astype(dtype).reshape(tile, npad, c)
    else:
        x = x + o2d.reshape(tile, npad, c)

    if do_mlp:
        wc = max(1, min(tile, 2_000_000 // (npad * wfc1_ref.shape[1] * 4)))
        for j in range(0, tile, wc):
            cc = min(wc, tile - j)
            xs = x[j:j + cc]
            h2 = _ln(
                xs.astype(jnp.float32), ln2s_ref[:].astype(jnp.float32),
                ln2b_ref[:].astype(jnp.float32),
            ).astype(dtype).reshape(cc * npad, c)
            f1 = jax.lax.dot_general(
                h2, wfc1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bfc1_ref[:].astype(jnp.float32)
            g = (0.5 * f1 * (1.0 + _erf(f1 * 0.7071067811865476))).astype(dtype)
            f2 = jax.lax.dot_general(
                g, wfc2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bfc2_ref[:].astype(jnp.float32)
            out_ref[j:j + cc] = xs + f2.astype(dtype).reshape(cc, npad, c)
    else:
        out_ref[:] = x


def build(r, n, c, heads, mlp_ratio, p_w, dtype=jnp.bfloat16, tile_override=None,
          vmem_mb=0, **abl):
    rng = np.random.default_rng(0)
    m = c * mlp_ratio
    npad = -(-n // 8) * 8
    hd = c // heads
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.02, dtype)
    x = mk(r, npad, c)
    mb = mk(heads, 1, npad, npad)
    wl = [mk(1, c), mk(1, c), mk(c, 3 * c), mk(1, 3 * c), mk(c, c), mk(1, c),
          mk(1, c), mk(1, c), mk(c, m), mk(1, m), mk(m, c), mk(1, c)]
    isz = jnp.dtype(dtype).itemsize
    tile, _, _ = _choose_tile(
        r, p_w, npad, c, heads, isz,
        extra_weight_bytes=2 * c * m * isz,
        scratch_bytes_per_window=npad * 4 * c * isz,
    )
    if tile_override:
        tile = tile_override  # bypass the budget heuristic (may OOM in Mosaic)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)
    if abl.get("scr3d"):
        scratch = [
            pltpu.VMEM((tile, npad, 3 * c), dtype),
            pltpu.VMEM((tile, npad, c), dtype),
        ]
    else:
        scratch = [
            pltpu.VMEM((tile * npad, 3 * c), dtype),
            pltpu.VMEM((tile * npad, c), dtype),
        ]
    if abl.get("head_batch"):
        # head-batched layout: mb pre-expanded to (heads*tile, npad, npad)
        mb = mk(heads * tile, npad, npad)
        scratch += [
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32),
            pltpu.VMEM((heads * tile, npad, hd), dtype),
            pltpu.VMEM((heads * tile, npad, hd), dtype),
            pltpu.VMEM((heads * tile, npad, hd), dtype),
        ]

        def kern(*refs):
            *io, qkv_scr, o_scr, s_scr, qhb, khb, vhb = refs
            ablated_kernel(*io, qkv_scr, o_scr, heads=heads, n_valid=n,
                           scale=hd ** -0.5, scores_scr=s_scr,
                           qhb_scr=qhb, khb_scr=khb, vhb_scr=vhb, **abl)
    elif abl.get("pack"):
        P, kb = abl["pack"], 64
        scratch += [
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32),
            pltpu.VMEM((tile, P * npad, P * hd), dtype),
            pltpu.VMEM((tile, P * kb, P * hd), dtype),
            pltpu.VMEM((tile, P * npad, P * kb), jnp.float32),
        ]

        def kern(*refs):
            *io, qkv_scr, o_scr, s_scr, qp, kp, sp = refs
            ablated_kernel(*io, qkv_scr, o_scr, heads=heads, n_valid=n,
                           scale=hd ** -0.5, scores_scr=s_scr,
                           qp_scr=qp, kp_scr=kp, sp_scr=sp, **abl)
    elif abl.get("hoist_softmax"):
        scratch.append(pltpu.VMEM((heads * tile, npad, npad), jnp.float32))

        def kern(*refs):
            *io, qkv_scr, o_scr, s_scr = refs
            ablated_kernel(*io, qkv_scr, o_scr, heads=heads, n_valid=n,
                           scale=hd ** -0.5, scores_scr=s_scr, **abl)
    else:
        def kern(*refs):
            ablated_kernel(*refs, heads=heads, n_valid=n, scale=hd ** -0.5,
                           **abl)

    mb_spec = pl.BlockSpec(mb.shape, lambda i, nd=mb.ndim: (0,) * nd,
                           memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r, npad, c), dtype),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            mb_spec,
        ] + [full(a) for a in wl],
        out_specs=pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=jax.devices()[0].platform not in ("tpu", "axon"),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
            if vmem_mb else None),
    )

    @jax.jit
    def step(x, carry):
        y = fn(x + (carry * 0).astype(x.dtype), mb, *wl)
        return y, y[0, 0, 0].astype(jnp.float32)

    return step, x, tile


ABLATIONS = {
    "full": {},
    "scr3d": {"scr3d": True},
    "hoist": {"hoist_softmax": True},
    "headbatch": {"scr3d": True, "head_batch": True},
    "pack2": {"scr3d": True, "pack": 2},
    "pack4": {"scr3d": True, "pack": 4},
    "pack8": {"scr3d": True, "pack": 8},
    "no_softmax": {"do_softmax": False},
    "no_scores": {"do_scores": False, "do_softmax": False},
    "no_attnmm": {"do_scores": False, "do_softmax": False, "do_pv": False},
    "attn_only": {"do_mlp": False},
    "mlp_only": {"do_ln1": False, "do_qkv": False, "do_scores": False,
                 "do_softmax": False, "do_pv": False, "do_proj": False},
    "no_ln1": {"do_ln1": False},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="stage2v3")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--ablations", default=",".join(ABLATIONS))
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (interpret mode) for sanity")
    p.add_argument("--tile", type=int, default=0,
                   help="override the _choose_tile result (0 = auto)")
    p.add_argument("--tiles", default="",
                   help="interleaved tile sweep: build ONE ablation (the first "
                        "in --ablations) at each of these tiles")
    p.add_argument("--vmem_mb", type=int, default=0,
                   help="raise the Mosaic scoped-VMEM limit (0 = default 16MB)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    r, n, c, heads, mlp_ratio, p_w = SHAPES[args.shape]
    m = c * mlp_ratio
    flops = r * (8 * n * c * c + 4 * n * n * c + 4 * n * c * m)

    progs = {}
    if args.tiles:
        abl_name = args.ablations.split(",")[0]
        variants = [(f"{abl_name}@t{t}", int(t), ABLATIONS[abl_name])
                    for t in args.tiles.split(",")]
    else:
        variants = [(name, args.tile, ABLATIONS[name])
                    for name in args.ablations.split(",")]
    for name, tov, abl in variants:
        step, x, tile = build(r, n, c, heads, mlp_ratio, p_w,
                              tile_override=tov or None,
                              vmem_mb=args.vmem_mb, **abl)
        t0 = time.time()
        _, carry = step(x, jnp.float32(0))
        float(carry)
        print(f"[compile] {name} (tile {tile}): {time.time() - t0:.0f}s",
              flush=True)
        progs[name] = (step, x)

    def chain(name, iters):
        step, x = progs[name]
        carry = jnp.float32(0)
        _, carry = step(x, carry)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            _, carry = step(x, carry)
        float(carry)
        return time.perf_counter() - t0

    names = list(progs)
    for nm in names:
        chain(nm, 2)
    times = {nm: [] for nm in names}
    for _ in range(args.rounds):
        for nm in names:
            # slope between short and long chain cancels the fetch round-trip
            t_short = chain(nm, 2)
            t_long = chain(nm, 2 + args.iters)
            times[nm].append((t_long - t_short) / args.iters)
    print(f"\n{args.shape}: r={r} n={n} c={c} heads={heads} "
          f"full-flops {flops / 1e9:.1f} GF")
    for nm in names:
        us = np.median(times[nm]) * 1e6
        mfu = flops / (np.median(times[nm])) / 197e12 * 100
        print(f"  {nm:11s}: {us:8.1f} us/call"
              f"   ({mfu:5.1f}% MFU at full-flops count)")


if __name__ == "__main__":
    main()
