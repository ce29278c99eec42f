"""Fused whole-PAIR Swin kernel: (shifted block + plain block) in ONE launch.

The scanned deep-stage pairs (``encoder.py:PlainBlockPair`` — the hot loop the
reference runs at ``swinTransformer.py:142-163``) execute per scan step, on the
window-domain carry:

    gather(unshifted->shifted) -> block kernel -> gather(back) -> block kernel

i.e. two full HBM round-trips of the activation slab for the layout changes
plus one more between the kernels.  This kernel fuses the entire pair: the
input block is the T-image slab ``(T, nwh, nww, npad, C)`` (windows of a whole
image resident in VMEM), the shifted layout is REASSEMBLED IN VMEM with static
slice copies (a 2D roll by ``shift`` decomposes per token-row into <= 8 region
copies with static wraparound splits — no gather, no DMA index math), and both
blocks' LN/QKV/attention/proj/MLP run back to back with both weight sets
resident.  HBM traffic per pair drops from ~4 slab round-trips to one.

Only stage-2 shapes have pairs in the published model (14x14 or 42x14 token
grids, window 7, shift 3 -> 2x2 / 6x2 window grids), so slabs are small
(<= 0.7 MB) and whole-image residency is cheap.

Measured (round 5, interleaved ab_bench at batch 32 — see PERF.md): per-block
99.88 ms/step vs whole-pair 96.15 = **+3.7% end-to-end** (320.3 -> 332.3
f/s), the first end-to-end serving move since round 2; chip_parity PASS with
the kernel on (f32 1.55e-2 vs XLA, at the shared MXU noise floor).  Default
ON; ``MUMPY_PAIR_FUSION=0`` / ab_bench token ``pairfuse`` for per-runtime
re-A/B.  Mosaic compile is slow cold (~18 min — the unrolled reassembly
copies) and cached thereafter.

Restrictions (``pair_supported``): inference only; unpadded window carry
(rows == window^2); both blocks' weights + one slab tile must fit VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .swin_block import (_erf, _ln, kernel_compiler_params, vmem_limit_bytes)


def pair_fusion_enabled() -> bool:
    """Trace-time gate (default ON — +3.7% end-to-end, see module docstring);
    MUMPY_PAIR_FUSION=0 reverts (ab_bench token ``pairfuse`` toggles)."""
    import os

    return os.environ.get("MUMPY_PAIR_FUSION", "1") not in ("0", "off", "")


def pair_supported(c: int, mlp_hidden: int, n: int, nw: int,
                   itemsize: int = 2) -> bool:
    """Both blocks' weights resident + at least a one-image slab tile."""
    if not _PALLAS_OK:
        return False
    weights = 2 * itemsize * (4 * c * c + 2 * c * mlp_hidden)
    npad = -(-n // 8) * 8
    slab = nw * npad * c * itemsize
    # ~7 slab-sized live buffers per image tile (in/out double-buffered,
    # sh/un scratch, attn out) + qkv (3 slabs) + f32 temporaries
    return (weights + 12 * slab < 0.5 * vmem_limit_bytes()) and n <= 64


def _roll_splits(k: int, n: int):
    """Static copy splits implementing ``dst[i] = src[(i + k) % n]`` on a
    leading dim: list of (dst_lo, dst_hi, src_lo)."""
    k %= n
    if k == 0:
        return [(0, n, 0)]
    return [(0, n - k, k), (n - k, n, 0)]


def _emit_shift_copies(dst, src, *, w: int, s: int, nwh: int, nww: int,
                       forward: bool):
    """Copy ``src`` (slab ref/scratch (T, nwh, nww, npad, c)) into ``dst``
    in the rolled-window layout.

    forward=True: unshifted -> shifted (layout of ``partition(roll(img, -s))``,
    matching ``ops/window.py:img_to_window_perm``); False: the inverse.  All
    indices are static; wraparound over window rows/cols becomes the
    ``_roll_splits`` region copies.  Token rows >= w^2 (sublane pad) are never
    read or written — pad-row garbage stays in pad rows.
    """
    for r in range(w):  # dst token-row
        if forward:
            src_tr, ki = (r + s) % w, (r + s) // w
            parts = [((0, w - s), (s, w), 0), ((w - s, w), (0, s), 1)]
        else:
            src_tr, ki = (r - s) % w, 0 if r >= s else -1
            parts = [((0, s), (w - s, w), -1), ((s, w), (0, w - s), 0)]
        for (d0, d1), (c0, c1), kj in parts:
            if d1 <= d0:
                continue
            for di0, di1, si0 in _roll_splits(ki, nwh):
                for dj0, dj1, sj0 in _roll_splits(kj, nww):
                    dst[:, di0:di1, dj0:dj1, r * w + d0:r * w + d1, :] = (
                        src[:, si0:si0 + (di1 - di0), sj0:sj0 + (dj1 - dj0),
                            src_tr * w + c0:src_tr * w + c1, :])


def _block_math(x, wrefs, mb_ref, qkv_scr, o_scr, write_out, *,
                heads: int, scale: float, t: int, nw: int):
    """One full Swin block on the value ``x`` of shape (R=t*nw, npad, c).

    ``wrefs``: 12 weight refs in _W_ORDER; ``mb_ref``: (heads, P, npad, npad)
    additive term, P in {1, nw} (key-pad columns pre-filled with -1e30 — see
    swin_block.prepare_weights).  The result rows are handed to ``write_out``
    as (image_lo, image_hi, value (cc, nw, npad, c)) slab chunks.  Per-head
    softmax form only (the simpler layout; faster on the current runtime —
    PERF.md "attention-layout probe").
    """
    (ln1s, ln1b, wqkv, bqkv, wproj, bproj,
     ln2s, ln2b, wfc1, bfc1, wfc2, bfc2) = wrefs
    rows, npad, c = x.shape
    hd = c // heads
    dtype = x.dtype
    mb_p = mb_ref.shape[1]

    h1 = _ln(
        x.astype(jnp.float32), ln1s[:].astype(jnp.float32),
        ln1b[:].astype(jnp.float32),
    ).astype(dtype)
    qkv_scr[:] = (jax.lax.dot_general(
        h1.reshape(rows * npad, c), wqkv[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv[:].astype(jnp.float32)).astype(dtype).reshape(rows, npad, 3 * c)

    for h in range(heads):
        q3 = qkv_scr[:, :, h * hd:(h + 1) * hd]
        k3 = qkv_scr[:, :, c + h * hd:c + (h + 1) * hd]
        v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        scores = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        mb_h = mb_ref[h].astype(jnp.float32)  # (P, npad, npad)
        if mb_p == 1:
            scores = scores + mb_h  # broadcast over all rows
        else:
            # per-window-position mask: (t*nw, n, n) + (nw, n, n) via a free
            # leading-dim split/merge
            scores = (scores.reshape(t, nw, npad, npad) + mb_h[None]
                      ).reshape(rows, npad, npad)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p, v3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)

    proj = jax.lax.dot_general(
        o_scr[:].reshape(rows * npad, c), wproj[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj[:].astype(jnp.float32)
    x = x + proj.astype(dtype).reshape(rows, npad, c)

    # MLP, chunked over whole images so output writes are slab slices
    m_dim = wfc1.shape[1]
    wc = max(1, 2_000_000 // (nw * npad * m_dim * 4))
    for j in range(0, t, wc):
        cc = min(wc, t - j)
        xs = x[j * nw:(j + cc) * nw]
        h2 = _ln(
            xs.astype(jnp.float32), ln2s[:].astype(jnp.float32),
            ln2b[:].astype(jnp.float32),
        ).astype(dtype).reshape(cc * nw * npad, c)
        f1 = jax.lax.dot_general(
            h2, wfc1[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc1[:].astype(jnp.float32)
        g = (0.5 * f1 * (1.0 + _erf(f1 * 0.7071067811865476))).astype(dtype)
        f2 = jax.lax.dot_general(
            g, wfc2[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc2[:].astype(jnp.float32)
        out = xs + f2.astype(dtype).reshape(cc * nw, npad, c)
        write_out(j, j + cc, out)


def _pair_kernel(x_ref, mbs_ref, mbp_ref, *wrefs_and_out,
                 heads, scale, w, s, nwh, nww):
    wa = wrefs_and_out[:12]
    wb = wrefs_and_out[12:24]
    out_ref, sh_scr, un_scr, qkv_scr, o_scr = wrefs_and_out[24:]
    t, _, _, npad, c = x_ref.shape
    nw = nwh * nww
    n = w * w

    def zero_pad_rows(scr):
        # sublane-pad token rows must be ZERO before entering a block: pad
        # KEYS rely on the -1e30 mask columns only when their k-vectors are
        # finite (scratch memory is otherwise uninitialized)
        if npad != n:
            scr[:, :, :, n:npad, :] = jnp.zeros(
                (t, nwh, nww, npad - n, c), scr.dtype)

    # 1. shifted layout into sh_scr (static region copies, wrap included)
    _emit_shift_copies(sh_scr, x_ref, w=w, s=s, nwh=nwh, nww=nww, forward=True)
    zero_pad_rows(sh_scr)

    # 2. shifted block; result written back into sh_scr slab chunks
    def write_a(lo, hi, val):
        sh_scr[lo:hi] = val.reshape(hi - lo, nwh, nww, npad, c)

    _block_math(sh_scr[:].reshape(t * nw, npad, c), wa, mbs_ref,
                qkv_scr, o_scr, write_a, heads=heads, scale=scale, t=t, nw=nw)

    # 3. back to unshifted layout
    _emit_shift_copies(un_scr, sh_scr, w=w, s=s, nwh=nwh, nww=nww,
                       forward=False)
    zero_pad_rows(un_scr)

    # 4. plain block; result goes straight to the output block
    def write_b(lo, hi, val):
        out_ref[lo:hi] = val.reshape(hi - lo, nwh, nww, npad, c)

    _block_math(un_scr[:].reshape(t * nw, npad, c), wb, mbp_ref,
                qkv_scr, o_scr, write_b, heads=heads, scale=scale, t=t, nw=nw)


_W_ORDER = ("ln1s", "ln1b", "wqkv", "bqkv", "wproj", "bproj",
            "ln2s", "ln2b", "wfc1", "bfc1", "wfc2", "bfc2")


def _pad_mb(mb, npad):
    """(P, H, n, n) additive term -> (H, P, npad, npad) with -1e30 key-pad
    columns (the in-bias masking convention of swin_block.prepare_weights)."""
    n = mb.shape[-1]
    mb = jnp.pad(mb, ((0, 0), (0, 0), (0, npad - n), (0, 0)))
    mb = jnp.pad(mb, ((0, 0), (0, 0), (0, 0), (0, npad - n)),
                 constant_values=-1e30)
    return mb.transpose(1, 0, 2, 3)


def prepare_pair(weights_a, weights_b, mb_shifted, mb_plain, *, wdtype):
    """Kernel-ready operand dict: padded/transposed additive terms in the
    weight dtype plus both blocks' weights under a/b key prefixes."""
    n = mb_shifted.shape[-1]
    npad = -(-n // 8) * 8
    out = {"mbs": _pad_mb(mb_shifted.astype(wdtype), npad),
           "mbp": _pad_mb(mb_plain.astype(wdtype), npad)}
    for tag, wdict in (("a", weights_a), ("b", weights_b)):
        out[f"{tag}_ln1s"] = wdict["ln1_scale"].reshape(1, -1)
        out[f"{tag}_ln1b"] = wdict["ln1_bias"].reshape(1, -1)
        out[f"{tag}_wqkv"] = wdict["qkv_kernel"]
        out[f"{tag}_bqkv"] = wdict["qkv_bias"].reshape(1, -1)
        out[f"{tag}_wproj"] = wdict["proj_kernel"]
        out[f"{tag}_bproj"] = wdict["proj_bias"].reshape(1, -1)
        out[f"{tag}_ln2s"] = wdict["ln2_scale"].reshape(1, -1)
        out[f"{tag}_ln2b"] = wdict["ln2_bias"].reshape(1, -1)
        out[f"{tag}_wfc1"] = wdict["fc1_kernel"]
        out[f"{tag}_bfc1"] = wdict["fc1_bias"].reshape(1, -1)
        out[f"{tag}_wfc2"] = wdict["fc2_kernel"]
        out[f"{tag}_bfc2"] = wdict["fc2_bias"].reshape(1, -1)
    return out


def _choose_t(b: int, nw: int, npad: int, c: int, m: int, itemsize: int):
    """Images per grid step: largest divisor of ``b`` whose buffer set fits
    the VMEM budget (same conservative 1.5x liveness factor as
    swin_block._choose_tile; weights are a fixed resident cost)."""
    weight_bytes = 2 * itemsize * (4 * c * c + 2 * c * m)
    budget = int(0.9 * vmem_limit_bytes()) - weight_bytes
    slab = nw * npad * c * itemsize
    best = None
    for t in range(1, b + 1):
        if b % t:
            continue
        variable = t * (
            2 * 2 * slab            # in/out blocks, double-buffered
            + 3 * slab              # sh/un/attn-out scratch
            + 3 * slab              # qkv scratch
            + 3 * nw * npad * c * 4  # f32 LN/scores/gelu temporaries
        )
        if 1.5 * variable <= budget:
            best = t
    if best is None:
        raise ValueError(
            f"no VMEM-feasible pair tile: b={b}, nw={nw}, npad={npad}, c={c}")
    return best


@functools.partial(jax.jit, static_argnames=(
    "heads", "w", "s", "nwh", "nww", "interpret"))
def fused_pair_prepared(x, prepared, *, heads: int, w: int, s: int,
                        nwh: int, nww: int, interpret: bool = False):
    """Run one (shifted, plain) block pair on the window-domain carry.

    x: (B*nW, n, C) unshifted window-major tokens (nW = nwh*nww windows per
    image, row-major); prepared: :func:`prepare_pair` output.  Returns the
    same layout.
    """
    r, n, c = x.shape
    assert n == w * w, (n, w)
    nw = nwh * nww
    b = r // nw
    npad = -(-n // 8) * 8
    hd = c // heads
    scale = hd**-0.5
    wdtype = prepared["a_wqkv"].dtype
    m = prepared["a_wfc1"].shape[1]
    t = _choose_t(b, nw, npad, c, m, wdtype.itemsize)

    xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0))) if npad != n else x
    xp = xp.reshape(b, nwh, nww, npad, c)
    wl = ([prepared[f"a_{k}"] for k in _W_ORDER]
          + [prepared[f"b_{k}"] for k in _W_ORDER])
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)

    flops = 2 * r * (8 * n * c * c + 4 * n * n * c + 4 * n * c * m)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=2 * r * npad * c * x.dtype.itemsize
        + sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in wl),
        transcendentals=2 * r * n * m,
    )
    out = pl.pallas_call(
        functools.partial(_pair_kernel, heads=heads, scale=scale, w=w, s=s,
                          nwh=nwh, nww=nww),
        out_shape=jax.ShapeDtypeStruct((b, nwh, nww, npad, c), x.dtype),
        grid=(b // t,),
        in_specs=[
            pl.BlockSpec((t, nwh, nww, npad, c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(prepared["mbs"]),
            full(prepared["mbp"]),
        ] + [full(a) for a in wl],
        out_specs=pl.BlockSpec((t, nwh, nww, npad, c),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t, nwh, nww, npad, c), x.dtype),   # shifted slab
            pltpu.VMEM((t, nwh, nww, npad, c), x.dtype),   # unshifted slab
            pltpu.VMEM((t * nw, npad, 3 * c), x.dtype),    # qkv
            pltpu.VMEM((t * nw, npad, c), x.dtype),        # attn out
        ],
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, prepared["mbs"], prepared["mbp"], *wl)
    out = out.reshape(r, npad, c)
    return out if npad == n else out[:, :n, :]
