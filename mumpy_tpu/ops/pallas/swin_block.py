"""Fused whole-Swin-block Pallas kernel (TPU).

Honest profiling on a v5e chip showed the encoder is kernel-overhead bound, not
FLOP bound: each Swin block lowers to ~13 XLA kernels of ~30us fixed cost on
sub-megabyte tensors (0.37 ms/block at stage 2, 7% MFU overall).  This kernel
executes the ENTIRE block

    x = x + proj(window_attention(LN1(x)))
    x = x + fc2(gelu(fc1(LN2(x))))

in one launch, with the block's weights resident in VMEM and activations never
leaving the chip.

Mosaic layout constraints shape the design: lane dims of VMEM *values* cannot
be split or sliced freely, but lane-sliced REF loads/stores are fine — so qkv
and the output projection run as FULL-WIDTH matmuls (per-head hd=32 splits
used a quarter of the MXU lanes) through a VMEM scratch, and the per-head
attention loop reads q/k/v lane slices from that scratch and writes its output
slice into a second scratch that feeds the projection.  GELU uses a polynomial
erf (Mosaic lowers neither erf nor erfc).

Restrictions (checked by :func:`supported`): inference/forward only (training
keeps the XLA implementation); weight footprint must fit VMEM (C <= 512 at
mlp_ratio 4); N <= 64 tokens per window.
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

_FORCED_MODE = None  # test hook: None (auto) | "off" | "interpret" | "compiled"

# Real VMEM capacity: scripts/vmem_probe.py measured 128MB usable on the v5e
# chip — the ubiquitous "~16MB" figure is only Mosaic's DEFAULT scoped-vmem
# limit, raisable per kernel via CompilerParams(vmem_limit_bytes).  We budget
# kernels against 100MB (headroom for Mosaic's conservative stack liveness);
# override with MUMPY_VMEM_LIMIT_MB for other TPU generations.
def vmem_limit_bytes() -> int:
    import os

    return int(os.environ.get("MUMPY_VMEM_LIMIT_MB", "100")) << 20


def kernel_compiler_params():
    """CompilerParams raising the Mosaic scoped-VMEM cap to the real capacity."""
    if not _PALLAS_OK:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes())


def set_mode(mode):
    global _FORCED_MODE
    _FORCED_MODE = mode


def softmax_form() -> str:
    """Inference whole-block attention softmax form, trace-time.

    "perhead" (default): per-head softmax inside the attention loop — faster
    on the round-4 runtime (stage2v3 706 vs 767 us, stage2v12 542 vs 636;
    PERF.md "attention-layout probe").  "hoist": round 2's all-head hoisted
    softmax, which won on THAT runtime (857 -> 673 us) — kept for per-runtime
    re-A/B via MUMPY_SOFTMAX_FORM=hoist (ab_bench token ``hoistsm``)."""
    import os

    return ("hoist" if os.environ.get("MUMPY_SOFTMAX_FORM", "").strip()
            == "hoist" else "perhead")


def attention_mode() -> str:
    """Dispatch mode for the fused block: "compiled" on TPU by default (it
    measured 2.3x faster than the XLA per-op path), "interpret" for CPU tests,
    "off" to force pure XLA (env MUMPY_FUSED_BLOCK)."""
    if _FORCED_MODE is not None:
        return _FORCED_MODE
    import os

    env = os.environ.get("MUMPY_FUSED_BLOCK", "auto")
    if env in ("0", "off"):
        return "off"
    if env == "interpret":
        return "interpret"
    if not _PALLAS_OK:
        return "off"
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return "off"
    return "compiled" if platform in ("tpu", "axon") else "off"


def supported(c: int, mlp_hidden: int, n: int, itemsize: int = 2) -> bool:
    """Weight + activation footprint check against the real VMEM capacity
    (128MB on v5e — see :func:`vmem_limit_bytes`; the C=768 global-ViT weight
    set at 14.2MB bf16 is comfortably resident).

    ``itemsize`` is the parameter dtype size — f32 serving doubles the resident
    weight footprint, so the gate must use the real dtype, not assume bf16."""
    if not _PALLAS_OK:
        return False
    weights = itemsize * (4 * c * c + 2 * c * mlp_hidden)  # qkv+proj+mlp
    return weights < 0.45 * vmem_limit_bytes() and n <= 64


def _erf(x):
    """Polynomial erf (Abramowitz-Stegun 7.1.26, |err| < 1.5e-7): Mosaic lowers
    neither erf nor erfc, and 1.5e-7 is far below bf16 resolution."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ln(x32, scale, bias, eps=1e-5):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _hoisted_scores(qkv_scr, mb_ref, s_scr, *, heads, n_valid, scale,
                    q_off=0, k_off=None):
    """All-head masked attention probabilities via ONE softmax.

    Writes per-head ``q @ k^T * scale + mb`` into the (heads*tile, npad, npad)
    f32 scratch ``s_scr``, then runs a single softmax over it in place.
    Per-head softmaxes are pure VPU-dispatch overhead — hoisting them measured
    -22% whole-kernel time at the stage-2 view3 shape (scripts/kernel_probe.py:
    857 -> 673 us; "no_softmax" is 670).  Key-pad masking rides in ``mb``
    (columns >= n are pre-filled with -1e30; ``n_valid`` is kept only for
    signature stability).  Callers read head ``h``'s probabilities as
    ``s_scr[h*tile:(h+1)*tile]``.
    """
    del n_valid
    tile, npad, three_c = qkv_scr.shape
    c = three_c // 3 if k_off is None else three_c  # packed qkv vs separate
    if k_off is None:
        k_off = c
    hd = c // heads
    for h in range(heads):
        q3 = qkv_scr[:, :, q_off + h * hd:q_off + (h + 1) * hd]
        k3 = qkv_scr[:, :, k_off + h * hd:k_off + (h + 1) * hd]
        s_scr[h * tile:(h + 1) * tile] = jax.lax.dot_general(
            q3, k3, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale + mb_ref[h].astype(jnp.float32)
    # no masked-where pass here: ``mb`` arrives with its key-PAD columns
    # pre-filled with -1e30 (see the three mb pad sites), so the additive term
    # already masks them — exp(-1e30 - m) is exactly 0.  The where was a full
    # extra read+write over the (heads*tile, npad, npad) scratch (~130us/call
    # at the stage-0 view3 shape, kernel_probe).
    sall = s_scr[:]
    m = jnp.max(sall, axis=-1, keepdims=True)
    e = jnp.exp(sall - m)
    s_scr[:] = e / jnp.sum(e, axis=-1, keepdims=True)


def _scores_scratch_bytes(heads: int, npad: int, form: str) -> int:
    """Per-window bytes of the all-head f32 scores scratch — only the hoisted
    softmax form allocates it (ADVICE r4: the perhead default must not budget
    VMEM for, or allocate, a scratch it never reads)."""
    return heads * npad * npad * 4 if form == "hoist" else 0


def _block_kernel(
    x_ref, mb_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    out_ref, qkv_scr, o_scr, s_scr=None,
    *, heads, n_valid, scale, form="perhead",
):
    tile, npad, c = x_ref.shape
    hd = c // heads
    x = x_ref[:]
    dtype = x.dtype

    # ---- attention branch ----
    # qkv and the output projection run FULL-WIDTH (the flop-dominant matmuls;
    # per-head hd=32 variants used only a quarter of the MXU lanes).  The
    # scratches are kept 3D (tile, npad, ·) so each per-head q/k/v access is a
    # pure lane-sliced REF load — the earlier 2D (tile*npad, ·) layout needed a
    # sublane-splitting value reshape per head per q/k/v (3*heads per grid
    # step), worth ~9% of the kernel at the stage-2 view3 shape
    # (scripts/kernel_probe.py: 873.8 -> 791.3 us/call).
    h1 = _ln(
        x.astype(jnp.float32), ln1s_ref[:].astype(jnp.float32),
        ln1b_ref[:].astype(jnp.float32),
    ).astype(dtype)
    h2d = h1.reshape(tile * npad, c)
    qkv_scr[:] = (jax.lax.dot_general(
        h2d, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:].astype(jnp.float32)).astype(dtype).reshape(tile, npad, 3 * c)

    # Softmax layout is RUNTIME-SENSITIVE (PERF.md "attention-layout probe"):
    # round 2's hoisted all-head softmax (one (heads*tile, npad, npad) f32
    # scratch, one softmax — then 857 -> 673 us at stage2v3) measured SLOWER
    # than the plain per-head form on the round-4 runtime (767 vs 706 us).
    # Both forms stay implemented; `softmax_form()` picks at trace time
    # (MUMPY_SOFTMAX_FORM=hoist reverts).  Masking rides in mb either way
    # (key-pad columns pre-filled with -1e30; no masked-where pass).
    if form == "perhead":
        for h in range(heads):
            q3 = qkv_scr[:, :, h * hd:(h + 1) * hd]
            k3 = qkv_scr[:, :, c + h * hd:c + (h + 1) * hd]
            v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            scores = jax.lax.dot_general(
                q3, k3, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale + mb_ref[h].astype(jnp.float32)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
            o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                p, v3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
    else:
        _hoisted_scores(qkv_scr, mb_ref, s_scr, heads=heads, n_valid=n_valid,
                        scale=scale)
        for h in range(heads):
            v3 = qkv_scr[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
            p = s_scr[h * tile:(h + 1) * tile].astype(dtype)
            o_scr[:, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                p, v3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
    proj = jax.lax.dot_general(
        o_scr[:].reshape(tile * npad, c), wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:].astype(jnp.float32)
    x = x + proj.astype(dtype).reshape(tile, npad, c)

    # ---- MLP branch ----
    # chunked over windows: the (rows, 4C) f32 fc1/gelu temporaries are the
    # kernel's largest live values — chunk to ~2MB (larger chunks give the
    # MXU taller M on the full-width fc matmuls)
    wc = max(1, min(tile, 2_000_000 // (npad * wfc1_ref.shape[1] * 4)))
    for j in range(0, tile, wc):
        cc = min(wc, tile - j)  # odd tiles leave a 1-window remainder
        xs = x[j : j + cc]
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
        out_ref[j : j + cc] = xs + f2.astype(dtype).reshape(cc, npad, c)


def _pick_tile(r: int, p_w: int, target: int = 8):
    """Legacy fixed-target tile chooser (kept for the standalone attention
    kernel): divisor-or-multiple of the mask period."""
    if p_w <= target:
        tile = p_w * max(1, target // p_w)
        while r % tile != 0:
            tile -= p_w
        return tile, tile // p_w, 1
    tile = next(t for t in range(target, 0, -1) if p_w % t == 0)
    return tile, 1, p_w // tile


def _choose_tile(r: int, p_w: int, npad: int, c: int, heads: int,
                 itemsize: int, n_act_bufs: int = 2, extra_weight_bytes: int = 0,
                 per_buf_cap: int = 786_432, scratch_bytes_per_window: int = 0,
                 multiple_of: int = 1):
    """Windows per grid step, VMEM-aware.

    The v5e probe showed per-step fixed cost dominates at small tiles (tile 8 on
    (392, 3, 768) rows: 2.6ms vs 1.2ms at tile 56; tile 8 on 1536 stage-0 cross
    windows: 8.0ms vs 4.4ms at tile 32) while oversized tiles regress again
    (tile 96 at stage 0: 6.2ms) — so: the LARGEST tile that (a) divides r,
    (b) is a divisor-or-multiple of the mask period ``p_w``, (c) keeps each
    pipelined activation buffer <= ~0.75MB, and (d) keeps the double-buffered
    activations + per-window mask + resident weights under ~12MB of VMEM.

    Returns (tile, reps, parts) like :func:`_pick_tile`.
    """
    import os

    cap_env = os.environ.get("MUMPY_PER_BUF_CAP_KB")
    if cap_env:
        per_buf_cap = int(cap_env) * 1024
    bpw_act = npad * c * itemsize
    mask_bpw = heads * npad * npad * itemsize if p_w > 1 else 0
    weight_bytes = itemsize * 4 * c * c + extra_weight_bytes  # qkv+proj (+ MLP)
    # Budget against the REAL VMEM capacity (128MB on v5e, raised per kernel
    # via CompilerParams — see vmem_limit_bytes()).  Resident weights subtract
    # from it; the per-buffer cap below still bounds the activation tiles (a
    # real-chip tile sweep at stage2v3 showed tiles beyond it win nothing:
    # t12/t48/t96 -> 803/796/908 us).
    budget = int(0.9 * vmem_limit_bytes()) - weight_bytes
    best = fallback = None
    for t in range(1, r + 1):
        if r % t or not (t % p_w == 0 or p_w % t == 0):
            continue
        # Mosaic block shapes: second-minor dims must be 8-multiples or the
        # full array dim (needed by kernels with (…, tile, lane) operands)
        if t % multiple_of and t != r:
            continue
        if fallback is None:
            # smallest valid tile: accepted as fallback only if a LOOSE bound
            # (double-buffered activations + scratch, no safety factor) fits —
            # the strict estimate below is deliberately conservative and known
            # to reject small tiles that compile fine, while a multiple_of
            # constraint forcing tile == r on a big r must error clearly at
            # trace time instead of failing later inside Mosaic.
            loose = (2 * (n_act_bufs * t * bpw_act + t * mask_bpw)
                     + t * scratch_bytes_per_window)
            if weight_bytes < 0.9 * vmem_limit_bytes() and loose <= budget:
                fallback = t
        per_buf = t * bpw_act
        # resident weights are a FIXED cost (fetched once, constant block
        # index); only the per-tile terms scale with t.  Mosaic's stack
        # allocator is conservative about temporary liveness (a 12.4MB naive
        # estimate compiled to a 16.9MB stack), hence the 1.5x safety factor
        # on the variable terms against what the weights leave free.
        variable = (
            2 * (n_act_bufs * t * bpw_act + t * mask_bpw)
            + t * scratch_bytes_per_window
            + 3 * t * npad * c * 4  # f32 temporaries (LN out / scores / gelu)
        )
        if per_buf <= per_buf_cap and 1.5 * variable <= budget:
            best = t
    best = best if best is not None else fallback
    if best is None:
        raise ValueError(
            f"no VMEM-feasible kernel tile: r={r}, p_w={p_w}, npad={npad}, "
            f"c={c}, multiple_of={multiple_of}, weight_bytes={weight_bytes} "
            "— run this shape on the XLA path (MUMPY_FUSED_BLOCK=off)"
        )
    return best, max(1, best // p_w), max(1, p_w // best)


def prepare_weights(weights, mask_bias, *, heads: int, r: int,
                    form: str = None):
    """Build the kernel-ready operand dict: per-head weight splits, reshaped
    biases, and the padded/tiled/transposed additive term.

    This is pure layout work on parameters — executed on-device it costs ~10
    kernel launches per block per forward, so serving captures the result once
    (see ``SwinBlock._fused_call``'s "prepared" collection).
    """
    c = weights["qkv_kernel"].shape[0]
    hd = c // heads
    n = mask_bias.shape[-1]
    npad = -(-n // 8) * 8
    p_w = mask_bias.shape[0]
    wdtype = weights["qkv_kernel"].dtype
    m = weights["fc1_kernel"].shape[1]
    _, reps, _ = _choose_tile(
        r, p_w, npad, c, heads, wdtype.itemsize,
        extra_weight_bytes=2 * c * m * wdtype.itemsize,
        scratch_bytes_per_window=(npad * 4 * c * wdtype.itemsize
                                  + _scores_scratch_bytes(
                                      heads, npad, form or softmax_form())),
    )

    # store the additive term in the weight dtype: the XLA path adds the mask in
    # the activation dtype too, and halving it doubles the tile the VMEM budget
    # admits for shifted blocks (the kernel still accumulates scores in f32)
    mb = mask_bias.astype(wdtype)
    # key-PAD columns carry -1e30 so the additive term doubles as the pad
    # mask — _hoisted_scores then needs no masked-where pass (a full extra
    # read+write over the scores scratch).  Pad QUERY rows stay 0 (their
    # softmax output is garbage confined to pad rows and sliced off).
    mb = jnp.pad(mb, ((0, 0), (0, 0), (0, npad - n), (0, 0)))
    mb = jnp.pad(mb, ((0, 0), (0, 0), (0, 0), (0, npad - n)),
                 constant_values=-1e30)
    # p_w == 1 (unshifted): keep one row and let the kernel broadcast — the
    # result is then independent of the serving batch size
    if p_w > 1 and reps > 1:
        mb = jnp.tile(mb, (reps, 1, 1, 1))
    mb = mb.transpose(1, 0, 2, 3)  # (H, tile_w or 1, npad, npad)

    w = weights
    # qkv stays FULL-WIDTH (C, 3C) — torch/our-flax column order is (3, H, hd),
    # so per-head lane slices inside the kernel are at offsets i*C + h*hd
    return {
        "mb": mb,
        "ln1s": w["ln1_scale"].reshape(1, c), "ln1b": w["ln1_bias"].reshape(1, c),
        "wqkv": w["qkv_kernel"], "bqkv": w["qkv_bias"].reshape(1, 3 * c),
        "wproj": w["proj_kernel"],
        "bproj": w["proj_bias"].reshape(1, c),
        "ln2s": w["ln2_scale"].reshape(1, c), "ln2b": w["ln2_bias"].reshape(1, c),
        "wfc1": w["fc1_kernel"], "bfc1": w["fc1_bias"].reshape(1, -1),
        "wfc2": w["fc2_kernel"], "bfc2": w["fc2_bias"].reshape(1, c),
    }


_WL_ORDER = ("ln1s", "ln1b", "wqkv", "bqkv",
             "wproj", "bproj", "ln2s", "ln2b", "wfc1", "bfc1", "wfc2", "bfc2")


@functools.partial(jax.jit,
                   static_argnames=("heads", "n", "p_w", "interpret", "form"))
def fused_swin_block_prepared(x, prepared, *, heads: int, n: int, p_w: int,
                              interpret: bool = False, form: str = None):
    """Run one full Swin block on partitioned windows with pre-built operands.

    x: (R, N, C) window tokens (R = batch * windows, window-major within batch),
    or (R, NPAD, C) already sublane-padded (a padded scan carry — rows past
    ``n`` are ignored garbage and the pad/slice pair here is skipped; the
    output keeps the padded layout in that case).
    prepared: output of :func:`prepare_weights` (``p_w`` is the original mask
        period in windows).  Returns (R, N, C) (or (R, NPAD, C) if padded in).
    """
    r, rows_in, c = x.shape
    hd = c // heads
    scale = hd**-0.5
    npad = -(-n // 8) * 8
    wdtype = prepared["wqkv"].dtype
    # ``form`` is a STATIC arg so the jit cache distinguishes the two layouts;
    # None defers to the env gate at trace time (direct callers should pass
    # softmax_form() explicitly — see models/swin.py)
    form = form or softmax_form()
    tile, _, _ = _choose_tile(
        r, p_w, npad, c, heads, wdtype.itemsize,
        extra_weight_bytes=2 * c * prepared["wfc1"].shape[1] * wdtype.itemsize,
        scratch_bytes_per_window=(npad * 4 * c * wdtype.itemsize
                                  + _scores_scratch_bytes(heads, npad, form)),
    )
    mbw = prepared["mb"].shape[1]
    if mbw == 1:
        mb_block, mb_index = 1, (lambda i: (0, 0, 0, 0))
    else:
        if mbw % tile != 0:
            # ValueError, not assert: a mismatched prepared batch would read
            # wrong mask rows, and asserts are stripped under python -O.
            raise ValueError(
                f"prepared mask tiled for a different batch (mb rows {mbw}, "
                f"tile {tile}): re-run prepare_for_inference at this batch size")
        nb = mbw // tile
        mb_block, mb_index = tile, (lambda i, nb=nb: (0, i % nb, 0, 0))

    if rows_in == npad:
        xp = x
    elif rows_in == n:
        xp = jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))
    else:
        raise ValueError(
            f"window rows {rows_in} match neither n={n} nor npad={npad}")
    wl = [prepared[k] for k in _WL_ORDER]
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, nd=a.ndim: (0,) * nd, memory_space=pltpu.VMEM)

    m = prepared["wfc1"].shape[1]
    flops = r * (8 * n * c * c + 4 * n * n * c + 4 * n * c * m)
    weight_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in wl)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=2 * r * npad * c * x.dtype.itemsize
        + (r // tile) * weight_bytes,
        transcendentals=r * n * m,
    )

    scratch_shapes = [
        pltpu.VMEM((tile, npad, 3 * c), x.dtype),  # qkv
        pltpu.VMEM((tile, npad, c), x.dtype),      # per-head attn outputs
    ]
    if form == "hoist":  # all-head scores/probs scratch — hoist form only
        scratch_shapes.append(
            pltpu.VMEM((heads * tile, npad, npad), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_block_kernel, heads=heads, n_valid=n, scale=scale,
                          form=form),
        out_shape=jax.ShapeDtypeStruct((r, npad, c), x.dtype),
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (heads, mb_block, npad, npad), mb_index, memory_space=pltpu.VMEM,
            ),
        ] + [full(a) for a in wl],
        out_specs=pl.BlockSpec((tile, npad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        interpret=interpret,
        compiler_params=kernel_compiler_params(),
    )(xp, prepared["mb"], *wl)
    return out if rows_in == npad else out[:, :n, :]


def fused_swin_block(x, mask_bias, weights, *, heads: int,
                     interpret: bool = False, form: str = None):
    """Convenience entry: prepare operands inline, then run the kernel.

    x: (R, N, C) window tokens; mask_bias: (P, H, N, N) additive term with
    period P in windows; weights: dict with ln1/ln2 (scale, bias), qkv
    (C,3C)+(3C,), proj (C,C)+(C,), fc1 (C,M)+(M,), fc2 (M,C)+(C,).
    """
    prepared = prepare_weights(weights, mask_bias, heads=heads, r=x.shape[0],
                               form=form)
    return fused_swin_block_prepared(
        x, prepared, heads=heads, n=x.shape[1], p_w=mask_bias.shape[0],
        interpret=interpret, form=form,
    )
