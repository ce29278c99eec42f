"""Swin transformer building blocks (flax, channels-last, static shapes).

TPU-native re-design of the reference's ``models/modules/swinTransformer.py``:

* window partition/reverse are free reshapes; the (T*H, W) temporal folding of the
  reference (``swinTransformer.py:267,294-299``) is kept — window attention runs over
  the folded space-time grid.
* attention is computed batched over all windows with einsums that XLA maps onto the
  MXU; the relative-position bias is gathered once per call from a static index.
* shifted windows use ``jnp.roll`` + a precomputed additive mask
  (``swinTransformer.py:233-254`` semantics).

All LayerNorms use eps=1e-5 and GELU is the exact (erf) variant to match torch.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.window import (partition_tokens, shifted_window_mask,
                          unpartition_tokens, window_layout_perm,
                          window_layout_perm_padded,
                          window_partition, window_reverse)
from ..ops.pallas import window_attention as pallas_wa
from ..ops.pallas import swin_block as pallas_sb
from ..ops.pallas import swin_block_vjp as pallas_sbv
from ..ops.pallas import ln_mlp as pallas_lm
from ..ops.pallas import ln_mlp_vjp as pallas_lmv
from ..ops.pallas import attn_ln as pallas_al
from ..ops.pallas import vit3 as pallas_v3


def fused_mlp_tail(module, x, dim: int, mlp_ratio: float, deterministic: bool):
    """``x + Mlp(LN(x))`` through the fused LN-MLP kernel when eligible, else None.

    Shared by block tails whose attention half cannot use the whole-block kernel
    (CrossSwinBlock, VitBlock).  Eligible at inference with existing params and a
    weight set that fits VMEM; drop_path/dropout are inactive when deterministic.
    """
    if not (
        deterministic
        and pallas_sb.attention_mode() != "off"
        and module.has_variable("params", "norm2")
    ):
        return None
    v = module.variables["params"]
    w1 = v["mlp"]["fc1"]["kernel"]
    if not pallas_lm.supported(dim, int(dim * mlp_ratio), w1.dtype.itemsize):
        return None
    return pallas_lm.fused_ln_mlp(
        x, v["norm2"]["scale"], v["norm2"]["bias"],
        w1, v["mlp"]["fc1"]["bias"], v["mlp"]["fc2"]["kernel"], v["mlp"]["fc2"]["bias"],
        interpret=pallas_sb.attention_mode() == "interpret",
    )

def mlp_site_width_allowed(dim: int) -> bool:
    """Trace-time width gate for the mlp train-kernel site.

    MUMPY_MLP_SITE_WIDTHS (comma list of channel widths) restricts the site
    to specific instance widths — the bisect knob for the composed ln_mlp
    crash.  Round-5 bisect verdict (PERF.md "ln_mlp root cause"): the ONE
    faulting instance is the widest tail (c=1024, m=4096 — view-3 stage 3),
    whose compiled FORWARD Mosaic kernel kills the TPU worker when embedded
    in any real train program while being standalone-clean at the identical
    shape.  It is excluded by default in compiled mode (XLA handles that one
    tail); every other width is compiled-green inside the full flagship
    step, so the mlp site is back in the default train-site set.  Interpret
    mode (the CPU suite) keeps exercising the 1024 instance; listing 1024 in
    MUMPY_MLP_SITE_WIDTHS under compiled mode still requires
    MUMPY_ALLOW_CRASHING_KERNELS=1 — the knob for re-probing the fault on
    future runtimes."""
    import os

    widths = os.environ.get("MUMPY_MLP_SITE_WIDTHS", "").strip()
    if widths and str(dim) not in {t.strip() for t in widths.split(",")}:
        return False
    if (dim >= 1024 and pallas_sbv.train_mode() == "compiled"
            and os.environ.get("MUMPY_ALLOW_CRASHING_KERNELS") != "1"):
        return False
    return True


def fused_mlp_tail_train(module, x, dim: int, dp, drop: float):
    """``x + drop_path(Mlp(LN(x)))`` via the custom-VJP LN+MLP kernel, else None.

    Training counterpart of :func:`fused_mlp_tail` for block tails whose
    attention half cannot share the whole-block train kernel (CrossSwinBlock,
    VitBlock) — the round-2 DVI train trace showed their XLA fwd+bwd dominated
    by copy/fusion launches.  drop_path becomes per-sample keep factors (rows
    are sample-major after flattening); ``dp`` may be a traced per-depth rate
    (the scanned ViT stack passes it as a scan input).
    """
    if (module.is_initializing()
            or pallas_sbv.train_mode() == "off"
            or not pallas_sbv.train_site_enabled("mlp")
            or not module.has_variable("params", "norm2")):
        return None
    if not mlp_site_width_allowed(dim):
        return None
    v = module.variables["params"]
    w1 = v["mlp"]["fc1"]["kernel"]
    if not pallas_lmv.train_supported(dim, w1.shape[-1], w1.dtype.itemsize, drop):
        return None
    b = x.shape[0]
    tokens = x.size // (b * dim)
    if isinstance(dp, float) and dp == 0.0:
        keep_rows = jnp.ones((b * tokens, 1), jnp.float32)
    else:
        keep = 1.0 - jnp.asarray(dp, jnp.float32)
        mask_b = jax.random.bernoulli(
            module.make_rng("dropout"), keep, (b, 1)).astype(jnp.float32)
        keep_rows = jnp.repeat(mask_b / keep, tokens, axis=0)
    weights = {
        "lns": v["norm2"]["scale"][None], "lnb": v["norm2"]["bias"][None],
        "wfc1": w1, "bfc1": v["mlp"]["fc1"]["bias"][None],
        "wfc2": v["mlp"]["fc2"]["kernel"], "bfc2": v["mlp"]["fc2"]["bias"][None],
    }
    y = pallas_lmv.fused_ln_mlp_train(
        x.reshape(b * tokens, dim), weights, keep_rows,
        pallas_sbv.train_mode() == "interpret")
    return y.reshape(x.shape)


def fused_site_enabled(site: str) -> bool:
    """MUMPY_FUSED_ATTN_SITES env gate (comma list or "all"/"none").

    Default: "cross,cva,vit3" — interleaved A/B on the v5e (scripts/ab_bench.py,
    ±0.3% within run).  "vit" stays OFF even as a whole-block kernel: at batch
    32 the (B*49, 3, 768) rows measured 271.9 vs 283.9 f/s — n=3 pads to 8
    (2.7x wasted attention work) and XLA fuses the tiny attention into its
    neighbors better than an opaque custom call.  "vit3" is the SPECIALIZED
    n=3 whole-layer kernel (ops/pallas/vit3.py, time-major slabs, no pad
    waste): 100.1 -> 97.9 ms/step at batch 32 (+7 f/s).  NOTE: the gate is
    TRACE-TIME only — it is read when jit traces (or when prepared operands
    are captured); changing the env afterwards has no effect.
    """
    import os

    sites = os.environ.get("MUMPY_FUSED_ATTN_SITES", "cross,cva,vit3")
    site_set = {t.strip() for t in sites.split(",")}
    return sites != "none" and (sites == "all" or site in site_set)


def _vit_unrolled_enabled() -> bool:
    """MUMPY_VIT_UNROLLED env gate for the unrolled small-n ViT attention
    (trace-time, like the sites gate).  Default on — interleaved A/B at
    serving batch 32 measured it against the einsum path (see VitBlock)."""
    import os

    return os.environ.get("MUMPY_VIT_UNROLLED", "1") not in ("0", "off")


def fused_attn_branch(module, x, num_heads, weights_fn, mask_bias_fn, p_w,
                      deterministic, var_name="attn_prepared", site="attn"):
    """``(y, x + y)`` via the fused LN+MSA+residual kernel when eligible, else None.

    ``x`` is window-major (R, N, C); ``weights_fn()`` returns the ln/qkv/proj
    weight dict and ``mask_bias_fn()`` the (P, H, N, N) additive term — both are
    only called when kernel-ready operands are not already cached in the
    "prepared" collection (see ``SwinBlock._fused_call``).  ``site`` names the
    call site for the MUMPY_FUSED_ATTN_SITES env gate (comma list or
    "all"/"none").

    Defaults (interleaved A/B on the v5e, scripts/ab_bench.py, +-0.3%% within
    run): "cross" and "cva" are ON (+10 and +7 frames/s at batch 16 once the
    kernels compute qkv/proj FULL-WIDTH through lane-sliced scratch).  The
    "vit" site now dispatches the WHOLE VitBlock to the fused block kernel
    (see ``VitBlock``) — this branch is its fallback when the full weight set
    exceeds VMEM.
    """
    if not fused_site_enabled(site):
        return None
    if not (
        deterministic
        and pallas_sb.attention_mode() != "off"
        and module.has_variable("params", "norm1")
    ):
        return None
    r, n, c = x.shape
    leaves = jax.tree_util.tree_leaves(module.variables["params"])
    if not pallas_al.supported(c, n, leaves[0].dtype.itemsize):
        return None

    def compute():
        return pallas_al.prepare_attn_weights(
            weights_fn(), mask_bias_fn(), heads=num_heads, r=r
        )

    if module.has_variable("prepared", var_name):
        prepared = module.get_variable("prepared", var_name)
    elif module.is_mutable_collection("prepared"):
        prepared = module.variable("prepared", var_name, compute).value
    else:
        prepared = compute()
    return pallas_al.fused_attn_ln_prepared(
        x, prepared, heads=num_heads, n=n, p_w=p_w,
        interpret=pallas_sb.attention_mode() == "interpret",
    )


trunc_init = nn.initializers.truncated_normal(stddev=0.02)
gelu = functools.partial(nn.gelu, approximate=False)


def drop_path(x: jnp.ndarray, rate, deterministic: bool, rng) -> jnp.ndarray:
    """Per-sample stochastic depth (timm ``DropPath`` semantics).

    ``rate`` may be a traced scalar (blocks under ``nn.scan`` receive their
    per-depth rate as a scanned input).
    """
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    # divide in x's dtype: a traced f32 `rate` must not promote bf16 activations
    return x * (mask.astype(x.dtype) / jnp.asarray(keep, x.dtype))


@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static (wh*ww, wh*ww) index into the (2wh-1)(2ww-1) bias table
    (``swinTransformer.py:113-123``)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _rel_pos_onehot(wh: int, ww: int) -> np.ndarray:
    """Constant (wh*ww*wh*ww, (2wh-1)(2ww-1)) one-hot expansion of
    :func:`relative_position_index` (one 1 per row)."""
    idx = relative_position_index(wh, ww).reshape(-1)
    oh = np.zeros((idx.size, (2 * wh - 1) * (2 * ww - 1)), np.float32)
    oh[np.arange(idx.size), idx] = 1.0
    return oh


def rel_pos_bias(table: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """(table_size, H) bias table -> (H, n, n) additive bias, as a constant
    one-hot matmul instead of ``table[idx]``.

    The gather form's VJP is a scatter-add into the table (2401 rows colliding
    into 169) — XLA lowers TPU scatters orders of magnitude slower than a
    matmul; the one-hot matmul keeps forward AND backward on the MXU and is
    exact (each row of the one-hot has a single 1, so even bf16 accumulation
    adds one term).  ~41 training-path instances per step.
    """
    n = wh * ww
    if os.environ.get("MUMPY_RELPOS", "").strip() == "gather":
        # A/B revert knob (trace-time): the original gather/scatter form.
        # Log once so A/B runs are self-documenting (flipping the env var
        # after a function is jitted has no effect on the compiled program).
        if not getattr(rel_pos_bias, "_gather_logged", False):
            rel_pos_bias._gather_logged = True
            print("[mumpy] MUMPY_RELPOS=gather active (trace-time gate)",
                  flush=True)
        idx = jnp.asarray(relative_position_index(wh, ww))
        return table[idx.reshape(-1)].reshape(n, n, -1).transpose(2, 0, 1)
    oh = jnp.asarray(_rel_pos_onehot(wh, ww), table.dtype)
    bias = oh @ table  # (n*n, H)
    return bias.reshape(n, n, -1).transpose(2, 0, 1)


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, kernel_init=trunc_init, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, kernel_init=trunc_init, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (``swinTransformer.py:86-166``).

    Operates on windows shaped (B_, N, C) where N = wh*ww.
    """

    dim: int
    window: Tuple[int, int]
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        scale = hd**-0.5

        qkv = nn.Dense(3 * c, kernel_init=trunc_init, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, hd)

        wh, ww = self.window
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * wh - 1) * (2 * ww - 1), h),
        )
        bias = rel_pos_bias(table, wh, ww)

        use_fused = (
            pallas_wa.attention_mode() != "off"
            and (deterministic or self.attn_drop == 0.0)
        )
        if use_fused:
            # fused pallas path: rows = (batch, window, head) with head fastest,
            # so the (mask+bias) additive term is periodic along rows.
            if mask is not None:
                nw = mask.shape[0]
                periodic = (mask[:, None] + bias[None]).reshape(nw * h, n, n)
            else:
                periodic = bias
            rows = q.transpose(0, 2, 1, 3).reshape(b * h, n, hd)
            krows = k.transpose(0, 2, 1, 3).reshape(b * h, n, hd)
            vrows = v.transpose(0, 2, 1, 3).reshape(b * h, n, hd)
            out = pallas_wa.window_attention_ad(rows, krows, vrows, periodic)
            out = out.reshape(b, h, n, hd).transpose(0, 2, 1, 3).reshape(b, n, c)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            attn = attn + bias[None].astype(attn.dtype)
            if mask is not None:
                # cast: the f32 mask must not promote bf16 scores (f32 MXU
                # matmuls run at a fraction of the bf16 rate)
                nw = mask.shape[0]
                attn = attn.reshape(b // nw, nw, h, n, n) + mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(b, h, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        out = nn.Dense(c, kernel_init=trunc_init, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


def window_attend(
    attn_mod: WindowAttention,
    x: jnp.ndarray,
    grid_hw: Tuple[int, int],
    window: int,
    shift: int,
    deterministic: bool,
) -> jnp.ndarray:
    """Apply (shifted-)window attention to tokens (B, L, C) over a folded grid.

    ``grid_hw`` is the (T*H, W) grid the tokens occupy.  Returns (B, L, C).
    """
    gh, gw = grid_hw
    b, l, c = x.shape
    assert l == gh * gw, f"tokens {l} != grid {gh}x{gw}"
    xs = x.reshape(b, gh, gw, c)
    if shift > 0:
        xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        mask = shifted_window_mask(gh, gw, window, shift)
    else:
        mask = None
    wins = window_partition(xs, window).reshape(-1, window * window, c)
    wins = attn_mod(wins, mask=mask, deterministic=deterministic)
    xs = window_reverse(wins.reshape(-1, window, window, c), window, gh, gw)
    if shift > 0:
        xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
    return xs.reshape(b, l, c)


class SwinBlock(nn.Module):
    """Standard Swin block with temporal-folded grid (``swinTransformer.py:185-307``).

    ``dp_rate`` (call arg) overrides ``drop_path_rate`` so stacked blocks under
    ``nn.scan`` can receive their per-depth stochastic-depth rate as a scanned
    input.
    """

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    temporal_dim: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dp_rate=None,
                 pre_windowed: bool = False):
        h, w = self.input_resolution
        window = self.window_size
        shift = self.shift_size
        if min(h, w) <= window:
            window = min(h, w)
            shift = 0
        dp = self.drop_path_rate if dp_rate is None else dp_rate

        # fused whole-block pallas path (inference): the block is kernel-overhead
        # bound in XLA (~13 launches of ~30us on sub-MB tensors); the fused kernel
        # measured 2.3x faster per block on a v5e.  Init and training trace the
        # XLA path below, which creates/owns the parameters.
        use_fused = (
            deterministic
            and pallas_sb.attention_mode() != "off"
            and self.has_variable("params", "norm1")
            and pallas_sb.supported(
                self.dim, int(self.dim * self.mlp_ratio), window * window,
                itemsize=self.variables["params"]["mlp"]["fc1"]["kernel"].dtype.itemsize,
            )
        )
        if use_fused:
            return self._fused_call(x, window, shift, pre_windowed)
        # fused TRAINING path: whole-block kernel with a custom VJP (backward
        # recomputes in-kernel; weight grads are XLA GEMMs on spilled operands).
        # drop_path becomes per-row keep factors; dropout rates must be 0
        # (checked by train_supported) — the flagship recipe's are.
        use_fused_train = (
            not deterministic
            and not pre_windowed
            and not self.is_initializing()
            and pallas_sbv.train_mode() != "off"
            and pallas_sbv.train_site_enabled("block")
            and self.has_variable("params", "norm1")
            and pallas_sbv.train_supported(
                self.dim, int(self.dim * self.mlp_ratio), window * window,
                self.variables["params"]["mlp"]["fc1"]["kernel"].dtype.itemsize,
                self.drop, self.attn_drop,
            )
        )
        if use_fused_train:
            return self._fused_train_call(x, window, shift, dp)
        if pre_windowed:
            # ValueError (not assert): a window-major carry silently flowing
            # through the image-layout path would produce wrong outputs, and
            # asserts are stripped under python -O.
            raise ValueError(
                "pre_windowed carry reached the XLA path — the caller's "
                "eligibility check disagrees with SwinBlock's"
            )

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        attn = WindowAttention(
            self.dim, (window, window), self.num_heads,
            attn_drop=self.attn_drop, proj_drop=self.drop, name="attn",
        )
        y = window_attend(attn, y, (self.temporal_dim * h, w), window, shift, deterministic)

        rng = self.make_rng("dropout") if not deterministic else None
        x = shortcut + drop_path(y, dp, deterministic, rng)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), deterministic
        )
        rng = self.make_rng("dropout") if not deterministic else None
        return x + drop_path(y, dp, deterministic, rng)

    def _fused_call(self, x, window: int, shift: int, pre_windowed: bool = False):
        """Dispatch the whole block to the fused pallas kernel.

        The kernel-ready operands (per-head weight splits, padded/tiled mask+
        bias) are pure layout work on parameters; computing them on-device costs
        ~10 launches per block per forward.  They are cached in the "prepared"
        variable collection: a capture run with ``mutable=["prepared"]`` stores
        them once (``utils/serving.py:prepare_for_inference``), after which
        serving applies read them for free.  Without the collection they are
        computed inline (correct, slower).

        Layout: instead of the roll + pad + transpose chain, tokens are moved
        with ONE static-permutation row gather per layout change (the block is
        launch-overhead bound; every layout op costs a fixed ~30us).  With
        ``pre_windowed`` the input/output are already window-major ``(B*nW, N,
        C)`` in the *unshifted* layout (scanned stacks keep that layout as the
        carry), so an unshifted block needs zero layout ops and a shifted block
        needs two gathers."""
        gh, gw = self.temporal_dim * self.input_resolution[0], self.input_resolution[1]
        if pre_windowed:
            # rows_in may exceed window^2: a padded scan carry keeps windows
            # sublane-rounded (n -> npad) so the kernel's per-block pad/slice
            # and the two layout ops around it vanish over a deep stack.
            r, rows_in, c = x.shape
        else:
            b, l, c = x.shape
        n = window * window
        nw = (gh // window) * (gw // window)
        if pre_windowed:
            b = r // nw
        p_w = nw if shift > 0 else 1

        def compute_prepared():
            v = self.variables["params"]
            weights = {
                "ln1_scale": v["norm1"]["scale"], "ln1_bias": v["norm1"]["bias"],
                "qkv_kernel": v["attn"]["qkv"]["kernel"],
                "qkv_bias": v["attn"]["qkv"]["bias"],
                "proj_kernel": v["attn"]["proj"]["kernel"],
                "proj_bias": v["attn"]["proj"]["bias"],
                "ln2_scale": v["norm2"]["scale"], "ln2_bias": v["norm2"]["bias"],
                "fc1_kernel": v["mlp"]["fc1"]["kernel"],
                "fc1_bias": v["mlp"]["fc1"]["bias"],
                "fc2_kernel": v["mlp"]["fc2"]["kernel"],
                "fc2_bias": v["mlp"]["fc2"]["bias"],
            }
            table = v["attn"]["relative_position_bias_table"]
            bias = rel_pos_bias(table, window, window)
            if shift > 0:
                mask = shifted_window_mask(gh, gw, window, shift)
                mb = mask[:, None].astype(bias.dtype) + bias[None]  # (nW, H, n, n)
            else:
                mb = bias[None]  # (1, H, n, n)
            return pallas_sb.prepare_weights(weights, mb, heads=self.num_heads, r=b * nw)

        if self.has_variable("prepared", "block"):
            prepared = self.get_variable("prepared", "block")
        elif self.is_mutable_collection("prepared"):
            prepared = self.variable("prepared", "block", compute_prepared).value
        else:
            prepared = compute_prepared()

        if pre_windowed:
            if shift > 0:
                if rows_in == n:
                    perm = window_layout_perm(gh, gw, window, 0, shift)
                else:
                    perm = window_layout_perm_padded(
                        gh, gw, window, 0, shift, rows_in)
                wins = jnp.take(x.reshape(b, nw * rows_in, c),
                                jnp.asarray(perm), axis=1)
                wins = wins.reshape(b * nw, rows_in, c)
            else:
                wins = x
        else:
            wins = partition_tokens(x, gh, gw, window, shift)
        wins = pallas_sb.fused_swin_block_prepared(
            wins, prepared, heads=self.num_heads, n=n, p_w=p_w,
            interpret=pallas_sb.attention_mode() == "interpret",
            form=pallas_sb.softmax_form(),
        )
        if pre_windowed:
            if shift > 0:
                if rows_in == n:
                    iperm = window_layout_perm(gh, gw, window, shift, 0)
                else:
                    iperm = window_layout_perm_padded(
                        gh, gw, window, shift, 0, rows_in)
                wins = jnp.take(wins.reshape(b, nw * rows_in, c),
                                jnp.asarray(iperm), axis=1)
                wins = wins.reshape(b * nw, rows_in, c)
            return wins
        return unpartition_tokens(wins, gh, gw, window, shift)

    def _fused_train_call(self, x, window: int, shift: int, dp):
        """Training dispatch to the custom-VJP whole-block kernel.

        Builds the additive term (shift mask + rel-pos bias) and per-row
        stochastic-depth keep factors, then runs the differentiable kernel on
        window-partitioned tokens.  ``dp`` may be a traced per-depth rate (the
        scanned stacks pass it as a scan input)."""
        gh = self.temporal_dim * self.input_resolution[0]
        gw = self.input_resolution[1]
        b, l, c = x.shape
        n = window * window
        nw = (gh // window) * (gw // window)

        v = self.variables["params"]
        weights = {
            "ln1s": v["norm1"]["scale"][None], "ln1b": v["norm1"]["bias"][None],
            "wqkv": v["attn"]["qkv"]["kernel"],
            "bqkv": v["attn"]["qkv"]["bias"][None],
            "wproj": v["attn"]["proj"]["kernel"],
            "bproj": v["attn"]["proj"]["bias"][None],
            "ln2s": v["norm2"]["scale"][None], "ln2b": v["norm2"]["bias"][None],
            "wfc1": v["mlp"]["fc1"]["kernel"], "bfc1": v["mlp"]["fc1"]["bias"][None],
            "wfc2": v["mlp"]["fc2"]["kernel"], "bfc2": v["mlp"]["fc2"]["bias"][None],
        }
        table = v["attn"]["relative_position_bias_table"]
        bias = rel_pos_bias(table, window, window)
        if shift > 0:
            mask = shifted_window_mask(gh, gw, window, shift)
            mb = mask[:, None].astype(bias.dtype) + bias[None]  # (nW, H, n, n)
            p_w = nw
        else:
            mb = bias[None]
            p_w = 1

        # per-row stochastic-depth keep factors (timm DropPath semantics,
        # one draw per SAMPLE per residual; rows are batch-major windows)
        def keep_rows(rng):
            keep = 1.0 - jnp.asarray(dp, jnp.float32)
            mask_b = jax.random.bernoulli(rng, keep, (b, 1)).astype(jnp.float32)
            return jnp.repeat(mask_b / keep, nw, axis=0)

        k1 = keep_rows(self.make_rng("dropout"))
        k2 = keep_rows(self.make_rng("dropout"))

        wins = partition_tokens(x, gh, gw, window, shift)
        wins = pallas_sbv.fused_block_train(
            wins, mb, weights, k1, k2, self.num_heads, n, p_w,
            pallas_sbv.train_mode() == "interpret",
        )
        return unpartition_tokens(wins, gh, gw, window, shift)


class PatchMerging(nn.Module):
    """2x2 patch merging over a (possibly temporally folded) grid
    (``swinTransformer.py:328-367``, ``ThreeViewPatchMerging`` at ``:637-657``).

    The folded grid (T*H, W) is merged with stride 2 in both axes; frame rows stay
    aligned because every per-frame height is even.
    """

    dim: int
    grid_hw: Tuple[int, int]

    @nn.compact
    def __call__(self, x):
        gh, gw = self.grid_hw
        b, l, c = x.shape
        assert l == gh * gw and gh % 2 == 0 and gw % 2 == 0
        xs = x.reshape(b, gh // 2, 2, gw // 2, 2, c)
        # torch concat order: x0=(0,0) x1=(1,0) x2=(0,1) x3=(1,1) along channels
        xs = jnp.concatenate(
            [xs[:, :, 0, :, 0], xs[:, :, 1, :, 0], xs[:, :, 0, :, 1], xs[:, :, 1, :, 1]],
            axis=-1,
        )
        xs = xs.reshape(b, (gh // 2) * (gw // 2), 4 * c)
        xs = nn.LayerNorm(epsilon=1e-5, name="norm")(xs)
        return nn.Dense(2 * self.dim, use_bias=False, kernel_init=trunc_init, name="reduction")(xs)


class VitBlock(nn.Module):
    """Pre-LN ViT block (``models/modules/blocks.py:77-92``)."""

    dim: int
    num_heads: int
    mlp_dim: int
    drop: float = 0.0
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dp_rate=None,
                 time_major: bool = False):
        if time_major:
            # TIME-MAJOR layout (3, R, C): the global encoder keeps its scan
            # carry as three full-width temporal slabs so the specialized n=3
            # whole-layer kernel (ops/pallas/vit3.py) runs with zero layout
            # ops.  Fallback (init / training / kernel off): transpose to the
            # token-major layout, run the standard body, transpose back —
            # identical math, identical param tree.
            out = self._vit3_call(x, deterministic)
            if out is not None:
                return out
            return self._body(
                x.transpose(1, 0, 2), deterministic, dp_rate
            ).transpose(1, 0, 2)
        return self._body(x, deterministic, dp_rate)

    def _vit3_call(self, x, deterministic):
        """Fused whole-layer n=3 kernel when eligible, else None."""
        three, r, c = x.shape
        if not (
            three == 3
            and deterministic
            and pallas_sb.attention_mode() != "off"
            and fused_site_enabled("vit3")
            and self.has_variable("params", "norm1")
        ):
            return None
        itemsize = self.variables["params"]["mlp"]["fc1"]["kernel"].dtype.itemsize
        if not pallas_v3.supported(c, self.mlp_dim, self.num_heads, itemsize):
            return None

        def compute():
            v = self.variables["params"]
            weights = {
                "ln1_scale": v["norm1"]["scale"], "ln1_bias": v["norm1"]["bias"],
                "qkv_kernel": v["qkv"]["kernel"], "qkv_bias": v["qkv"]["bias"],
                "proj_kernel": v["proj"]["kernel"], "proj_bias": v["proj"]["bias"],
                "ln2_scale": v["norm2"]["scale"], "ln2_bias": v["norm2"]["bias"],
                "fc1_kernel": v["mlp"]["fc1"]["kernel"],
                "fc1_bias": v["mlp"]["fc1"]["bias"],
                "fc2_kernel": v["mlp"]["fc2"]["kernel"],
                "fc2_bias": v["mlp"]["fc2"]["bias"],
            }
            return pallas_v3.prepare_vit3_weights(weights, heads=self.num_heads)

        if self.has_variable("prepared", "vit3"):
            prepared = self.get_variable("prepared", "vit3")
        elif self.is_mutable_collection("prepared"):
            prepared = self.variable("prepared", "vit3", compute).value
        else:
            prepared = compute()
        return pallas_v3.fused_vit3_prepared(
            x, prepared, heads=self.num_heads,
            interpret=pallas_sb.attention_mode() == "interpret",
        )

    def _body(self, x, deterministic: bool = True, dp_rate=None):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        dp = self.drop_path_rate if dp_rate is None else dp_rate

        # fused WHOLE-BLOCK kernel (inference, env-gated OFF by default): with
        # the real VMEM capacity (128MB on v5e, see ops/pallas/swin_block.py)
        # the full C=768 weight set (14.2MB bf16) stays resident and the whole
        # LN→QKV→attn→proj→LN→MLP chain runs as ONE kernel per layer.  Measured
        # 271.9 vs 283.9 f/s at batch 32 though — n=3 pads to 8 and XLA fuses
        # the tiny attention well — so fused_site_enabled("vit") stays off.
        # The kernel's mask-bias slot carries zeros (no rel-pos bias here).
        use_block = (
            deterministic
            and pallas_sb.attention_mode() != "off"
            and fused_site_enabled("vit")
            and self.has_variable("params", "norm1")
            and pallas_sb.supported(
                c, self.mlp_dim, n,
                itemsize=self.variables["params"]["mlp"]["fc1"]["kernel"].dtype.itemsize,
            )
        )
        if use_block:
            def compute_prepared():
                v = self.variables["params"]
                weights = {
                    "ln1_scale": v["norm1"]["scale"], "ln1_bias": v["norm1"]["bias"],
                    "qkv_kernel": v["qkv"]["kernel"], "qkv_bias": v["qkv"]["bias"],
                    "proj_kernel": v["proj"]["kernel"], "proj_bias": v["proj"]["bias"],
                    "ln2_scale": v["norm2"]["scale"], "ln2_bias": v["norm2"]["bias"],
                    "fc1_kernel": v["mlp"]["fc1"]["kernel"],
                    "fc1_bias": v["mlp"]["fc1"]["bias"],
                    "fc2_kernel": v["mlp"]["fc2"]["kernel"],
                    "fc2_bias": v["mlp"]["fc2"]["bias"],
                }
                mb = jnp.zeros((1, h, n, n), jnp.float32)
                return pallas_sb.prepare_weights(weights, mb, heads=h, r=b)

            if self.has_variable("prepared", "block"):
                prepared = self.get_variable("prepared", "block")
            elif self.is_mutable_collection("prepared"):
                prepared = self.variable("prepared", "block", compute_prepared).value
            else:
                prepared = compute_prepared()
            return pallas_sb.fused_swin_block_prepared(
                x, prepared, heads=h, n=n, p_w=1,
                interpret=pallas_sb.attention_mode() == "interpret",
                form=pallas_sb.softmax_form(),
            )

        # fallback halves: LN+MSA+residual kernel for the attention, LN-MLP
        # kernel for the tail (the pre-VMEM-raise layout).
        def _weights():
            v = self.variables["params"]
            return {
                "ln_scale": v["norm1"]["scale"], "ln_bias": v["norm1"]["bias"],
                "qkv_kernel": v["qkv"]["kernel"], "qkv_bias": v["qkv"]["bias"],
                "proj_kernel": v["proj"]["kernel"], "proj_bias": v["proj"]["bias"],
            }

        fused = fused_attn_branch(
            self, x, h, _weights,
            lambda: jnp.zeros((1, h, n, n), jnp.float32), 1, deterministic,
            site="vit",
        )
        if fused is not None:
            _, x = fused
        else:
            y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
            qkv = nn.Dense(3 * c, kernel_init=trunc_init, name="qkv")(y)
            if n <= 4 and _vit_unrolled_enabled():
                # UNROLLED small-n attention: the batched (b,h,n,n) einsums
                # force (b,n,h,d)->(b,h,n,d) transposes — at n=3 those copies
                # cost more than the attention itself (~4.9ms/step of the
                # batch-16 serving trace was this region).  With n unrolled in
                # Python, everything is elementwise multiplies and per-head
                # reductions on (b, C)-shaped slices: zero transposes, fully
                # XLA-fusable.  Identical math (same softmax over k).
                q3 = [qkv[:, i, :c].reshape(b, h, hd) * hd**-0.5 for i in range(n)]
                k3 = [qkv[:, j, c:2 * c].reshape(b, h, hd) for j in range(n)]
                v3 = [qkv[:, j, 2 * c:].reshape(b, h, hd) for j in range(n)]
                # scores[i]: (b, h, n) = q_i · k_j over hd, stacked along j
                p = [
                    jax.nn.softmax(jnp.stack(
                        [jnp.sum(q3[i] * k3[j], axis=-1) for j in range(n)], -1
                    ), axis=-1)
                    for i in range(n)
                ]
                p = jnp.stack(p, 1)  # (b, n, h, n) — q index second, k minor
                p = nn.Dropout(self.drop)(p, deterministic=deterministic)
                y = jnp.stack([
                    sum(p[:, i, :, j:j + 1] * v3[j] for j in range(n)).reshape(b, c)
                    for i in range(n)
                ], axis=1)
            else:
                qkv = qkv.reshape(b, n, 3, h, hd)
                q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
                attn = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q * hd**-0.5, k), axis=-1)
                attn = nn.Dropout(self.drop)(attn, deterministic=deterministic)
                y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
            y = nn.Dense(c, kernel_init=trunc_init, name="proj")(y)
            y = nn.Dropout(self.drop)(y, deterministic=deterministic)
            rng = self.make_rng("dropout") if not deterministic else None
            x = x + drop_path(y, dp, deterministic, rng)
        if not deterministic:
            fused = fused_mlp_tail_train(self, x, c, dp, self.drop)
            if fused is not None:
                return fused
        fused = fused_mlp_tail(self, x, c, self.mlp_dim / c, deterministic)
        if fused is not None:
            return fused
        y = Mlp(self.mlp_dim, c, self.drop, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), deterministic
        )
        rng = self.make_rng("dropout") if not deterministic else None
        return x + drop_path(y, dp, deterministic, rng)
