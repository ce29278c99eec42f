"""Window-based deformable cross-view attention (CVA).

TPU-native counterpart of ``SwinDAttention`` (``models/modules/deformableAttention.py:
218-405``).  Per window: queries come from view_i, a grouped depthwise conv on the
queries predicts 2-D offsets, the partner view's window is bilinearly sampled at
reference+offset positions (``:353-358``), and standard attention runs between the
49 query tokens and the 49 sampled key/value tokens.  The bilinear sampling uses the
matmul-form :func:`grid_sample_bilinear` so everything stays on the MXU.

Faithfully reproduced quirks of the reference:

* queries are tiled ``ratio`` times (``:330``) so each query window attends to each of
  the partner's temporally-folded windows; outputs are summed back over the ratio
  axis with the ``(b t)`` = ``b * ratio + t`` decomposition (``:394-395``).
* ``proj_out`` is zero-initialised (``:308-309``) so CVA starts as an identity
  residual branch.
* offsets are ``tanh``-bounded to ``offset_range_factor / grid_size`` (``:338-340``).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_bilinear
from ..ops.pallas import cva as pallas_cva
from ..ops.pallas import swin_block as pallas_sb
from .swin import drop_path, fused_site_enabled, gelu, trunc_init


def _offset_dedup_enabled() -> bool:
    """MUMPY_CVA_OFFSET_DEDUP=0 reverts to running the offset branch on the
    ratio-tiled queries (trace-time gate, for interleaved A/B benching)."""
    import os

    return os.environ.get("MUMPY_CVA_OFFSET_DEDUP", "1") != "0"


def _reference_points(h: int, w: int) -> np.ndarray:
    """Normalized (y, x) cell-center grid in [-1, 1] (``deformableAttention.py:311-322``)."""
    ys = (np.linspace(0.5, h - 0.5, h) / h) * 2 - 1
    xs = (np.linspace(0.5, w - 0.5, w) / w) * 2 - 1
    ref = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1)  # (h, w, 2) = (y, x)
    return ref.astype(np.float32)


class SwinDAttention(nn.Module):
    """Deformable cross-attention between two stacks of equal-size windows."""

    dim: int
    num_heads: int
    n_groups: int = 3
    window: int = 7
    offset_range_factor: float = 2.0
    attn_drop: float = 0.0

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        """x1: (B1, N, C) query windows; x2: (B2, N, C) key windows, B2 = ratio*B1."""
        ws = self.window
        b1, n, c = x1.shape
        b2 = x2.shape[0]
        ratio = b2 // b1
        g = self.n_groups
        gc = c // g
        h = self.num_heads
        hd = c // h

        fused = self._fused_call(x1, x2, b1, ratio, deterministic)
        if fused is not None:
            return fused

        # tile queries: x1r[k] = x1[k % B1] (torch ``repeat`` order, ``:330``)
        x1r = jnp.tile(x1, (ratio, 1, 1))

        # the ratio copies of the tiled queries are identical, so the offset
        # branch (proj_q + 5x5 depthwise chain) runs on the UNTILED windows and
        # only its outputs are tiled — exact same values as the reference's
        # offsets-on-tiled-queries order (deformableAttention.py:330-345), at
        # 1/ratio the cost (ratio=3 for the view2->view3 instances).
        if ratio > 1 and _offset_dedup_enabled():
            q1, pos1 = self._query_and_positions(x1)  # (B1*g, ws, ws, 2)
            q = jnp.tile(q1, (ratio, 1, 1))
            pos = jnp.tile(
                pos1.reshape(1, b1 * g, ws, ws, 2), (ratio, 1, 1, 1, 1)
            ).reshape(b2 * g, ws, ws, 2)
        else:
            q, pos = self._query_and_positions(x1r)
        grid = pos[..., ::-1].reshape(b2 * g, n, 2)  # -> (x, y) order

        # ---- sample the partner view per offset group ----
        x2_sp = x2.reshape(b2, ws, ws, g, gc).transpose(0, 3, 1, 2, 4).reshape(b2 * g, ws, ws, gc)
        sampled = grid_sample_bilinear(x2_sp, grid)  # (B2*g, N, gc)
        sampled = sampled.reshape(b2, g, n, gc).transpose(0, 2, 1, 3).reshape(b2, n, c)

        k = nn.Dense(c, kernel_init=trunc_init, name="proj_k")(sampled)
        v = nn.Dense(c, kernel_init=trunc_init, name="proj_v")(sampled)

        qh = q.reshape(b2, n, h, hd)
        kh = k.reshape(b2, n, h, hd)
        vh = v.reshape(b2, n, h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b2, n, c)

        # fold the ratio axis back: k = b*ratio + t, summed over t (``:394-395``)
        out = out.reshape(b1, ratio, n, c).sum(axis=1)
        out = nn.Dense(
            c, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="proj_out",
        )(out)
        out = nn.Dropout(self.attn_drop)(out, deterministic=deterministic)
        return out

    def _query_and_positions(self, x1r):
        """Shared query projection + offset branch (``:324-345``): returns the
        full-width queries (R, N, C) and per-group normalized (y, x) sample
        positions (R*g, ws, ws, 2).  Single source of truth for both the XLA
        and the fused-kernel paths (same submodule names = shared params)."""
        ws = self.window
        g = self.n_groups
        r, n, c = x1r.shape
        gc = c // g
        q = nn.Dense(c, kernel_init=trunc_init, name="proj_q")(x1r)  # 1x1 conv
        q_sp = q.reshape(r, ws, ws, g, gc).transpose(0, 3, 1, 2, 4)
        q_sp = q_sp.reshape(r * g, ws, ws, gc)
        off = nn.Conv(
            gc, (5, 5), padding=2, feature_group_count=gc, kernel_init=trunc_init,
            name="offset_dwconv",
        )(q_sp)
        off = nn.LayerNorm(epsilon=1e-5, name="offset_norm")(off)
        off = gelu(off)
        off = nn.Conv(2, (1, 1), use_bias=False, kernel_init=trunc_init,
                      name="offset_proj")(off)
        if self.offset_range_factor > 0:
            rng_scale = jnp.asarray([1.0 / ws, 1.0 / ws], dtype=off.dtype)
            off = jnp.tanh(off) * rng_scale * self.offset_range_factor
        pos = off + jnp.asarray(_reference_points(ws, ws), off.dtype)
        return q, pos

    def _fused_call(self, x1, x2, b1: int, ratio: int,
                    deterministic: bool):
        """Dispatch the deformable CVA's sampling+attention to the fused kernel.

        Inference-only (dropout inactive); returns None when ineligible.  The
        OFFSET branch stays in XLA (conv-shaped work XLA compiles well — an
        in-kernel formulation was VPU-bound, see ops/pallas/cva.py); the same
        flax submodules are reused by name so parameters are shared with the
        XLA path.  The ratio fold happens INSIDE the kernel (VMEM-accumulated
        across the minor grid dim); only the proj_out BIAS is applied here,
        post-fold (the reference folds BEFORE the bias,
        ``deformableAttention.py:394-399``).
        """
        # default ON (see ``swin.fused_attn_branch`` for the measurement);
        # one shared gate predicate so site parsing can't drift between files
        if not fused_site_enabled("cva"):
            return None
        _, n, c = x1.shape
        if not (
            deterministic
            and self.offset_range_factor > 0  # kernel bakes in the tanh bound
            and pallas_sb.attention_mode() != "off"
            and self.has_variable("params", "proj_q")
        ):
            return None
        v = self.variables["params"]
        if not pallas_cva.supported(c, n, v["proj_q"]["kernel"].dtype.itemsize):
            return None
        # narrow instances can stay on XLA (MUMPY_CVA_KERNEL_MIN_C, trace-time;
        # ab_bench token "cvawide" sets 192 to bench stage-0 c=96/128 on XLA)
        if c < int(os.environ.get("MUMPY_CVA_KERNEL_MIN_C", "0")):
            return None

        def compute():
            weights = {
                "proj_q_kernel": v["proj_q"]["kernel"], "proj_q_bias": v["proj_q"]["bias"],
                "proj_k_kernel": v["proj_k"]["kernel"], "proj_k_bias": v["proj_k"]["bias"],
                "proj_v_kernel": v["proj_v"]["kernel"], "proj_v_bias": v["proj_v"]["bias"],
                "proj_out_kernel": v["proj_out"]["kernel"],
                "proj_out_bias": v["proj_out"]["bias"],
            }
            return pallas_cva.prepare_cva_weights(
                weights, groups=self.n_groups, heads=self.num_heads, ws=self.window
            )

        if self.has_variable("prepared", "cva"):
            prepared = self.get_variable("prepared", "cva")
        elif self.is_mutable_collection("prepared"):
            prepared = self.variable("prepared", "cva", compute).value
        else:
            prepared = compute()

        # ---- offset branch in XLA (shared helper = shared submodules/params) ----
        # Always on the UNTILED queries here: the ratio copies are identical
        # and the kernel re-reads the untiled query/coord blocks per copy via
        # index-map arithmetic (no jnp.tile, no 3x pre-fold output — the
        # ratio fold accumulates inside the kernel).  x2 stays FULL-WIDTH;
        # per-group access is a lane slice inside the kernel.
        ws = self.window
        g = self.n_groups
        _, pos = self._query_and_positions(x1)  # (b1*g, ws, ws, 2)
        pos = pos.reshape(b1, g, n, 2).transpose(1, 0, 2, 3).astype(jnp.float32)
        gy = (pos[..., 0] + 1.0) * 0.5 * (ws - 1)  # absolute pixel coords
        gx = (pos[..., 1] + 1.0) * 0.5 * (ws - 1)

        out = pallas_cva.fused_cva_prepared(
            x1, x2, gy, gx, prepared,
            groups=g, heads=self.num_heads, ws=ws, ratio=ratio,
            interpret=pallas_sb.attention_mode() == "interpret",
        )
        return out + prepared["bproj"].astype(out.dtype)


class CrossWindowAttention(nn.Module):
    """Softmax window cross-attention with relative-position bias — the reference's
    alternative (non-deformable) CVA design (``multiTemporalViewEncoder.py:18-124``;
    not instantiated by the published model, selectable here via
    ``MumpyConfig.cva_kind="window"``).

    Q from view_i windows, K/V from view_{i+1} windows; when the partner has
    ``ratio``x more windows (temporal folding) queries are tiled and outputs are
    summed back over the ratio axis (``:83,100-103``).  Projections are
    zero-initialised (``:61-63``) so the branch starts as an identity residual.
    """

    dim: int
    num_heads: int
    window: int = 7
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        from .swin import rel_pos_bias

        b1, n, c = x1.shape
        b2 = x2.shape[0]
        ratio = b2 // b1
        h = self.num_heads
        hd = c // h
        zeros = nn.initializers.zeros

        q = nn.Dense(c, kernel_init=trunc_init, bias_init=zeros, name="qkv1")(x1)
        kv = nn.Dense(2 * c, kernel_init=trunc_init, bias_init=zeros, name="qkv2")(x2)
        k, v = kv[..., :c], kv[..., c:]

        q = jnp.tile(q, (ratio, 1, 1)) * (hd**-0.5)
        qh = q.reshape(b2, n, h, hd)
        kh = k.reshape(b2, n, h, hd)
        vh = v.reshape(b2, n, h, hd)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        bias = rel_pos_bias(table, self.window, self.window)

        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) + bias[None]
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b2, n, c)
        if ratio > 1:
            out = out.reshape(b1, ratio, n, c).sum(axis=1)
        out = nn.Dense(c, kernel_init=zeros, bias_init=zeros, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class CVAModule(nn.Module):
    """CVA residual wrapper (``multiTemporalViewEncoder.py:127-139``).

    Parameters of this module live under a path containing ``cva`` — the trainer's
    learning-rate group split keys on that substring exactly like the reference's
    optimizer partition (``train.py:205-209``).  ``kind`` selects the deformable
    (published) or window softmax (design-space) cross-view attention.
    """

    dim: int
    num_heads: int
    window: int = 7
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    kind: str = "deformable"

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        if self.kind == "deformable":
            y = SwinDAttention(
                self.dim, self.num_heads, n_groups=3, window=self.window,
                attn_drop=self.attn_drop, name="crossattn",
            )(x1, x2, deterministic)
        elif self.kind == "window":
            y = CrossWindowAttention(
                self.dim, self.num_heads, window=self.window,
                attn_drop=self.attn_drop, name="crossattn",
            )(x1, x2, deterministic)
        else:
            raise ValueError(f"unknown cva kind {self.kind!r}")
        rng = self.make_rng("dropout") if not deterministic and self.drop_path_rate > 0 else None
        return x1 + drop_path(y, self.drop_path_rate, deterministic, rng)
