"""Multi-pyramid decoder with frequency gating (TPU-native).

Re-design of ``models/decoder/decoder.py:41-225``.  All convolutions are
channels-last; bilinear upsampling uses the exact torch semantics of
:func:`mumpy_tpu.ops.resize.resize_bilinear` (the reference mixes
``align_corners=True`` for the main decoder chain, ``decoder.py:72-93``, and the
default ``align_corners=False`` for SEB/upsample2/upsample4, ``decoder.py:10,136-137``).

Blocks:
* per-stage view merge + Conv3d(T,1,1) temporal squeeze -> 256ch (``:98-120,191-194``)
* five sigmoid-gated frequency pyramid levels from the FAF features (``:146-181``)
* GCM separable large-kernel convs (``:17-39``), SEB multiplicative skips (``:6-14``),
  ECRE PixelShuffle expansion (``:128,204-205``), DAP (``:139-143``).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs.model_config import MumpyConfig
from ..ops.pixel import avg_pool_2d, dap_pool, pixel_shuffle
from ..ops.resize import upsample_2d
from .encoder import merge_views_along_channel_axis
from .swin import gelu, trunc_init  # noqa: F401 (gelu unused here, relu decoder)


def _small_conv_enabled() -> bool:
    """MUMPY_SMALL_CONV env gate (trace-time, like the kernel site gates).

    Default OFF: the stencil form measured 101.8 vs 97.9 ms/step at batch 32
    (ab_bench, interleaved) — XLA's conv lowering beats the 9 materialized
    slice-einsum terms even at 4 output channels.  Kept for other TPU
    generations / shapes (ab_bench token ``smallconv`` opts in)."""
    return os.environ.get("MUMPY_SMALL_CONV", "0") not in ("0", "off")


class SmallConv(nn.Module):
    """Drop-in ``nn.Conv`` replacement for tiny-output-channel SAME convs.

    XLA's conv op on NHWC tensors with <=8 output channels uses a sliver of
    the MXU lanes and dominated the batch-32 decoder trace (decoder_5 2.2 ms,
    final_out 1.25 ms — mostly 4- and 1-channel 3x3 convs at 112-224^2).  With
    few taps and tiny channel mixes, the conv is cheaper as the explicit sum
    of shifted slices, each a fusable element-wise ``(B,H,W,Cin)@(Cin,Cout)``
    contraction — XLA fuses the whole stencil into one pass over the tensor.

    Parameters are IDENTICAL to ``nn.Conv`` (kernel ``(kh, kw, cin, cout)``,
    bias ``(cout,)``, lecun-normal/zeros init), so checkpoints, weight-port,
    and init are unchanged; ``MUMPY_SMALL_CONV=0`` falls back to ``nn.Conv``'s
    lowering for A/B measurement (ab_bench token ``xlaconv``).
    """

    features: int
    kernel_size: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if not _small_conv_enabled():
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1), self.padding,
                dimension_numbers=dn)
            return y + bias.astype(y.dtype)
        (pt, pb), (pl, pr) = self.padding
        h, w = x.shape[1], x.shape[2]
        oh = h + pt + pb - kh + 1
        ow = w + pl + pr - kw + 1
        xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
        kernel = kernel.astype(x.dtype)
        acc = None
        for dy in range(kh):
            for dx in range(kw):
                term = jnp.einsum(
                    "bhwc,co->bhwo",
                    jax.lax.slice(
                        xp, (0, dy, dx, 0),
                        (xp.shape[0], dy + oh, dx + ow, cin)),
                    kernel[dy, dx])
                acc = term if acc is None else acc + term
        return acc + bias.astype(acc.dtype)


class GlobalConvModule(nn.Module):
    """Separable large-kernel conv pair (``decoder.py:17-39``)."""

    out_dim: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        pk, p0 = ((k // 2, k // 2), (0, 0))
        xl = SmallConv(self.out_dim, (k, 1), (pk, p0), name="conv_l1")(x)
        xl = SmallConv(self.out_dim, (1, k), (p0, pk), name="conv_l2")(xl)
        xr = SmallConv(self.out_dim, (1, k), (p0, pk), name="conv_r1")(x)
        xr = SmallConv(self.out_dim, (k, 1), (pk, p0), name="conv_r2")(xr)
        return xl + xr


class SEB(nn.Module):
    """Semantic enhancement: x1 * upsample(conv(x2)) (``decoder.py:6-14``)."""

    out_dim: int

    @nn.compact
    def __call__(self, x1, x2):
        y = nn.Conv(self.out_dim, (3, 3), padding=1, name="conv")(x2)
        return x1 * upsample_2d(y, 2, align_corners=False)


class ConvGNReLUUp(nn.Module):
    """conv3x3 + GroupNorm + ReLU + 2x bilinear (align_corners=True)
    (``decoder.py:67-93``)."""

    out_dim: int
    groups: int = 8
    upsample: bool = True

    @nn.compact
    def __call__(self, x):
        x = SmallConv(self.out_dim, (3, 3), ((1, 1), (1, 1)), name="conv")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn")(x)
        x = nn.relu(x)
        return upsample_2d(x, 2, align_corners=True) if self.upsample else x


class FreqGate(nn.Module):
    """AvgPool2 + conv3x3 + GroupNorm + Sigmoid (``decoder.py:146-181``)."""

    out_dim: int
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        x = avg_pool_2d(x, 2)
        x = SmallConv(self.out_dim, (3, 3), ((1, 1), (1, 1)), name="conv")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="gn")(x)
        return nn.sigmoid(x)


class TemporalSqueeze(nn.Module):
    """Conv3d(kernel=stride=(T,1,1)) + GroupNorm(16) + ReLU (``decoder.py:98-120``).

    The reference tiles T=1 views to maxT along time before the conv
    (``decoder.py:43-53``), tripling the tensor it then contracts away.  Here
    the conv is a dense over the flattened (T, C) axis whose kernel rows for
    time-duplicated channels are FOLDED (summed over their duplicate time
    slots) instead — mathematically identical (the dense is linear), but the
    3x-tiled merge tensor is never materialized.  Init runs the reference-
    layout path so the parameter keeps its portable (maxT*sumC, out) shape.
    """

    out_dim: int
    height: int

    @nn.compact
    def __call__(self, views, temporal_dims):
        h = self.height
        max_t = max(temporal_dims)
        chans = [v.shape[-1] for v in views]
        sum_c = sum(chans)

        if self.is_initializing() or not self.has_variable("params", "proj"):
            x = merge_views_along_channel_axis(views, temporal_dims)
            b, t, n, c = x.shape
            x = x.transpose(0, 2, 1, 3).reshape(b, h, n // h, t * c)
            x = nn.Dense(self.out_dim, kernel_init=trunc_init, name="proj")(x)
        else:
            def fold_kernel():
                # pure layout work on parameters — cached in the "prepared"
                # collection by prepare_for_inference like the kernel operands
                w = self.variables["params"]["proj"]["kernel"]  # (maxT*sumC, out)
                wparts = []
                off = 0
                for t_dim, c in zip(temporal_dims, chans):
                    for j in range(t_dim):
                        wparts.append(sum(
                            w[t * sum_c + off : t * sum_c + off + c]
                            for t in range(max_t)
                            if t % t_dim == j
                        ))
                    off += c
                return jnp.concatenate(wparts, axis=0)

            if self.has_variable("prepared", "folded_kernel"):
                wc = self.get_variable("prepared", "folded_kernel")
            elif self.is_mutable_collection("prepared"):
                wc = self.variable("prepared", "folded_kernel", fold_kernel).value
            else:
                wc = fold_kernel()
            import os

            bias = self.variables["params"]["proj"]["bias"]
            if os.environ.get("MUMPY_DECODER_FAST", "1") not in ("0", "off"):
                # The (b,t,n,c)->(b,n,t*c) transposes were 3.4 ms/step of the
                # batch-32 serving trace.  The concat matmul is linear, so run
                # it as one matmul per (view, time) slice on the CONTIGUOUS
                # (b, n, c) slices and sum — same math, zero data movement.
                x = bias.astype(views[0].dtype)
                off = 0
                for t_dim, v, c in zip(temporal_dims, views, chans):
                    b = v.shape[0]
                    v = v.reshape(b, t_dim, -1, c)
                    n = v.shape[2]
                    for j in range(t_dim):
                        # view slice at time t is v[t % t_dim] (torch tile order)
                        x = x + v[:, j] @ wc[off:off + c]
                        off += c
            else:
                xparts = []
                for t_dim, v, c in zip(temporal_dims, views, chans):
                    b = v.shape[0]
                    v = v.reshape(b, t_dim, -1, c)
                    n = v.shape[2]
                    # view slice at time t is v[t % t_dim] (torch tile order)
                    xparts.append(v.transpose(0, 2, 1, 3).reshape(b, n, t_dim * c))
                xc = jnp.concatenate(xparts, axis=-1)
                b, n, _ = xc.shape
                x = xc @ wc + bias
            x = x.reshape(b, h, n // h, self.out_dim)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="gn")(x)
        return nn.relu(x)


class MumpyDecoder(nn.Module):
    """Fuses the 4-scale view pyramid, global features, and frequency gates into a
    full-resolution logit mask (``decoder.py:183-225``)."""

    cfg: MumpyConfig

    @nn.compact
    def __call__(self, x, view_x: List[List[jnp.ndarray]], ffinfo):
        cfg = self.cfg
        nc = cfg.decoder_num_classes
        k2 = cfg.decoder_dap_k**2
        feats = cfg.decoder_features
        tdims = cfg.input_token_temporal_dims
        shapes = cfg.stage_shapes

        rgb = []
        for s in range(4):
            rgb.append(
                TemporalSqueeze(feats[s], shapes[s], name=f"rgb_decoder_{s + 1}")(
                    view_x[s], tdims
                )
            )
        rgb1, rgb2, rgb3, rgb4 = rgb

        freq0 = FreqGate(nc * k2, name="decoder_frequency_0")(ffinfo)
        freq1 = FreqGate(nc * k2, name="decoder_frequency_1")(freq0)
        freq2 = FreqGate(nc * k2, name="decoder_frequency_2")(freq1)
        freq3 = FreqGate(nc, groups=4, name="decoder_frequency_3")(freq2)
        freq4 = FreqGate(nc * k2, name="decoder_frequency_4")(freq3)

        gcn0 = GlobalConvModule(nc * 4, cfg.decoder_kernel_size, name="gcm1")(
            jnp.concatenate([rgb4, x], axis=-1)
        )
        out1 = pixel_shuffle(gcn0 * freq4, 2)  # ECRE (``:205``)

        seb1 = SEB(feats[-2], name="seb1")(rgb3, rgb4)
        gcn1 = GlobalConvModule(nc, cfg.decoder_kernel_size, name="gcm2")(seb1)

        seb2 = SEB(feats[-3], name="seb2")(
            rgb2, jnp.concatenate([rgb3, upsample_2d(rgb4, 2, False)], axis=-1)
        )
        gcn2 = GlobalConvModule(nc * k2, cfg.decoder_kernel_size, name="gcm3")(seb2)

        seb3 = SEB(feats[-4], name="seb3")(
            rgb1,
            jnp.concatenate(
                [rgb2, upsample_2d(rgb3, 2, False), upsample_2d(rgb4, 4, False)], axis=-1
            ),
        )
        gcn3 = GlobalConvModule(nc * k2, cfg.decoder_kernel_size, name="gcm4")(seb3)

        y = ConvGNReLUUp(nc * k2, name="decoder_2")(gcn1 * freq3 + out1)
        y = ConvGNReLUUp(nc * k2, name="decoder_3")(y + gcn2 * freq2)
        y = ConvGNReLUUp(nc * k2, name="decoder_4")(y + gcn3 * freq1)
        dap_early = os.environ.get("MUMPY_DAP_EARLY", "1") not in ("0", "off")
        if dap_early and nc == 1:
            # DAP (PixelShuffle(k)+AvgPool(k), ``decoder.py:139,224``) is a
            # per-pixel mean over the k^2 channels, which commutes exactly
            # with decoder_5's per-channel bilinear upsample — taking the mean
            # BEFORE the upsample runs the full-res 224^2 stage on 1 channel
            # instead of 4 (same value, linear ops reordered).
            y = ConvGNReLUUp(nc * k2, upsample=False, name="decoder_5")(y * freq0)
            y = dap_pool(y, cfg.decoder_dap_k)
            y = upsample_2d(y, 2, align_corners=True)
        else:
            y = ConvGNReLUUp(nc * k2, name="decoder_5")(y * freq0)
            y = dap_pool(y, cfg.decoder_dap_k)  # DAP (``decoder.py:139,224``)
        logits = SmallConv(1, (3, 3), ((1, 1), (1, 1)), name="final_out")(y)
        return logits, y
