"""Multilateral temporal-view pyramid encoder (TPU-native).

Re-design of ``models/encoder/multiTemporalViewEncoder.py``:

* the three 3D-conv tokenizers (``:574-618``) are expressed as patch-extraction
  reshapes + one dense matmul each (stride == kernel makes conv3d a pure patchify),
  which XLA tiles straight onto the MXU;
* the size-1 ``functorch.vmap`` over the aligned temporal axis (``:737``) is a
  squeeze — stages operate on (B, L, C) tokens directly;
* the global temporal ViT vmapped over 49 spatial tokens (``:741``) folds tokens into
  the batch axis — one big batched matmul instead of 49 tiny ones;
* cross-view information flows view3 -> view2 -> view1 through window-based
  deformable CVA at the first block of every stage (``:294-350``).
"""

from __future__ import annotations

from typing import List, Tuple

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs.model_config import MumpyConfig, ViewConfig
from ..ops.dct import faf
from ..ops.pallas import attn_ln_vjp as pallas_alv
from ..ops.pallas import swin_block as pallas_sb
from ..ops.pallas import swin_block_vjp as pallas_sbv
from ..ops.pallas import swin_pair as pallas_pair
from ..ops.window import (partition_tokens, shifted_window_mask,
                          unpartition_tokens, window_partition)
from .deformable import CVAModule
from .swin import (Mlp, PatchMerging, SwinBlock, VitBlock, WindowAttention,
                   drop_path, fused_attn_branch, fused_mlp_tail,
                   fused_mlp_tail_train, fused_site_enabled,
                   rel_pos_bias, trunc_init, window_attend)


class PatchEmbed3D(nn.Module):
    """Conv3d(kernel=stride=(t, p, p)) patchify as reshape+matmul
    (``multiTemporalViewEncoder.py:574-618``).

    Input (B, T, H, W, 3) -> tokens (B, T', H/p * W/p, C); patch channel order is
    (t, c, ph, pw) to match the torch conv weight layout for porting.
    """

    hidden: int
    patch: Tuple[int, int, int]  # (ph, pw, pt)

    @nn.compact
    def __call__(self, x):
        ph, pw, pt = self.patch
        b, t, h, w, c = x.shape
        to = t // pt
        # conv3d valid-stride semantics: frames beyond to*pt are dropped
        # (e.g. view2's stride-2 kernel sees frames [0,1] only of a 3-frame clip)
        x = x[:, : to * pt]
        x = x.reshape(b, to, pt, h // ph, ph, w // pw, pw, c)
        # flatten patch dims in torch Conv3d weight order (c_in, t, ph, pw)
        x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # b, to, h', w', c, pt, ph, pw
        x = x.reshape(b, to, (h // ph) * (w // pw), c * pt * ph * pw)
        x = nn.Dense(self.hidden, kernel_init=trunc_init, name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class CrossSwinBlock(nn.Module):
    """W-MSA + (optionally) deformable cross-view attention + MLP
    (``multiTemporalViewEncoder.py:142-291``).

    Returns ``(x1_new, out)`` where ``out`` is the raw W-MSA output passed as the
    partner stream to the next view in the chain (``:275,345-349``).
    """

    dim1: int
    dim2: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    last_view: bool = False
    cva_kind: str = "deformable"

    @nn.compact
    def __call__(self, x1, x2, deterministic: bool = True):
        h, w = self.input_resolution
        window = self.window_size
        if min(h, w) <= window:
            window = min(h, w)
        b1, l1, c1 = x1.shape
        t1 = l1 // (h * w)
        gh1, gw1 = t1 * h, w
        n = window * window

        # fused inference path: ONE gather into window domain, one LN+W-MSA+
        # residual kernel (which also emits the pre-residual branch needed as
        # the next view's partner stream), CVA and the MLP kernel directly on
        # windows, one gather back.  Training/init run the XLA path below.
        def _weights():
            v = self.variables["params"]
            return {
                "ln_scale": v["norm1"]["scale"], "ln_bias": v["norm1"]["bias"],
                "qkv_kernel": v["attn"]["qkv"]["kernel"],
                "qkv_bias": v["attn"]["qkv"]["bias"],
                "proj_kernel": v["attn"]["proj"]["kernel"],
                "proj_bias": v["attn"]["proj"]["bias"],
            }

        def _bias():
            table = self.variables["params"]["attn"]["relative_position_bias_table"]
            return rel_pos_bias(table, window, window)[None]

        x1w_in = partition_tokens(x1, gh1, gw1, window, 0)
        fused = fused_attn_branch(
            self, x1w_in, self.num_heads, _weights, _bias, 1, deterministic,
            site="cross",
        )
        if fused is not None:
            yw, x1w = fused
            out = unpartition_tokens(yw, gh1, gw1, window, 0)
            x1i = unpartition_tokens(x1w, gh1, gw1, window, 0)
            if not self.last_view:
                b2, l2, c2 = x2.shape
                t2 = l2 // (h * w)
                x2w = partition_tokens(x2, t2 * h, w, window, 0)
                x2w = nn.Dense(self.dim1, kernel_init=trunc_init, name="pre")(x2w)
                cw = CVAModule(
                    self.dim1, self.num_heads, window=window,
                    attn_drop=self.attn_drop, drop_path_rate=self.drop_path_rate,
                    kind=self.cva_kind, name="cva",
                )(x1w, x2w, deterministic)
                # two reference quirks reproduced faithfully: (1) double
                # residual — CVAModule already folded in x1w
                # (``multiTemporalViewEncoder.py:138``) and the block adds the
                # shortcut again (``:286``); (2) the CVA output is added in
                # image token order WITHOUT window_reverse — the rearrange at
                # ``:285`` is a plain reshape, so window-major tokens land at
                # image-major positions.
                x1i = x1i + cw.reshape(b1, l1, c1)
            fm = fused_mlp_tail(self, x1i, self.dim1, self.mlp_ratio, deterministic)
            if fm is None:
                fm = x1i + Mlp(
                    int(self.dim1 * self.mlp_ratio), self.dim1, self.drop, name="mlp"
                )(nn.LayerNorm(epsilon=1e-5, name="norm2")(x1i), deterministic)
            return fm, out

        # fused TRAINING attention half (custom VJP): one kernel computes the
        # W-MSA branch y AND the residual out = x1 + keep*y; the backward
        # recomputes in-kernel and spills the weight-grad operands (see
        # ops/pallas/attn_ln_vjp.py).  The partner-stream `out` keeps the
        # reference's pre-drop-path semantics (multiTemporalViewEncoder.py:275).
        fused_train = (
            not deterministic
            and not self.is_initializing()
            and pallas_sbv.train_mode() != "off"
            and pallas_sbv.train_site_enabled("cross")
            and self.has_variable("params", "norm1")
            and pallas_alv.train_supported(
                c1, n,
                self.variables["params"]["attn"]["qkv"]["kernel"].dtype.itemsize,
                self.drop, self.attn_drop,
            )
        )
        if fused_train:
            v = self.variables["params"]
            weights = {
                "lns": v["norm1"]["scale"][None], "lnb": v["norm1"]["bias"][None],
                "wqkv": v["attn"]["qkv"]["kernel"],
                "bqkv": v["attn"]["qkv"]["bias"][None],
                "wproj": v["attn"]["proj"]["kernel"],
                "bproj": v["attn"]["proj"]["bias"][None],
            }
            mb = _bias()
            nw = (gh1 // window) * (gw1 // window)
            if self.drop_path_rate > 0:
                keep = 1.0 - jnp.asarray(self.drop_path_rate, jnp.float32)
                mask_b = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (b1, 1)).astype(jnp.float32)
                k1 = jnp.repeat(mask_b / keep, nw, axis=0)
            else:
                k1 = jnp.ones((b1 * nw, 1), jnp.float32)
            yw, x1w = pallas_alv.fused_attn_ln_train(
                x1w_in, mb, weights, k1, self.num_heads, n, 1,
                pallas_sbv.train_mode() == "interpret",
            )
            out = unpartition_tokens(yw, gh1, gw1, window, 0)
            x1 = unpartition_tokens(x1w, gh1, gw1, window, 0)
        else:
            shortcut = x1
            y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x1)
            attn = WindowAttention(
                self.dim1, (window, window), self.num_heads,
                attn_drop=self.attn_drop, proj_drop=self.drop, name="attn",
            )
            y = window_attend(attn, y, (t1 * h, w), window, 0, deterministic)
            out = y
            rng = self.make_rng("dropout") if not deterministic and self.drop_path_rate > 0 else None
            x1 = shortcut + drop_path(y, self.drop_path_rate, deterministic, rng)

        if not self.last_view:
            b2, l2, c2 = x2.shape
            t2 = l2 // (h * w)
            x1w = window_partition(x1.reshape(b1, t1 * h, w, c1), window)
            x1w = x1w.reshape(-1, window * window, c1)
            x2w = window_partition(x2.reshape(b2, t2 * h, w, c2), window)
            x2w = x2w.reshape(-1, window * window, c2)
            x2w = nn.Dense(self.dim1, kernel_init=trunc_init, name="pre")(x2w)
            yw = CVAModule(
                self.dim1, self.num_heads, window=window,
                attn_drop=self.attn_drop, drop_path_rate=self.drop_path_rate,
                kind=self.cva_kind, name="cva",
            )(x1w, x2w, deterministic)
            # '(b n) ws c -> b (n ws) c' with b = B1  (``:285``)
            y = yw.reshape(b1, -1, c1)
            rng = self.make_rng("dropout") if not deterministic and self.drop_path_rate > 0 else None
            x1 = x1 + drop_path(y, self.drop_path_rate, deterministic, rng)

        if not deterministic:
            fm = fused_mlp_tail_train(self, x1, self.dim1, self.drop_path_rate,
                                      self.drop)
            if fm is not None:
                return fm, out
        fused = fused_mlp_tail(self, x1, self.dim1, self.mlp_ratio, deterministic)
        if fused is not None:
            return fused, out
        y = Mlp(int(self.dim1 * self.mlp_ratio), self.dim1, self.drop, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x1), deterministic
        )
        rng = self.make_rng("dropout") if not deterministic and self.drop_path_rate > 0 else None
        return x1 + drop_path(y, self.drop_path_rate, deterministic, rng), out


class PlainBlockPair(nn.Module):
    """Scan body: one (shifted, unshifted) pair of plain Swin blocks.

    The reference alternates shift/no-shift starting from the shifted block at
    depth index 1 (``multiTemporalViewEncoder.py:407``: shift uses *view1's* window
    size for every view — reference quirk preserved via ``shift_size``).
    Stacking identical pairs under ``nn.scan`` compiles the body once instead of
    once per depth — the deep stage-3 (17 plain blocks per view) dominates compile
    time otherwise.
    """

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int
    shift_size: int
    temporal_dim: int
    drop: float = 0.0
    attn_drop: float = 0.0
    deterministic: bool = True
    pre_windowed: bool = False

    @nn.compact
    def __call__(self, x, dp_rates):
        fused = self._fused_pair(x)
        if fused is not None:
            return fused, None
        kw = dict(
            dim=self.dim, input_resolution=self.input_resolution,
            num_heads=self.num_heads, window_size=self.window_size,
            temporal_dim=self.temporal_dim, drop=self.drop, attn_drop=self.attn_drop,
        )
        x = SwinBlock(shift_size=self.shift_size, name="shifted", **kw)(
            x, self.deterministic, dp_rates[0], pre_windowed=self.pre_windowed
        )
        x = SwinBlock(shift_size=0, name="plain", **kw)(
            x, self.deterministic, dp_rates[1], pre_windowed=self.pre_windowed
        )
        return x, None

    def _fused_pair(self, x):
        """Whole-PAIR kernel dispatch (``ops/pallas/swin_pair.py``): both
        blocks of the scan step in one launch with the shift reassembly done
        in VMEM — deletes the two shift gathers and the inter-kernel HBM
        round-trip.  Returns None (XLA / per-block path) unless eligible:
        inference, window-domain unpadded carry, shifted pair, gate on
        (MUMPY_PAIR_FUSION; ab_bench token ``pairfuse``)."""
        if not (self.deterministic and self.pre_windowed
                and pallas_pair.pair_fusion_enabled()
                and not self.is_initializing()
                and pallas_sb.attention_mode() != "off"):
            return None
        h, w = self.input_resolution
        window, shift = self.window_size, self.shift_size
        if min(h, w) <= window:
            window, shift = min(h, w), 0
        n = window * window
        if shift <= 0 or x.shape[1] != n:  # padded carry / unshifted pair
            return None
        gh, gw = self.temporal_dim * h, w
        nwh, nww = gh // window, gw // window
        params = self.variables.get("params", {})
        if "shifted" not in params or "plain" not in params:
            return None
        fc1 = params["shifted"]["mlp"]["fc1"]["kernel"]
        if not pallas_pair.pair_supported(
                self.dim, fc1.shape[-1], n, nwh * nww, fc1.dtype.itemsize):
            return None

        def compute_prepared():
            def wdict(sub):
                v = params[sub]
                return {
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

            bias_s = rel_pos_bias(
                params["shifted"]["attn"]["relative_position_bias_table"],
                window, window)
            bias_p = rel_pos_bias(
                params["plain"]["attn"]["relative_position_bias_table"],
                window, window)
            mask = shifted_window_mask(gh, gw, window, shift)
            mb_s = mask[:, None].astype(bias_s.dtype) + bias_s[None]
            return pallas_pair.prepare_pair(
                wdict("shifted"), wdict("plain"), mb_s, bias_p[None],
                wdtype=fc1.dtype)

        if self.has_variable("prepared", "pair"):
            prepared = self.get_variable("prepared", "pair")
        elif self.is_mutable_collection("prepared"):
            prepared = self.variable("prepared", "pair", compute_prepared).value
        else:
            prepared = compute_prepared()
        return pallas_pair.fused_pair_prepared(
            x, prepared, heads=self.num_heads, w=window, s=shift,
            nwh=nwh, nww=nww,
            interpret=pallas_sb.attention_mode() == "interpret")


class ThreeViewStages(nn.Module):
    """The 4-stage cross-view pyramid (``multiTemporalViewEncoder.py:489-571``).

    Returns the final view tokens plus, per stage, the three views' tokens after the
    stage's last block (pre-downsample) for the decoder skip path (``:531-538``).
    """

    cfg: MumpyConfig

    @nn.compact
    def __call__(self, views: List[jnp.ndarray], deterministic: bool = True):
        cfg = self.cfg
        vcfgs = cfg.views
        depths = vcfgs[2].depths  # max depths drive the dpr schedule (``:542,553``)
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(depths))

        # Window-domain carry eligibility: at inference with fused-block kernels
        # on, a view's plain-block stack keeps window-major layout as the scan
        # carry — one gather per shifted-layout change instead of the
        # reverse+roll+partition chain around every block (launch-bound model).
        param_itemsize = None
        if (
            deterministic
            and not self.is_initializing()
            and pallas_sb.attention_mode() != "off"
        ):
            leaves = jax.tree_util.tree_leaves(self.variables.get("params", {}))
            if leaves:
                param_itemsize = leaves[0].dtype.itemsize

        stage_outputs = []
        x = list(views)
        for s in range(4):
            res = vcfgs[0].input_resolution[s]
            dp0 = float(dpr[sum(depths[:s])])
            # block 0 — CVA chain: view3 -> view2 -> view1 (``:345-349``)
            blk3 = CrossSwinBlock(
                vcfgs[2].hidden_size[s], vcfgs[2].hidden_size[s], res,
                vcfgs[2].num_heads[s], window_size=vcfgs[2].window_size,
                drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                drop_path_rate=dp0, last_view=True,
                name=f"stage{s}_cross_view3",
            )
            blk2 = CrossSwinBlock(
                vcfgs[1].hidden_size[s], vcfgs[2].hidden_size[s], res,
                vcfgs[1].num_heads[s], window_size=vcfgs[1].window_size,
                drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                drop_path_rate=dp0, cva_kind=cfg.cva_kind,
                name=f"stage{s}_cross_view2",
            )
            blk1 = CrossSwinBlock(
                vcfgs[0].hidden_size[s], vcfgs[1].hidden_size[s], res,
                vcfgs[0].num_heads[s], window_size=vcfgs[0].window_size,
                drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                drop_path_rate=dp0, cva_kind=cfg.cva_kind,
                name=f"stage{s}_cross_view1",
            )
            x[2], out2 = blk3(x[2], x[2], deterministic)
            x[1], out1 = blk2(x[1], out2, deterministic)
            x[0], _ = blk1(x[0], out1, deterministic)

            # blocks 1..d_v-1 — per-view plain Swin blocks, scanned in pairs
            for v in range(3):
                d_v = vcfgs[v].depths[s]
                n_plain = d_v - 1
                if n_plain <= 0:
                    continue
                rates = dpr[sum(depths[:s]) + 1 : sum(depths[:s]) + d_v]
                n_pairs, rem = n_plain // 2, n_plain % 2
                # reference quirk: every view shifts by *view1's* window size
                # (``multiTemporalViewEncoder.py:407,421,435``)
                shift = vcfgs[0].window_size // 2
                hs = vcfgs[v].hidden_size[s]
                wclamp = vcfgs[v].window_size
                if min(res) <= wclamp:
                    wclamp = min(res)
                # eligibility must agree exactly with SwinBlock's own check
                # (swin.py asserts if a window-layout carry reaches the XLA
                # path), so read the REAL fc1 kernel of this stack's blocks
                # instead of re-deriving mlp width / dtype from assumptions
                use_wd = False
                if param_itemsize is not None:
                    p = self.variables["params"]
                    name = (f"stage{s}_pairs_view{v + 1}" if n_plain > 1
                            else f"stage{s}_last_view{v + 1}")
                    sub = p.get(name, {})
                    if n_plain > 1:
                        sub = sub.get("shifted", {})
                    fc1 = sub.get("mlp", {}).get("fc1", {}).get("kernel")
                    use_wd = fc1 is not None and pallas_sb.supported(
                        hs, fc1.shape[-1], wclamp * wclamp, fc1.dtype.itemsize
                    )
                if use_wd:
                    t_v = vcfgs[v].temporal_dim
                    gh, gw = t_v * res[0], res[1]
                    x[v] = partition_tokens(x[v], gh, gw, wclamp, 0)
                    # padded carry: sublane-round the window rows ONCE per
                    # stack so the fused kernel's per-block (pad, slice) pair
                    # collapses into this pad and the slice below.  Measured
                    # and REJECTED at batch 32 (interleaved: 315.8 vs 317.7
                    # f/s): XLA already fuses the 49->56 pad/slice into the
                    # custom call's operand copies, while the padded carry
                    # makes the shift gathers and kernel I/O 14% bigger.
                    # Default OFF; MUMPY_PADDED_CARRY=1 re-enables (ab_bench
                    # default variants run flat; parity held either way).
                    n_wd = wclamp * wclamp
                    npad_wd = -(-n_wd // 8) * 8
                    if os.environ.get("MUMPY_PADDED_CARRY", "0") in ("0", "off"):
                        npad_wd = n_wd
                    if npad_wd != n_wd:
                        x[v] = jnp.pad(
                            x[v], ((0, 0), (0, npad_wd - n_wd), (0, 0)))
                if n_pairs > 0:
                    # remat the scan body: O(1) activation memory over the deep
                    # stage at the cost of one extra forward under grad.  Only on
                    # the training path — checkpoint barriers restrict XLA fusion,
                    # which pure inference should not pay for.
                    if cfg.remat_policy not in ("full", "dots"):
                        raise ValueError(
                            f"remat_policy must be 'full' or 'dots', got "
                            f"{cfg.remat_policy!r}"
                        )
                    # when the custom-VJP train kernel handles this stack, its
                    # backward recomputes the block from the saved input, so
                    # scan-body remat is redundant for memory and only adds
                    # recompute of the layout ops around the kernel.
                    # Interleaved A/B at the DVI recipe (scripts/train_bench
                    # .py, PERF.md): remat-off + kernel 215.8 ms/step vs
                    # full-remat 221.6 — and remat-off without the kernel
                    # OOMs, i.e. the kernel pays for its own memory.  The
                    # eligibility lookup mirrors SwinBlock's use_fused_train
                    # gate (same fc1-dtype source); ineligible stacks (c too
                    # wide, dropout on, MUMPY_FUSED_TRAIN=off) keep remat.
                    kernel_owns_memory = False
                    if (not deterministic and not self.is_initializing()
                            and pallas_sbv.train_mode() != "off"
                            and pallas_sbv.train_site_enabled("block")):
                        p = self.variables.get("params", {})
                        name = (f"stage{s}_pairs_view{v + 1}" if n_plain > 1
                                else f"stage{s}_last_view{v + 1}")
                        sub = p.get(name, {})
                        if n_plain > 1:
                            sub = sub.get("shifted", {})
                        fc1 = sub.get("mlp", {}).get("fc1", {}).get("kernel")
                        kernel_owns_memory = (
                            fc1 is not None and pallas_sbv.train_supported(
                                vcfgs[v].hidden_size[s], fc1.shape[-1],
                                wclamp * wclamp, fc1.dtype.itemsize,
                                cfg.drop_rate, cfg.attn_drop_rate,
                            ))
                    use_remat = (cfg.remat and not deterministic
                                 and not kernel_owns_memory)
                    if use_remat and cfg.remat_policy == "dots":
                        body = nn.remat(
                            PlainBlockPair,
                            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                        )
                    elif use_remat:
                        body = nn.remat(PlainBlockPair)
                    else:
                        body = PlainBlockPair
                    # inference: fully unroll the scan — per-iteration DYNAMIC
                    # slices of the stacked params/prepared operands become
                    # static leading-dim slices (zero-copy views into the
                    # stacked arrays), removing ~the per-block launch overhead
                    # that dominated the fused path.  Training keeps the rolled
                    # scan (one compiled body + remat).
                    unroll = (n_pairs if deterministic or cfg.train_scan_unroll
                              else 1)
                    ScannedPairs = nn.scan(
                        body,
                        variable_axes={"params": 0, "prepared": 0},
                        split_rngs={"params": True, "dropout": True},
                        in_axes=0,
                        length=n_pairs,
                        unroll=unroll,
                    )
                    pair_rates = jnp.asarray(
                        rates[: 2 * n_pairs].reshape(n_pairs, 2), jnp.float32
                    )
                    x[v], _ = ScannedPairs(
                        dim=vcfgs[v].hidden_size[s], input_resolution=res,
                        num_heads=vcfgs[v].num_heads[s],
                        window_size=vcfgs[v].window_size, shift_size=shift,
                        temporal_dim=vcfgs[v].temporal_dim,
                        drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                        deterministic=deterministic, pre_windowed=use_wd,
                        name=f"stage{s}_pairs_view{v + 1}",
                    )(x[v], pair_rates)
                if rem:
                    x[v] = SwinBlock(
                        vcfgs[v].hidden_size[s], res, vcfgs[v].num_heads[s],
                        window_size=vcfgs[v].window_size, shift_size=shift,
                        drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                        drop_path_rate=float(rates[-1]),
                        temporal_dim=vcfgs[v].temporal_dim,
                        name=f"stage{s}_last_view{v + 1}",
                    )(x[v], deterministic, pre_windowed=use_wd)
                if use_wd:
                    x[v] = unpartition_tokens(x[v][:, :n_wd, :], gh, gw,
                                              wclamp, 0)

            stage_outputs.append(list(x))
            if s < 3:
                for v in range(3):
                    grid = (vcfgs[v].temporal_dim * res[0], res[1])
                    x[v] = PatchMerging(
                        vcfgs[v].hidden_size[s], grid, name=f"stage{s}_merge_view{v + 1}"
                    )(x[v])
        return x, stage_outputs


class GlobalVitBody(nn.Module):
    """Scan body for the 12-layer global temporal ViT (``:657-669,741``)."""

    dim: int
    num_heads: int
    mlp_dim: int
    drop: float = 0.0
    deterministic: bool = True
    time_major: bool = False

    @nn.compact
    def __call__(self, x, dp_rate):
        x = VitBlock(
            self.dim, self.num_heads, self.mlp_dim, drop=self.drop, name="block"
        )(x, self.deterministic, dp_rate, time_major=self.time_major)
        return x, None


def merge_views_along_channel_axis(
    tokens: List[jnp.ndarray], temporal_dims: Tuple[int, ...]
) -> jnp.ndarray:
    """(B, T_i * n, C_i) or (B, T_i, n, C_i) views -> (B, maxT, n, sum C_i)
    (``multiTemporalViewEncoder.py:710-718``)."""
    max_t = max(temporal_dims)
    xs = []
    for t_dim, x in zip(temporal_dims, tokens):
        if x.ndim == 3:
            b, l, c = x.shape
            x = x.reshape(b, t_dim, l // t_dim, c)
        else:
            b, tt, n, c = x.shape
            x = x.reshape(b, t_dim, (tt * n) // t_dim, c)
        xs.append(jnp.tile(x, (1, max_t // x.shape[1], 1, 1)))
    return jnp.concatenate(xs, axis=-1)


class MumpyEncoder(nn.Module):
    """Full encoder: FAF + tokenize + stages + global temporal ViT
    (``multiTemporalViewEncoder.py:672-746``, wrapper ``models/encoder/encoder.py:6-18``).

    Input: clip (B, T, H, W, 3) normalized.
    Returns: feats (B, 7, 7, 2304)-like, per-stage view tokens, ffinfo (B, H, W, 9).
    """

    cfg: MumpyConfig

    @nn.compact
    def __call__(self, clip, deterministic: bool = True):
        cfg = self.cfg
        # frequency branch on the center frame (``:734`` selects frame index 1)
        ffinfo = faf(clip[:, 1])

        views = []
        for v, vc in enumerate(cfg.views):
            tok = PatchEmbed3D(vc.hidden_size[0], vc.patch_size, name=f"tokenize_view{v + 1}")(clip)
            # align temporal dim: fold time into tokens (``:701-708``)
            b, t, n, c = tok.shape
            views.append(tok.reshape(b, t * n, c))

        x, stage_outputs = ThreeViewStages(cfg, name="stages")(views, deterministic)

        merged = merge_views_along_channel_axis(x, cfg.input_token_temporal_dims)
        merged = nn.Dense(
            cfg.global_encoder.hidden_size, kernel_init=trunc_init, name="globalembedding"
        )(merged)  # (B, maxT, n, 768)

        b, t, n, c = merged.shape
        # TIME-MAJOR layout for the specialized n=3 whole-layer kernel
        # (ops/pallas/vit3.py): the scan carry is three full-width (B*n, C)
        # temporal slabs, so the 12-layer stack runs with zero transposes and
        # the final channel concat is a lane concat.  Off (token-major) when
        # training or when the kernel is gated off.
        time_major = (
            deterministic
            and t == 3
            and pallas_sb.attention_mode() != "off"
            and fused_site_enabled("vit3")
        )
        if time_major:
            g = merged.transpose(1, 0, 2, 3).reshape(t, b * n, c)
        else:
            # vmap over spatial tokens == fold tokens into batch (``:741``)
            g = merged.transpose(0, 2, 1, 3).reshape(b * n, t, c)
        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.global_encoder.num_layers)
        ScannedVit = nn.scan(
            GlobalVitBody,
            variable_axes={"params": 0, "prepared": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=0,
            length=cfg.global_encoder.num_layers,
            # unrolled at inference for the same reason as the block pairs:
            # static slices of stacked layer params are free
            unroll=(cfg.global_encoder.num_layers
                    if deterministic or cfg.train_scan_unroll else 1),
        )
        g, _ = ScannedVit(
            dim=c, num_heads=cfg.global_encoder.num_heads,
            mlp_dim=cfg.global_encoder.mlp_dim, drop=cfg.drop_rate,
            deterministic=deterministic, time_major=time_major,
            name="global_blocks",
        )(g, jnp.asarray(dpr, jnp.float32))
        if time_major:
            # concat temporal slices along channels (``:745``) — already slabs
            feats = jnp.concatenate([g[i] for i in range(t)], axis=-1)
            feats = feats.reshape(b, n, t * c)
        else:
            g = g.reshape(b, n, t, c)
            # concat temporal slices along channels (``:745``)
            g = g.transpose(0, 2, 1, 3)  # (B, T, n, C)
            feats = jnp.concatenate([g[:, i] for i in range(t)], axis=-1)  # (B, n, T*C)

        # tokens -> spatial map (``models/encoder/encoder.py:16-17``)
        side = cfg.views[0].input_resolution[-1][0]
        feats = feats.reshape(b, side, side, t * c)
        return feats, stage_outputs, ffinfo
