"""Port reference PyTorch checkpoints (``encoder_{e}.pt`` / ``decoder_{e}.pt``) to
this framework's flax parameter tree.

Layout conventions bridged here:

* torch Linear ``weight`` is (out, in) -> flax Dense kernel (in, out): transpose.
* torch Conv2d ``weight`` is (O, I, kh, kw) -> flax Conv (kh, kw, I, O).
* depthwise Conv2d (groups=C) (C, 1, kh, kw) -> (kh, kw, 1, C).
* tokenizer Conv3d (O, 3, t, ph, pw) -> our PatchEmbed3D Dense kernel
  (3*t*ph*pw, O) with input flattened in (c, t, ph, pw) order
  (see ``PatchEmbed3D``: patch dims are flattened in exactly that order).
* decoder Conv3d temporal squeeze (O, C, T, 1, 1) -> TemporalSqueeze Dense
  (T*C, O) with input flattened (t, c)-major (see ``TemporalSqueeze``).
* ``relative_position_index`` buffers are recomputed statically, not ported.

The reference's ``strict=False`` partial loads (``modelFactory.py:70-71``) map to
``allow_missing=True``: unmatched torch keys are reported, unmatched flax params
keep their initialization.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util

__all__ = ["port_state_dicts", "encoder_key_map", "decoder_key_map"]


def _t(w):  # torch tensor -> numpy
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def _linear(w):
    return _t(w).T


def _conv2d(w):
    return _t(w).transpose(2, 3, 1, 0)


def _dwconv2d(w):
    # torch (C, 1, kh, kw) -> flax (kh, kw, 1, C)
    return _t(w).transpose(2, 3, 1, 0)


def _conv3d_patch(w):
    # (O, C, t, ph, pw) -> ((C, t, ph, pw) flattened, O)
    a = _t(w)
    o = a.shape[0]
    return a.reshape(o, -1).T


def _conv3d_temporal(w):
    # (O, C, T, 1, 1) -> ((T, C) flattened t-major, O)
    a = _t(w)[:, :, :, 0, 0]  # (O, C, T)
    a = a.transpose(2, 1, 0)  # (T, C, O)
    return a.reshape(-1, a.shape[-1])


DEFAULT_DEPTHS = (2, 2, 18, 2)  # view3/max depths (``modelFactory.py:43``)
VIEW_DEPTHS = ((2, 2, 6, 2), (2, 2, 18, 2), (2, 2, 18, 2))


def _plain_block_slot(stage: int, view: int, i: int, view_depths=VIEW_DEPTHS):
    """Locate plain block i (1..d-1) in the scanned layout.

    Returns (module_name, sub_name, pair_index).  The stage's plain blocks form
    ``n_pairs`` scanned (shifted, plain) pairs plus an optional trailing shifted
    block (see ``ThreeViewStages``).
    """
    d = view_depths[view - 1][stage]
    n_plain = d - 1
    n_pairs = n_plain // 2
    rem = n_plain % 2
    j = i - 1  # 0-based plain index; shifts alternate [s, 0, s, 0, ...]
    if rem and j == n_plain - 1:
        return (f"stage{stage}_last_view{view}", None, None)
    pair = j // 2
    sub = "shifted" if j % 2 == 0 else "plain"
    assert pair < n_pairs
    return (f"stage{stage}_pairs_view{view}", sub, pair)


def encoder_key_map(torch_key: str, view_depths=VIEW_DEPTHS):
    """Map one reference encoder state_dict key -> (flax path tuple, converter,
    stack_index) where ``stack_index`` is the leading-axis slot for scanned
    (stacked) parameters or None.

    Reference module tree: ``base.<...>`` from ``Encoder`` wrapping
    ``ThreeViewSwinTransformer`` (``models/encoder/encoder.py:6-18``).
    Returns None for buffers / unknown keys.
    """
    k = torch_key
    k = re.sub(r"^(module\.)?", "", k)
    k = re.sub(r"^base\.", "", k)
    if "relative_position_index" in k or "attn_mask" in k:
        return None

    def flat(out):
        return None if out is None else (out[0], out[1], None)

    # tokenizer: tokenize.project{v}.weight/bias, tokenize.norm{v}...
    m = re.match(r"tokenize\.project(\d)\.(weight|bias)", k)
    if m:
        v, wb = m.groups()
        path = ("encoder", f"tokenize_view{v}", "proj")
        return (path + (("kernel",) if wb == "weight" else ("bias",))), (
            _conv3d_patch if wb == "weight" else _t
        ), None
    m = re.match(r"tokenize\.norm(\d)\.(weight|bias)", k)
    if m:
        v, wb = m.groups()
        return ("encoder", f"tokenize_view{v}", "norm",
                "scale" if wb == "weight" else "bias"), _t, None

    # global embedding / scanned global blocks
    m = re.match(r"globalembedding\.(weight|bias)", k)
    if m:
        wb = m.group(1)
        return ("encoder", "globalembedding",
                "kernel" if wb == "weight" else "bias"), (
            _linear if wb == "weight" else _t
        ), None
    m = re.match(r"globalblocks\.blocks\.(\d+)\.(.*)", k)
    if m:
        i, rest = m.groups()
        out = _vit_block_map(("encoder", "global_blocks", "block"), rest)
        return None if out is None else (out[0], out[1], int(i))

    # stages: layers.layers.{s}.blocks.{i}....
    m = re.match(r"layers\.layers\.(\d+)\.blocks\.(\d+)\.(.*)", k)
    if m:
        s, i, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        m2 = re.match(r"block(\d)\.(.*)", rest)
        if not m2:
            return None
        v, rest2 = int(m2.group(1)), m2.group(2)
        if i == 0:
            base = ("encoder", "stages", f"stage{s}_cross_view{v}")
            return flat(_cross_block_map(base, rest2))
        if i >= view_depths[v - 1][s]:
            return None  # reference nn.Identity placeholder for shallow views
        mod, sub, pair = _plain_block_slot(s, v, i, view_depths)
        base = ("encoder", "stages", mod) + ((sub,) if sub else ())
        out = _swin_block_map(base, rest2)
        return None if out is None else (out[0], out[1], pair)

    # patch merging: layers.layers.{s}.downsample.downsample{v}.(norm|reduction)
    m = re.match(r"layers\.layers\.(\d+)\.downsample\.downsample(\d)\.(norm|reduction)\.(weight|bias)", k)
    if m:
        s, v, mod, wb = int(m.group(1)), m.group(2), m.group(3), m.group(4)
        base = ("encoder", "stages", f"stage{s}_merge_view{v}")
        if mod == "norm":
            return base + ("norm", "scale" if wb == "weight" else "bias"), _t, None
        return base + ("reduction", "kernel"), _linear, None
    return None


def _norm_map(base, name, wb):
    return base + (name, "scale" if wb == "weight" else "bias"), _t


def _dense_map(base, name, wb):
    return base + (name, "kernel" if wb == "weight" else "bias"), (
        _linear if wb == "weight" else _t
    )


def _attn_map(base, rest):
    m = re.match(r"(qkv|proj)\.(weight|bias)", rest)
    if m:
        return _dense_map(base, m.group(1), m.group(2))
    if rest == "relative_position_bias_table":
        return base + ("relative_position_bias_table",), _t
    return None


def _mlp_map(base, rest):
    m = re.match(r"(fc1|fc2)\.(weight|bias)", rest)
    if m:
        return _dense_map(base, m.group(1), m.group(2))
    return None


def _vit_block_map(base, rest):
    m = re.match(r"(norm1|norm2)\.(weight|bias)", rest)
    if m:
        return _norm_map(base, m.group(1), m.group(2))
    m = re.match(r"attn\.(qkv|proj)\.(weight|bias)", rest)
    if m:
        return _dense_map(base, m.group(1), m.group(2))
    m = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest)
    if m:
        return _dense_map(base + ("mlp",), m.group(1), m.group(2))
    return None


def _swin_block_map(base, rest):
    m = re.match(r"(norm1|norm2)\.(weight|bias)", rest)
    if m:
        return _norm_map(base, m.group(1), m.group(2))
    m = re.match(r"attn\.(.*)", rest)
    if m:
        return _attn_map(base + ("attn",), m.group(1))
    m = re.match(r"mlp\.(.*)", rest)
    if m:
        return _mlp_map(base + ("mlp",), m.group(1))
    return None


def _cross_block_map(base, rest):
    out = _swin_block_map(base, rest)
    if out is not None:
        return out
    m = re.match(r"pre\.(weight|bias)", rest)
    if m:
        return _dense_map(base, "pre", m.group(1))
    m = re.match(r"cva\.crossattn\.(.*)", rest)
    if m:
        return _cva_map(base + ("cva", "crossattn"), m.group(1))
    return None


def _cva_map(base, rest):
    # SwinDAttention params (``deformableAttention.py:253-309``)
    m = re.match(r"proj_(q|k|v|out)\.(weight|bias)", rest)
    if m:
        which, wb = m.groups()
        # torch 1x1 Conv2d (O, I, 1, 1) -> dense (I, O)
        conv = lambda w: _t(w)[:, :, 0, 0].T
        return base + (f"proj_{which}", "kernel" if wb == "weight" else "bias"), (
            conv if wb == "weight" else _t
        )
    m = re.match(r"conv_offset\.0\.(weight|bias)", rest)
    if m:
        wb = m.group(1)
        return base + ("offset_dwconv", "kernel" if wb == "weight" else "bias"), (
            _dwconv2d if wb == "weight" else _t
        )
    m = re.match(r"conv_offset\.1\.norm\.(weight|bias)", rest)
    if m:
        return _norm_map(base, "offset_norm", m.group(1))
    m = re.match(r"conv_offset\.3\.weight", rest)
    if m:
        return base + ("offset_proj", "kernel"), _conv2d
    return None


def decoder_key_map(torch_key: str):
    """Map one reference decoder state_dict key -> (flax path, converter, None)."""
    out = _decoder_key_map(torch_key)
    return None if out is None else (out[0], out[1], None)


def _decoder_key_map(torch_key: str):
    k = re.sub(r"^(module\.)?", "", torch_key)

    m = re.match(r"rgb_decoder_(\d)\.0\.(weight|bias)", k)
    if m:
        s, wb = m.groups()
        return ("decoder", f"rgb_decoder_{s}", "proj",
                "kernel" if wb == "weight" else "bias"), (
            _conv3d_temporal if wb == "weight" else _t
        )
    m = re.match(r"rgb_decoder_(\d)\.1\.(weight|bias)", k)
    if m:
        s, wb = m.groups()
        return _norm_map(("decoder", f"rgb_decoder_{s}"), "gn", wb)

    m = re.match(r"decoder_frequency_(\d)\.1\.(weight|bias)", k)
    if m:
        s, wb = m.groups()
        return ("decoder", f"decoder_frequency_{s}", "conv",
                "kernel" if wb == "weight" else "bias"), (
            _conv2d if wb == "weight" else _t
        )
    m = re.match(r"decoder_frequency_(\d)\.2\.(weight|bias)", k)
    if m:
        s, wb = m.groups()
        return _norm_map(("decoder", f"decoder_frequency_{s}"), "gn", wb)

    m = re.match(r"decoder_(\d)\.0\.(weight|bias)", k)
    if m:
        s, wb = m.groups()
        return ("decoder", f"decoder_{s}", "conv",
                "kernel" if wb == "weight" else "bias"), (
            _conv2d if wb == "weight" else _t
        )
    m = re.match(r"decoder_(\d)\.1\.(weight|bias)", k)
    if m:
        s, wb = m.groups()
        return _norm_map(("decoder", f"decoder_{s}"), "gn", wb)

    m = re.match(r"gcm(\d)\.(conv_l1|conv_l2|conv_r1|conv_r2)\.(weight|bias)", k)
    if m:
        g, conv, wb = m.groups()
        return ("decoder", f"gcm{g}", conv,
                "kernel" if wb == "weight" else "bias"), (
            _conv2d if wb == "weight" else _t
        )
    m = re.match(r"seb(\d)\.conv\.(weight|bias)", k)
    if m:
        s, wb = m.groups()
        return ("decoder", f"seb{s}", "conv",
                "kernel" if wb == "weight" else "bias"), (
            _conv2d if wb == "weight" else _t
        )
    m = re.match(r"final_out\.(weight|bias)", k)
    if m:
        wb = m.group(1)
        return ("decoder", "final_out",
                "kernel" if wb == "weight" else "bias"), (
            _conv2d if wb == "weight" else _t
        )
    return None


def port_state_dicts(
    encoder_sd: Dict, decoder_sd: Dict, flax_params: Dict, allow_missing: bool = True
) -> Tuple[Dict, Dict]:
    """Overlay torch state dicts onto a flax param tree.

    Returns (new_params, report) where report lists unmatched torch keys and
    untouched flax paths.
    """
    flat = dict(traverse_util.flatten_dict(flax_params))
    flat = {k: np.asarray(v) for k, v in flat.items()}
    touched = set()
    unmatched = []
    n_buffers = 0  # intentionally-dropped torch buffers (recomputed statically)
    for sd, mapper in ((encoder_sd, encoder_key_map), (decoder_sd, decoder_key_map)):
        for k, v in sd.items():
            out = mapper(k)
            if out is None:
                if "relative_position_index" not in k and "attn_mask" not in k:
                    unmatched.append(k)
                else:
                    n_buffers += 1
                continue
            path, conv, idx = out
            if path not in flat:
                unmatched.append(k)
                continue
            arr = conv(v).astype(np.float32)
            if idx is None:
                if arr.shape != flat[path].shape:
                    raise ValueError(f"shape mismatch for {k} -> {path}: "
                                     f"{arr.shape} vs {flat[path].shape}")
                flat[path] = arr
            else:
                # scanned (stacked) parameter: write one leading-axis slot
                if arr.shape != flat[path].shape[1:]:
                    raise ValueError(f"shape mismatch for {k} -> {path}[{idx}]: "
                                     f"{arr.shape} vs {flat[path].shape[1:]}")
                flat[path] = flat[path].copy()
                flat[path][idx] = arr
            touched.add(path)
    untouched = [p for p in flat if p not in touched]
    if not allow_missing and (unmatched or untouched):
        raise ValueError(f"unmatched={unmatched[:5]} untouched={untouched[:5]}")
    report = {"unmatched_torch_keys": unmatched, "untouched_flax_paths": untouched,
              "dropped_buffers": n_buffers}
    return traverse_util.unflatten_dict(flat), report


def load_pretrained(
    params: Dict, path: str, verbose: bool = True,
    min_matched_frac: float = 0.5,
) -> Dict:
    """strict=False-style warm start from a torch checkpoint file — the
    counterpart of the reference's ``load_model_weights(model, "../weights/
    weight.pth", strict=False)`` at model construction (``modelFactory.py:8-14,
    70-71``).

    Accepts a raw state_dict, a {"encoder": sd, "decoder": sd} pair, or a
    checkpoint with "state_dict"/"model" nesting.  DataParallel ``module.``
    prefixes (reference ``check_parallel``, ``utils/utils.py:156-176``; saved
    when ``ngpus>1``, ``train.py:290-292``) are stripped by the key maps.
    Keys that do not map (extra heads, ...) are skipped, but if fewer than
    ``min_matched_frac`` of the checkpoint's mappable keys match, this raises
    instead of silently warm-starting from (mostly) random init.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "encoder" in blob and "decoder" in blob:
        enc_sd, dec_sd = blob["encoder"], blob["decoder"]
    else:
        sd = blob.get("state_dict", blob.get("model", blob)) if isinstance(blob, dict) else blob
        enc_sd, dec_sd = sd, {}
    to_np = lambda d: {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                       for k, v in d.items()}
    new_params, report = port_state_dicts(to_np(enc_sd), to_np(dec_sd), params)
    n_unmatched = len(report["unmatched_torch_keys"])
    # fraction over mappable PARAMS only: intentionally-dropped buffers
    # (relative_position_index / attn_mask, recomputed statically) neither
    # count as matched nor inflate the denominator — a buffer-heavy checkpoint
    # with few real param matches must still trip the guard
    n_mappable = len(enc_sd) + len(dec_sd) - report["dropped_buffers"]
    n_matched = n_mappable - n_unmatched
    if n_mappable == 0 and (enc_sd or dec_sd):
        # all-buffer checkpoint: every key was a dropped buffer, zero params
        # ported — certainly the wrong file; don't report "success" at 0/0
        raise ValueError(
            f"load_pretrained({path!r}): checkpoint contains only "
            f"{report['dropped_buffers']} non-parameter buffers and no "
            f"mappable parameters — wrong checkpoint file"
        )
    if n_mappable and n_matched / n_mappable < min_matched_frac:
        raise ValueError(
            f"load_pretrained({path!r}): only {n_matched}/{n_mappable} mappable "
            f"checkpoint keys mapped onto the model (< {min_matched_frac:.0%}; "
            f"{report['dropped_buffers']} buffers excluded) — wrong checkpoint "
            f"format or architecture mismatch. First unmatched: "
            f"{report['unmatched_torch_keys'][:5]}"
        )
    if verbose:
        print(
            f"loaded {path}: {n_unmatched} torch keys skipped, "
            f"{len(report['untouched_flax_paths'])} flax params left at init"
        )
    return new_params
