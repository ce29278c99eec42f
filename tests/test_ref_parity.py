"""End-to-end parity against the ACTUAL reference implementation.

Unlike ``test_module_parity.py`` (which re-derives the torch math), these tests
import the real model code from ``/root/reference`` (via the ~60-line shims in
``tests/ref_shims/`` for timm/ml_collections and ``.cuda()`` no-op patches),
build the reference ``Encoder()``/``Decoder()`` with random weights, port the
real torch state_dicts through ``utils/weight_port.py``, and assert the JAX
forward reproduces the reference logits.  This machine-checks the quirk set the
round-1 review could only verify by code reading: the no-window-reverse CVA
residual (``multiTemporalViewEncoder.py:284``), the double CVA residual
(``:127-139``), the view-1-window shift (``:407``), the ``size//2.82`` DCT band
bound (``dct.py:66-68``), grid_sample semantics, and the decoder gating/wiring
(``decoder.py:183-225``) — plus proves ``weight_port`` against a real
torch-produced state_dict instead of a synthetic one.

Measured on the flagship 224^2 model: max |logit diff| = 2.3e-6 (f32).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference"
SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_shims")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference packages with shims + device patches installed."""
    sys.path.insert(0, SHIMS)
    sys.path.append(REF_ROOT)
    import torch

    saved = (torch.Tensor.cuda, torch.nn.Module.cuda)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        import models.factory.modelFactory as mf

        saved_load = mf.load_model_weights
        # the factory hard-loads ../weights/weight.pth (``modelFactory.py:70-71``)
        mf.load_model_weights = lambda model, path, strict=False: model
        import types

        import models.decoder.decoder as ref_decoder
        import models.encoder.encoder as ref_encoder
        import utils.loss as ref_loss

        yield types.SimpleNamespace(
            torch=torch, encoder=ref_encoder, decoder=ref_decoder, loss=ref_loss
        )
        mf.load_model_weights = saved_load
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = saved
        sys.path.remove(SHIMS)
        sys.path.remove(REF_ROOT)


def test_e2e_flagship_parity(ref):
    """Full flagship forward: reference torch logits == ported JAX logits."""
    torch = ref.torch
    torch.manual_seed(0)
    enc = ref.encoder.Encoder().eval()
    dec = ref.decoder.Decoder().eval()

    rng = np.random.default_rng(42)
    clip = rng.standard_normal((1, 3, 224, 224, 3)).astype(np.float32)
    xt = torch.from_numpy(clip).permute(0, 1, 4, 2, 3).contiguous()  # (B,T,C,H,W)
    with torch.no_grad():
        final_x, view_x, dct_x = enc(xt)
        out_t, _ = dec(final_x, view_x, dct_x)

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.utils.weight_port import port_state_dicts
    import mumpy_tpu.ops.pallas.swin_block as psb

    psb.set_mode("off")  # pure-XLA path for the CPU oracle comparison
    try:
        model = Mumpy(multiswin_config())
        # eval_shape-only init: the port overlays EVERY parameter (asserted
        # below), so materializing the random init would waste ~6 CPU-minutes
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 224, 224, 3))
        )["params"]
        params = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes
        )

        to_np = lambda d: {k: v.detach().numpy() for k, v in d.items()}
        ported, report = port_state_dicts(
            to_np(enc.base.state_dict()), to_np(dec.state_dict()), params
        )
        # the real reference state_dict maps completely in both directions
        assert report["unmatched_torch_keys"] == [], report["unmatched_torch_keys"][:8]
        assert report["untouched_flax_paths"] == [], report["untouched_flax_paths"][:8]

        fwd = jax.jit(lambda p, c: model.apply({"params": p}, c, deterministic=True))
        out_j = np.asarray(fwd(ported, jnp.asarray(clip)))
    finally:
        psb.set_mode(None)

    ref_logits = out_t.detach().numpy()[:, 0]  # (B, H, W)
    got = out_j[..., 0]
    d = np.abs(ref_logits - got)
    assert d.max() < 1e-4, f"max|d|={d.max():.3e} mean|d|={d.mean():.3e}"
    # the thresholded localization masks agree exactly
    np.testing.assert_array_equal(ref_logits > 0, got > 0)


def test_e2e_gradient_parity(ref):
    """Backward semantics vs the executed reference: the same train computation
    (softIoU + focal on one clip, ``train.py:107-116``) differentiated on both
    sides with ported weights, comparing a representative gradient set —
    tokenizer convs, plain/cross Swin blocks per view, rel-pos tables, the CVA
    offset conv (``F.grid_sample`` VJP at clamped/border sample points,
    ``deformableAttention.py:353-358``), global-ViT blocks, and decoder convs.

    The JAX side runs BOTH the pure-XLA path and the interpret-mode custom-VJP
    train kernels (whole-block / attn_ln / ln_mlp), so the kernels' hand-written
    backwards are checked against torch autograd end-to-end, not just against
    each other.  drop_path_rate=0 on the JAX side == torch ``.eval()`` (all
    dropout rates are 0 in the flagship recipe).
    """
    torch = ref.torch
    torch.manual_seed(0)
    enc = ref.encoder.Encoder().eval()
    dec = ref.decoder.Decoder().eval()

    rng = np.random.default_rng(123)
    clip = rng.standard_normal((1, 3, 224, 224, 3)).astype(np.float32)
    mask_np = (rng.uniform(size=(1, 224 * 224)) > 0.85).astype(np.float32)

    # --- reference: loss.backward() exactly as trainIter (``train.py:107-116``)
    xt = torch.from_numpy(clip).permute(0, 1, 4, 2, 3).contiguous()
    mt = torch.from_numpy(mask_np)
    final_x, view_x, dct_x = enc(xt)
    out_t, _ = dec(final_x, view_x, dct_x)
    out_flat = out_t.reshape(out_t.size()[0], -1)
    loss_t = torch.mean(ref.loss.softIoULoss()(mt, out_flat)) + torch.mean(
        ref.loss.WeightedFocalLoss()(mt, out_flat))
    loss_t.backward()

    # representative gradient set (torch key -> its module's .grad)
    enc_named = dict(enc.base.named_parameters())
    dec_named = dict(dec.named_parameters())
    keys = [
        ("enc", "tokenize.project1.weight"),
        ("enc", "tokenize.project3.weight"),
        ("enc", "layers.layers.0.blocks.0.block1.attn.qkv.weight"),  # cross
        ("enc", "layers.layers.0.blocks.0.block1.cva.crossattn.conv_offset.3.weight"),
        ("enc", "layers.layers.0.blocks.0.block1.cva.crossattn.proj_q.weight"),
        ("enc", "layers.layers.0.blocks.1.block1.attn.qkv.weight"),  # plain v1
        ("enc", "layers.layers.0.blocks.1.block1.attn.relative_position_bias_table"),
        ("enc", "layers.layers.2.blocks.5.block3.mlp.fc1.weight"),   # deep v3
        ("enc", "layers.layers.2.blocks.5.block3.attn.relative_position_bias_table"),
        ("enc", "globalembedding.weight"),
        ("enc", "globalblocks.blocks.3.attn.qkv.weight"),
        ("dec", "rgb_decoder_1.0.weight"),
        ("dec", "decoder_frequency_0.1.weight"),
        ("dec", "gcm1.conv_l1.weight"),
        ("dec", "seb1.conv.weight"),
        ("dec", "final_out.weight"),
    ]

    from mumpy_tpu.configs.model_config import multiswin_config
    from mumpy_tpu.models.mumpy import Mumpy
    from mumpy_tpu.train.losses import total_loss
    from mumpy_tpu.utils.weight_port import (
        decoder_key_map, encoder_key_map, port_state_dicts)
    import mumpy_tpu.ops.pallas.swin_block as psb
    import mumpy_tpu.ops.pallas.swin_block_vjp as vjp_mod
    from flax import traverse_util

    cfg = multiswin_config(drop_path_rate=0.0)
    model = Mumpy(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 224, 224, 3))
    )["params"]
    params = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    to_np = lambda d: {k: v.detach().numpy() for k, v in d.items()}
    ported, report = port_state_dicts(
        to_np(enc.base.state_dict()), to_np(dec.state_dict()), params)
    assert report["unmatched_torch_keys"] == []

    mask_j = jnp.asarray(mask_np)
    clip_j = jnp.asarray(clip)

    def loss_fn(p):
        logits = model.apply(
            {"params": p}, clip_j, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
        ).astype(jnp.float32)
        b = logits.shape[0]
        return total_loss(mask_j, logits[..., 0].reshape(b, -1))[0]

    def compare(grads_flat, label, rel_tol):
        gmax_all = {}
        for side, tk in keys:
            p = (enc_named if side == "enc" else dec_named)[tk]
            out = (encoder_key_map if side == "enc" else decoder_key_map)(tk)
            assert out is not None, tk
            path, conv, idx = out
            gt = conv(p.grad.detach())  # grads transform like params
            gj = np.asarray(grads_flat[path], np.float32)
            if idx is not None:
                gj = gj[idx]
            scale = max(np.abs(gt).max(), 1e-12)
            d = np.abs(gt - gj).max() / scale
            gmax_all[tk] = d
            assert d < rel_tol, (
                f"[{label}] grad mismatch {tk} -> {path}: rel max|d|={d:.3e} "
                f"(|g|max={scale:.3e})"
            )
        worst = max(gmax_all.items(), key=lambda kv: kv[1])
        print(f"[{label}] loss_j vs loss_t ok; worst grad rel|d| = "
              f"{worst[1]:.2e} at {worst[0]}")

    psb.set_mode("off")
    try:
        for label, mode, rel_tol in (("xla", "off", 2e-3),
                                     ("kernel", "interpret", 2e-3)):
            vjp_mod.set_train_mode(mode)
            loss_j, grads = jax.jit(jax.value_and_grad(loss_fn))(ported)
            np.testing.assert_allclose(
                float(loss_j), float(loss_t.detach()), rtol=1e-4,
                err_msg=label)
            compare(dict(traverse_util.flatten_dict(jax.device_get(grads))),
                    label, rel_tol)
            del grads
    finally:
        vjp_mod.set_train_mode(None)
        psb.set_mode(None)


def test_loss_parity(ref):
    """softIoULoss + WeightedFocalLoss vs the reference ``utils/loss.py``."""
    torch = ref.torch
    from mumpy_tpu.train.losses import focal_loss, soft_iou_loss

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((4, 1024)).astype(np.float32) * 3
    masks = (rng.uniform(size=(4, 1024)) > 0.7).astype(np.float32)

    lt, mt = torch.from_numpy(logits), torch.from_numpy(masks)
    with torch.no_grad():
        ref_iou = float(ref.loss.softIoULoss()(mt, lt))
        ref_focal = float(ref.loss.WeightedFocalLoss()(mt, lt))

    got_iou = float(soft_iou_loss(masks, logits))
    got_focal = float(focal_loss(masks, logits))
    np.testing.assert_allclose(got_iou, ref_iou, rtol=1e-5)
    np.testing.assert_allclose(got_focal, ref_focal, rtol=1e-5)


def test_randaugment_parity():
    """The reference's ACTIVE RandAugment ops (``utils/randaugment.py:515-576``:
    Identity, HFlip, VFlip, PsccAug), executed from the actual reference source
    on fixed PIL inputs, match ``data/augment.py``'s numpy forms pixel-exact —
    every PsccAug variant 0..7 (PIL ``rotate(expand=True)`` is counter-clockwise)
    and the ``np.random.randint(0, 7)`` never-variant-7 quirk."""
    import importlib.util

    from PIL import Image

    sys.path.insert(0, SHIMS)
    sys.path.append(REF_ROOT)
    cwd = os.getcwd()
    try:
        # the reference config resolves its palette/db-info via
        # ``osp.abspath('../')`` (``configs/davis/config.py:42``) — import
        # from inside the reference tree so those land on real files
        os.chdir(os.path.join(REF_ROOT, "configs"))
        import utils.randaugment as ra
        ra = importlib.reload(ra)  # in case a sibling module cached it
    finally:
        os.chdir(cwd)
        sys.path.remove(SHIMS)
        sys.path.remove(REF_ROOT)

    from mumpy_tpu.data.augment import _pscc

    rng = np.random.default_rng(5)
    # non-square frames catch any H/W axis mix-up in the rot90 forms
    frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(3)]
    mask = (rng.uniform(size=(48, 64)) > 0.7).astype(np.uint8) * 255
    pil_frames = [Image.fromarray(f) for f in frames]
    pil_mask = Image.fromarray(mask)

    # HFlip == a[:, ::-1]; VFlip == a[::-1] (ImageOps.mirror / .flip)
    out_imgs, out_mask = ra.HFlip((list(pil_frames), pil_mask), None)
    for got, src in zip(out_imgs, frames):
        np.testing.assert_array_equal(np.asarray(got), src[:, ::-1])
    np.testing.assert_array_equal(np.asarray(out_mask), mask[:, ::-1])

    out_imgs, out_mask = ra.VFlip((list(pil_frames), pil_mask), None)
    for got, src in zip(out_imgs, frames):
        np.testing.assert_array_equal(np.asarray(got), src[::-1])
    np.testing.assert_array_equal(np.asarray(out_mask), mask[::-1])

    # PsccAug: pin its internal np.random.randint and sweep all 8 variants
    saved = ra.np.random.randint
    try:
        for variant in range(8):
            ra.np.random.randint = lambda *a, _v=variant, **k: _v
            out_imgs, out_mask = ra.PsccAug((list(pil_frames), pil_mask), 0)
            for got, src in zip(out_imgs, frames):
                np.testing.assert_array_equal(
                    np.asarray(got), _pscc(src, variant),
                    err_msg=f"PsccAug image variant {variant}")
            np.testing.assert_array_equal(
                np.asarray(out_mask), _pscc(mask, variant),
                err_msg=f"PsccAug mask variant {variant}")
    finally:
        ra.np.random.randint = saved

    # the reference's variant draw is randint(0, 7) — exclusive high bound, so
    # variant 7 is unreachable in the live pipeline (``randaugment.py:516``)
    draws = {int(np.random.RandomState(s).randint(0, 7)) for s in range(200)}
    assert draws <= set(range(7))

    # the active augment_list is exactly {Identity x4, HFlip, VFlip, PsccAug}
    names = [op.__name__ for op, _, _ in ra.augment_list()]
    assert names == ["Identity"] * 4 + ["HFlip", "VFlip", "PsccAug"]
    # and the Double-strategy lists match what double_clip_augment draws from
    ns_names = [op.__name__ for op, _, _ in ra.none_shape_change_augment_list()]
    sc_names = [op.__name__ for op, _, _ in ra.shape_change_augment_list()]
    assert ns_names == ["HFlip", "VFlip", "PsccAug"]
    assert sc_names == ["RandomCrop", "RandomRotate", "OriginalRandomCrop",
                        "RandomScaleCrop"]


def test_measure_parity(tmp_path):
    """Our metric scorer vs the reference ``measure.py`` F1/IoU math, executed
    from the actual reference source (model-free numpy/PIL) on the same files —
    including the reference's ``sum(gt_mask + 1e-6)`` recall-denominator quirk
    (``measure.py:85``)."""
    import importlib.util

    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "ref_measure", os.path.join(REF_ROOT, "measure.py")
    )
    ref_measure = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_measure)

    from mumpy_tpu.utils.metrics import evaluate_image_pair

    rng = np.random.default_rng(9)
    for i in range(5):
        # blobs at a non-224 source size so the resize path is exercised too
        pred = (rng.uniform(size=(64, 80)) > 0.6).astype(np.uint8) * 255
        gt = (rng.uniform(size=(64, 80)) > 0.6).astype(np.uint8) * 255
        pp = str(tmp_path / f"pred{i}.png")
        gp = str(tmp_path / f"gt{i}.png")
        Image.fromarray(pred).save(pp)
        Image.fromarray(gt).save(gp)
        ref_f1, ref_iou = ref_measure.evaluate_image(pp, gp, (224, 224))
        got_f1, got_iou = evaluate_image_pair(pp, gp, (224, 224))
        np.testing.assert_allclose(got_f1, ref_f1, rtol=1e-9)
        np.testing.assert_allclose(got_iou, ref_iou, rtol=1e-9)
