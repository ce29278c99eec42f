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
