#!/usr/bin/env python
"""Inference entry point: generate localization masks (reference ``test.py``).

Loads a checkpoint, runs the jitted forward over the test split (single stream,
batch 1 by default), thresholds sigmoid at 0.5 and writes
``{frame:04d}_instance_00.png`` (0/255) under
``<results>/<model_name>/masks_<dataset>/<seq>/`` (``test.py:100-111``).

Unlike the reference (which forgets ``torch.no_grad``, ``test.py:77-111``), the
forward here is a jitted inference-only function.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mumpy_tpu.configs.args import build_configs, get_parser
from mumpy_tpu.configs.model_config import multiswin_config, tiny_config
from mumpy_tpu.data.dataset import ClipDataset, DataLoader
from mumpy_tpu.models.mumpy import Mumpy
from mumpy_tpu.train import checkpoint as ckpt_lib
from mumpy_tpu.train.optim import OptimConfig
from mumpy_tpu.train.trainer import create_train_state


def main():
    parser = get_parser()
    args = parser.parse_args()
    data_cfg, opt_cfg, loop_cfg = build_configs(args)
    model_cfg = tiny_config(args.imsize) if args.tiny else multiswin_config(args.imsize)

    model = Mumpy(model_cfg)
    # ABSTRACT state: eval_shape traces create_train_state on the host only —
    # no device compile, no init arrays.  Orbax restores real arrays straight
    # into the abstract target.  (Besides being faster, this matters on the
    # dev tunnel: the remote-compile window is per-process, and spending it
    # on model.init left the serving-forward compile hitting "Broken pipe".)
    state = jax.eval_shape(
        lambda rng: create_train_state(model_cfg, OptimConfig(), 1, rng),
        jax.random.PRNGKey(0),
    )
    model_dir = os.path.join(loop_cfg.results_dir, loop_cfg.model_name)
    restored = (
        ckpt_lib.load_epoch(model_dir, state, args.test_epoch)
        if args.test_epoch >= 0 else ckpt_lib.load_latest(model_dir, state)
    )
    if restored is not None:
        state = restored
        print(f"Loaded checkpoint from {model_dir}")
    else:
        print("WARNING: no checkpoint found; using random init")
        state = create_train_state(
            model_cfg, OptimConfig(), iter_max=1, rng=jax.random.PRNGKey(0)
        )
    # serving mode: capture kernel-ready fused-block operands once
    from mumpy_tpu.utils.serving import prepare_for_inference

    if args.bf16:
        # bf16 serving (the bench.py configuration): halves the resident
        # weight footprint and compiles the same program family bench.py
        # exercises.  The f32 master params stay in the checkpoint; masks are
        # thresholded on f32 sigmoid either way.  NOTE on this dev tunnel:
        # the f32 batch-6 serving compile reliably exceeds the remote-compile
        # HTTP window (~30 min -> "Broken pipe"), so the flagship drive uses
        # --bf16 -batch_size 32 (PERF.md "flagship accuracy drive").
        state = state.replace(params=jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, state.params))

    bs_example = max(1, args.batch_size)
    example = jnp.zeros(
        (bs_example, data_cfg.length_clip, args.imsize, args.imsize, 3), jnp.float32
    )
    variables = prepare_for_inference(model, {"params": state.params}, example)

    # data-parallel serving: shard the clip batch over every available chip
    # (the reference serves on one GPU at batch 1, ``test.py:41-58``)
    from mumpy_tpu.parallel.mesh import make_mesh
    from mumpy_tpu.utils.serving import make_serving_forward

    devices = jax.devices()
    # largest device count that divides the batch (not all-or-one: batch 6 on
    # 4 devices still serves on 2)
    n_dev = max(d for d in range(1, len(devices) + 1) if bs_example % d == 0)
    mesh = make_mesh(devices[:n_dev]) if n_dev > 1 else None
    if mesh is not None:
        print(f"Serving data-parallel over {n_dev} devices")
    elif len(devices) > 1:
        print(f"Serving on 1 of {len(devices)} devices "
              f"(batch {bs_example} has no multi-device divisor)")
    forward, put_batch = make_serving_forward(model, variables, mesh, example)

    ds = ClipDataset(data_cfg, args.eval_split)
    # unlike the reference's fixed batch-1 loop (``test.py:41-45``), inference is
    # batched: clips are padded to a full batch so one compiled program serves all
    bs = max(1, args.batch_size)
    loader = DataLoader(ds, batch_size=bs, shuffle=False, drop_last=False,
                        num_workers=data_cfg.num_workers)
    out_root = os.path.join(model_dir, f"masks_{args.dataset}")

    for batch in loader:
        imgs = batch["image"]
        n = imgs.shape[0]
        if n < bs:  # pad the tail batch to keep shapes static
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], bs - n, axis=0)], axis=0)
        probs = np.asarray(forward(put_batch(jnp.asarray(imgs))))  # (bs, H, W, 1)
        for i in range(n):
            mask = (probs[i, :, :, 0] > 0.5).astype(np.uint8) * 255
            seq = batch["seq_name"][i]
            frame = batch["starting_frame"][i]
            seq_dir = os.path.join(out_root, seq)
            os.makedirs(seq_dir, exist_ok=True)
            Image.fromarray(mask).save(
                os.path.join(seq_dir, f"{frame:04d}_instance_00.png")
            )
    print(f"Masks written to {out_root}")


if __name__ == "__main__":
    main()
