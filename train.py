#!/usr/bin/env python
"""Training entry point (counterpart of the reference's ``train.py``).

Example (DVI recipe, ``scripts/train_davis.sh``):
    python train.py -model_name mumpy_davis -dataset davis -batch_size 6 \
        -optim sgd -optim_cnn sgd -lr 1e-2 -lr_cnn 1e-3 -lr_cva 1e-2 \
        -max_epoch 50 -seq_dir ... -seq_dir2 ... -annot_dir ...
"""

import jax

from mumpy_tpu.configs.args import build_configs, get_parser
from mumpy_tpu.configs.model_config import multiswin_config, tiny_config
from mumpy_tpu.data.dataset import ClipDataset, DataLoader
from mumpy_tpu.train.trainer import create_train_state, train_loop
from mumpy_tpu.train import checkpoint as ckpt_lib
import os


def main():
    args = get_parser().parse_args()
    data_cfg, opt_cfg, loop_cfg = build_configs(args)
    model_cfg = tiny_config(args.imsize) if args.tiny else multiswin_config(args.imsize)

    loaders_ds = {
        split: ClipDataset(data_cfg, split) for split in ("train", "val")
    }
    # persistent loaders (worker pools + frame caches live across epochs);
    # uint8 batches are normalized on-device inside the jitted step
    loader_objs = {
        "train": DataLoader(
            loaders_ds["train"], data_cfg.batch_size, shuffle=True,
            drop_last=True, seed=data_cfg.seed, num_workers=data_cfg.num_workers,
            normalize_on_host=False),
        "val": DataLoader(
            loaders_ds["val"], data_cfg.batch_size, shuffle=True,
            drop_last=True, seed=data_cfg.seed + 1,
            num_workers=data_cfg.num_workers, normalize_on_host=False),
    }
    loaders = {split: (lambda s=split: iter(loader_objs[s])) for split in loader_objs}
    steps_per_epoch = max(1, len(loaders_ds["train"]) // data_cfg.batch_size)
    iter_max = int(steps_per_epoch * loop_cfg.max_epoch / opt_cfg.accumulation_steps)

    state = create_train_state(
        model_cfg, opt_cfg, iter_max, jax.random.PRNGKey(loop_cfg.seed)
    )
    if args.pretrained:
        from mumpy_tpu.utils.weight_port import load_pretrained

        state = state.replace(params=load_pretrained(state.params, args.pretrained))
    if args.resume:
        model_dir = os.path.join(loop_cfg.results_dir, loop_cfg.model_name)
        restored = (
            ckpt_lib.load_epoch(model_dir, state, args.epoch_resume)
            if args.epoch_resume >= 0 else ckpt_lib.load_latest(model_dir, state)
        )
        if restored is not None:
            state = restored
            print(f"Resumed from {model_dir}")
    elif args.transfer:
        # warm-start model weights from another run, fresh optimizer state
        # (``train.py:183-188``)
        src_dir = os.path.join(loop_cfg.results_dir, args.transfer_from)
        restored = ckpt_lib.load_latest(src_dir, state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint to transfer from in {src_dir}")
        state = state.replace(params=restored.params)
        print(f"Transferred weights from {src_dir}")

    train_loop(
        state, loaders, loop_cfg, opt_cfg, iter_max,
        max_steps_per_epoch=args.max_steps_per_epoch,
    )


if __name__ == "__main__":
    main()
