"""CLI parser mirroring the reference's flag surface (``args.py:3-163``).

Flags keep the reference's single-dash spelling (``-model_name``, ``-batch_size`` …)
so existing launch scripts translate directly; parsing yields explicit config
dataclasses instead of a process-global namespace.
"""

from __future__ import annotations

import argparse

from ..train.optim import OptimConfig
from ..train.trainer import TrainLoopConfig
from .data_config import DataConfig, davis_config, youtubevos_config


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Mumpy TPU", prefix_chars="-")
    # data
    p.add_argument("-dataset", dest="dataset", default="davis",
                   choices=["davis", "youtubevos"])
    p.add_argument("-length_clip", dest="length_clip", default=3, type=int)
    p.add_argument("-batch_size", dest="batch_size", default=6, type=int)
    p.add_argument("-num_workers", dest="num_workers", default=4, type=int)
    p.add_argument("-year", dest="year", default="2016")
    p.add_argument("-imsize", dest="imsize", default=224, type=int)
    p.add_argument("--augment", dest="augment", action="store_true", default=True)
    p.add_argument("--no-augment", dest="augment", action="store_false")
    p.add_argument("--singleAugment", dest="single_augment", action="store_true", default=True)
    p.add_argument("-seq_dir", dest="seq_dir", default=None,
                   help="primary inpainting-stream root (cfg.PATH.SEQUENCES)")
    p.add_argument("-seq_dir2", dest="seq_dir2", default=None)
    p.add_argument("-seq_dir3", dest="seq_dir3", default=None)
    p.add_argument("-annot_dir", dest="annot_dir", default=None)
    p.add_argument("-db_info", dest="db_info", default=None)
    p.add_argument("-lmdb_index", dest="lmdb_index", default=None,
                   help="LMDB sequence->frame-list index (dataloaders/base.py:55-60)")
    # optimization — defaults follow the PUBLISHED RECIPE (``scripts/
    # train_davis.sh``), not the reference argparse defaults (which are 'adam'
    # and an lr_cnn of 0.9 that no script uses)
    p.add_argument("-lr", dest="lr", default=1e-2, type=float)
    p.add_argument("-lr_cnn", dest="lr_cnn", default=1e-3, type=float)
    p.add_argument("-lr_cva", dest="lr_cva", default=1e-2, type=float)
    p.add_argument("-optim", dest="optim", default="sgd", choices=["adam", "sgd", "rmsprop"])
    p.add_argument("-optim_cnn", dest="optim_cnn", default="sgd",
                   choices=["adam", "sgd", "rmsprop"])
    p.add_argument("-weight_decay", dest="weight_decay", default=1e-4, type=float)
    p.add_argument("-weight_decay_cnn", dest="weight_decay_cnn", default=1e-4, type=float)
    p.add_argument("-momentum", dest="momentum", default=0.9, type=float)
    p.add_argument("-accumulation_steps", dest="accumulation_steps", default=1, type=int)
    p.add_argument("-max_epoch", dest="max_epoch", default=100, type=int)
    p.add_argument("-patience", dest="patience", default=15, type=int)
    p.add_argument("-min_delta", dest="min_delta", default=0.0, type=float)
    p.add_argument("-best_val_loss", dest="best_val_loss", default=1000.0, type=float)
    p.add_argument("-seed", dest="seed", default=282845927, type=int)
    p.add_argument("-print_every", dest="print_every", default=10, type=int)
    # run management
    p.add_argument("-model_name", dest="model_name", default="mumpy")
    p.add_argument("-results_dir", dest="results_dir", default="results")
    p.add_argument("--resume", dest="resume", action="store_true")
    p.add_argument("-epoch_resume", dest="epoch_resume", default=-1, type=int)
    p.add_argument("--transfer", dest="transfer", action="store_true",
                   help="warm-start model weights from another run (``train.py:183-188``)")
    p.add_argument("-transfer_from", dest="transfer_from", default="model")
    p.add_argument("--smooth_curves", dest="smooth_curves", action="store_true", default=True)
    p.add_argument("-finetune_after", dest="finetune_after", default=0, type=int,
                   help="-1 disables the patience-triggered best-checkpoint reload "
                        "(``train.py:449-459``)")
    p.add_argument("--update_encoder", dest="update_encoder", action="store_true",
                   default=True)
    p.add_argument("-test_epoch", dest="test_epoch", default=-1, type=int)
    p.add_argument("-eval_split", dest="eval_split", default="test")
    p.add_argument("-max_steps_per_epoch", dest="max_steps_per_epoch", default=None, type=int)
    p.add_argument("--tiny", dest="tiny", action="store_true",
                   help="use the tiny debug architecture")
    p.add_argument("--bf16", dest="bf16", action="store_true",
                   help="mixed-precision training (bf16 compute, f32 master params)")
    p.add_argument("-pretrained", dest="pretrained", default=None,
                   help="torch checkpoint to warm-start from (strict=False port, "
                        "counterpart of ../weights/weight.pth at modelFactory.py:70)")
    return p


def build_configs(args: argparse.Namespace):
    base = davis_config if args.dataset == "davis" else youtubevos_config
    overrides = dict(
        length_clip=args.length_clip,
        batch_size=args.batch_size,
        augment=args.augment,
        single_augment=args.single_augment,
        num_workers=args.num_workers,
        year=args.year,
        input_res=(args.imsize, args.imsize),
        seed=args.seed,
    )
    if args.seq_dir:
        overrides["sequences"] = args.seq_dir
    overrides["sequences2"] = args.seq_dir2
    overrides["sequences3"] = args.seq_dir3
    if args.annot_dir:
        overrides["annotations"] = args.annot_dir
    if args.db_info:
        overrides["db_info"] = args.db_info
    if args.lmdb_index:
        overrides["lmdb_index"] = args.lmdb_index
    data_cfg = base(**overrides)

    opt_cfg = OptimConfig(
        optim=args.optim, optim_cnn=args.optim_cnn,
        lr=args.lr, lr_cnn=args.lr_cnn, lr_cva=args.lr_cva,
        weight_decay=args.weight_decay, weight_decay_cnn=args.weight_decay_cnn,
        momentum=args.momentum,
        accumulation_steps=args.accumulation_steps,
    )
    loop_cfg = TrainLoopConfig(
        model_name=args.model_name, results_dir=args.results_dir,
        max_epoch=args.max_epoch, accumulation_steps=args.accumulation_steps,
        patience=args.patience, min_delta=args.min_delta,
        best_val_loss=args.best_val_loss, print_every=args.print_every,
        smooth_curves=args.smooth_curves,
        patience_reload=args.finetune_after != -1,
        compute_dtype="bf16" if args.bf16 else "f32",
        seed=args.seed,
    )
    return data_cfg, opt_cfg, loop_cfg
