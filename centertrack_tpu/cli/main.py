"""Training entry point (reference: src/main.py).

Usage:
  python -m centertrack_tpu.cli.main tracking --dataset mot \
      --dataset_version 17halftrain --pre_hm --same_aug_pre \
      --hm_disturb 0.05 --lost_disturb 0.4 --fp_disturb 0.1
"""

from __future__ import annotations

import os

import numpy as np

from centertrack_tpu.cli.opts import build_parser, args_to_config
from centertrack_tpu.config import finalize
from centertrack_tpu.data.datasets import get_dataset
from centertrack_tpu.data.loader import DataLoader
from centertrack_tpu.engine.trainer import Trainer
from centertrack_tpu.models.model import (create_model, init_model,
                                          load_model, save_model)
from centertrack_tpu.utils.logger import Logger


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    cfg = args_to_config(args)
    dataset_cls = get_dataset(cfg.dataset)
    cfg = finalize(cfg, dataset_cls)
    np.random.seed(cfg.seed)

    save_dir = os.path.join("exp", cfg.task.replace(",", "_"), cfg.exp_id)
    os.makedirs(save_dir, exist_ok=True)
    logger = Logger(cfg, save_dir)

    print("Creating model...")
    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict, cfg)
    params, batch_stats = init_model(model, cfg)
    start_epoch = 0
    load_path = cfg.load_model
    if cfg.resume and not load_path:
        load_path = os.path.join(save_dir, "model_last.ckpt")
    if cfg.load_backbone and not (cfg.resume or cfg.load_model):
        # ImageNet backbone-only init: merge trunk weights, keep the
        # fresh neck/head init (reference: dla.py:318-329 pretrain)
        ckpt = load_model(cfg.load_backbone, params, batch_stats,
                          verbose=False)
        params, batch_stats = ckpt["params"], ckpt["batch_stats"]
        print(f"initialized backbone from {cfg.load_backbone}")
    trainer = Trainer(cfg, model, params, batch_stats,
                      debug_dir=os.path.join(save_dir, "debug"))
    if load_path and os.path.exists(load_path):
        ckpt = load_model(load_path, params, batch_stats,
                          trainer.state.opt_state,
                          reset_hm=cfg.reset_hm, reuse_hm=cfg.reuse_hm)
        start_epoch = ckpt["epoch"]
        trainer.state = trainer.state._replace(
            params=ckpt["params"], batch_stats=ckpt["batch_stats"],
            opt_state=ckpt.get("opt_state", trainer.state.opt_state))
        print(f"resumed from {load_path} at epoch {start_epoch}")

    print("Setting up data...")
    train_ds = dataset_cls(cfg, "train")
    train_loader = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                              num_workers=cfg.num_workers, seed=cfg.seed,
                              use_processes=cfg.process_workers)
    val_loader = None
    if cfg.val_intervals < cfg.num_epochs or args.eval_val:
        val_ds = dataset_cls(cfg, "val")
        val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=False,
                                num_workers=cfg.num_workers,
                                use_processes=cfg.process_workers)

    print("Starting training...")
    for epoch in range(start_epoch + 1, cfg.num_epochs + 1):
        stats = trainer.train(epoch, train_loader, cfg.num_iters)
        logger.write(f"epoch: {epoch} |" + "".join(
            f" {k} {v:8f} |" for k, v in stats.items()))
        for k, v in stats.items():
            logger.scalar_summary(f"train_{k}", v, epoch)
        save_model(os.path.join(save_dir, "model_last.ckpt"), epoch,
                   trainer.state.params, trainer.state.batch_stats,
                   trainer.state.opt_state)
        if cfg.val_intervals > 0 and epoch % cfg.val_intervals == 0 \
                and val_loader is not None:
            vstats = trainer.val(epoch, val_loader, cfg.num_iters)
            for k, v in vstats.items():
                logger.scalar_summary(f"val_{k}", v, epoch)
            save_model(os.path.join(save_dir, f"model_{epoch}.ckpt"),
                       epoch, trainer.state.params,
                       trainer.state.batch_stats)
        if epoch in cfg.save_point:
            save_model(os.path.join(save_dir, f"model_{epoch}.ckpt"),
                       epoch, trainer.state.params,
                       trainer.state.batch_stats)
        # LR drop handled by make_lr_schedule(epoch)
    logger.close()


if __name__ == "__main__":
    main()
