"""Training loop (reference: tools/train_utils/train_utils.py train_model/
train_one_epoch).

Per epoch: loader.set_epoch → (optional) disable-augmentation hook for the last
epochs → iterate jitted train step over host-sharded batches → rank-0 logging
(tqdm + tensorboard) → checkpoint rotation. The GradScaler/autocast machinery
has no TPU equivalent (bf16 needs no loss scaling); DDP wrapping is replaced by
the mesh sharding set up once outside the loop.
"""
from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np
import tqdm

from ..parallel import make_mesh, replicate, shard_batch
from .checkpoint import save_checkpoint
from .train_state import make_multi_train_step, make_train_step


def disable_augmentation_hook(hook_config, dataloader, total_epochs, cur_epoch,
                              cfg, logger):
    """Turn off configured augmentations for the last N epochs
    (reference train_utils.py:257-272)."""
    if hook_config is None:
        return
    num_last_epochs = hook_config.NUM_LAST_EPOCHS
    if (total_epochs - num_last_epochs) <= cur_epoch:
        augmentor = dataloader.dataset.data_augmentor
        if augmentor is None:
            return
        disable = hook_config.get("DISABLE_AUG_LIST", [])
        aug_cfg = cfg.DATA_CONFIG.DATA_AUGMENTOR
        new_cfg = type(aug_cfg)(aug_cfg)
        new_cfg["DISABLE_AUG_LIST"] = list(
            set(list(aug_cfg.get("DISABLE_AUG_LIST", [])) + list(disable))
        )
        if logger:
            logger.info(f"Disable augmentations {disable} from epoch {cur_epoch}")
        augmentor.disable_augmentation(new_cfg)


def train_model(model, tx, state, train_loader, cfg, args, ckpt_dir, logger,
                tb_log=None, lr_fn=None, start_epoch=0, mesh=None):
    """Main loop. Returns the final TrainState."""
    total_epochs = args.epochs
    ckpt_save_interval = getattr(args, "ckpt_save_interval", 1)
    max_ckpt_save_num = getattr(args, "max_ckpt_save_num", 30)
    # wallclock-interval latest_model save (reference train_utils.py:135-143)
    ckpt_save_time_interval = getattr(args, "ckpt_save_time_interval", 300)
    merge_all_iters = getattr(args, "merge_all_iters_to_one_epoch", False)

    if mesh is None:
        mesh = make_mesh(model=1)
    state = replicate(mesh, state)
    train_step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    # K>1 scans K steps inside one device program — identical math, 1/K the
    # host→device dispatch overhead (train_state.make_multi_train_step)
    steps_per_dispatch = max(int(getattr(args, "steps_per_dispatch", 1)), 1)
    multi_step = (
        jax.jit(make_multi_train_step(model, tx, steps_per_dispatch),
                donate_argnums=0)
        if steps_per_dispatch > 1 else None
    )

    accumulated_iter = int(state.step)
    steps_per_epoch = len(train_loader)

    if merge_all_iters and hasattr(train_loader.dataset, "merge_all_iters_to_one_epoch"):
        # one long epoch over total_epochs × dataset (reference
        # train_utils.py:156-162 + dataset.merge_all_iters_to_one_epoch)
        train_loader.dataset.merge_all_iters_to_one_epoch(
            merge=True, epochs=total_epochs
        )
        steps_per_epoch = len(train_loader)
        start_epoch, total_epochs = 0, 1

    last_latest_save = time.time()

    for cur_epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(cur_epoch)
        disable_augmentation_hook(
            cfg.get("HOOK", {}).get("DisableAugmentationHook", None)
            if cfg.get("HOOK", None)
            else None,
            train_loader, total_epochs, cur_epoch, cfg, logger,
        )

        pbar = tqdm.tqdm(
            total=steps_per_epoch, desc=f"epoch {cur_epoch}/{total_epochs}",
            dynamic_ncols=True,
        )
        data_time = batch_time = 0.0
        end = time.time()
        last_metrics = {}
        pending = []  # buffered batches for the scanned multi-step path
        for batch, _meta in train_loader:
            data_time += time.time() - end
            if multi_step is not None:
                pending.append(batch)
                if len(pending) < steps_per_dispatch:
                    end = time.time()
                    pbar.update(1)
                    continue
                stacked = jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *pending
                )
                pending = []
                sharded = shard_batch(mesh, stacked, extra_leading_axis=True)
                state, metrics = multi_step(state, sharded)
                accumulated_iter += steps_per_dispatch
            else:
                sharded = shard_batch(mesh, batch)
                state, metrics = train_step(state, sharded)
                accumulated_iter += 1

            if (accumulated_iter % 20 < steps_per_dispatch
                    or accumulated_iter <= steps_per_dispatch):
                # sync + log sparsely to keep the device busy
                last_metrics = {
                    k: float(v) for k, v in metrics.items()
                    if getattr(v, "ndim", 0) == 0
                }
                cur_lr = float(lr_fn(accumulated_iter)) if lr_fn else 0.0
                pbar.set_postfix(
                    loss=f"{last_metrics.get('loss', 0):.3f}", lr=f"{cur_lr:.2e}"
                )
                if tb_log is not None:
                    tb_log.add_scalar("train/loss", last_metrics["loss"], accumulated_iter)
                    tb_log.add_scalar("meta_data/learning_rate", cur_lr, accumulated_iter)
                    for k, v in last_metrics.items():
                        if k != "loss":
                            tb_log.add_scalar(f"train/{k}", v, accumulated_iter)
            batch_time += time.time() - end
            end = time.time()
            pbar.update(1)

            if time.time() - last_latest_save > ckpt_save_time_interval:
                # crash-resilience save between epoch boundaries (reference
                # latest_model, train_utils.py:135-143)
                save_checkpoint(ckpt_dir, state, -1, max_ckpt_save_num,
                                name="latest_model")
                last_latest_save = time.time()
        for tail_batch in pending:  # epoch tail smaller than the scan window
            state, metrics = train_step(state, shard_batch(mesh, tail_batch))
            accumulated_iter += 1
        pbar.close()

        if logger:
            dt, bt = data_time, batch_time
            if jax.process_count() > 1:
                # cross-host time averaging (reference
                # average_reduce_value, train_utils.py:71-73)
                from jax.experimental import multihost_utils

                pair = multihost_utils.process_allgather(
                    np.asarray([dt, bt], np.float64)
                )
                dt, bt = float(pair[..., 0].mean()), float(pair[..., 1].mean())
            logger.info(
                f"epoch {cur_epoch}: loss={last_metrics.get('loss', float('nan')):.4f} "
                f"data_time={dt:.1f}s batch_time={bt:.1f}s"
            )

        trained_epoch = cur_epoch + 1
        if trained_epoch % ckpt_save_interval == 0:
            save_checkpoint(ckpt_dir, state, trained_epoch, max_ckpt_save_num)
            if logger:
                logger.info(f"checkpoint saved: epoch {trained_epoch}")
    return state
