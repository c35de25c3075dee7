"""Evaluation CLI — same flag surface as the reference's tools/test.py:22-56,
including the checkpoint-dir polling mode (repeat_eval_ckpt, test.py:89-135).
"""
import argparse
import datetime
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dfu3d_tpu.utils.common import maybe_force_platform

maybe_force_platform()

import jax
import jax.numpy as jnp


def parse_config():
    parser = argparse.ArgumentParser(description="dfu3d_tpu evaluation")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--eval_tag", type=str, default="default")
    parser.add_argument("--eval_all", action="store_true",
                        help="poll ckpt_dir and evaluate every checkpoint")
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--save_to_file", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    args = parser.parse_args()

    from dfu3d_tpu.utils.config import cfg, cfg_from_list, cfg_from_yaml_file

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(str(Path(args.cfg_file)).split("/")[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def _build(args, cfg, logger):
    from dfu3d_tpu.core.voxel import VoxelGrid
    from dfu3d_tpu.data import build_dataloader
    from dfu3d_tpu.models import build_network
    from dfu3d_tpu.train import build_optimizer, create_train_state

    num_devices = jax.device_count()
    batch_size = (
        args.batch_size
        if args.batch_size is not None
        else cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * num_devices
    )
    dataset, loader = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size // jax.process_count(), workers=args.workers,
        logger=logger, training=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    voxel_cfg = [p for p in cfg.DATA_CONFIG.DATA_PROCESSOR
                 if p.NAME.startswith("transform_points_to_voxels")][-1]
    grid = VoxelGrid.create(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, voxel_cfg.VOXEL_SIZE)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # static voxel capacity for the sparse (MeanVFE) path — reference
    # MAX_NUMBER_OF_VOXELS, transform_points_to_voxels (data_processor.py:133)
    overrides = {}
    mv = voxel_cfg.get("MAX_NUMBER_OF_VOXELS", None)
    if mv:
        overrides["max_voxels"] = int(mv["test"] if hasattr(mv, "get") else mv)
    model = build_network(cfg.MODEL, cfg.CLASS_NAMES, grid, dtype=dtype,
                          **overrides)
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    example_batch, _ = next(iter(loader))
    state = create_train_state(model, example_batch, tx)
    return model, state, dataset, loader


def main():
    args, cfg = parse_config()
    from dfu3d_tpu.train.checkpoint import list_checkpoints, load_checkpoint
    from dfu3d_tpu.train.eval_utils import eval_one_epoch
    from dfu3d_tpu.utils.common import create_logger

    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_output_dir = output_dir / "eval"
    eval_output_dir.mkdir(parents=True, exist_ok=True)
    log_file = eval_output_dir / (
        "log_eval_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    )
    logger = create_logger(log_file, rank=jax.process_index())

    model, state, dataset, loader = _build(args, cfg, logger)

    if args.eval_all:
        ckpt_dir = Path(args.ckpt_dir or (output_dir / "ckpt"))
        record_file = eval_output_dir / ("eval_list_%s.txt" % cfg.DATA_CONFIG.DATA_SPLIT["test"])
        evaluated = set()
        if record_file.exists():
            evaluated = set(int(x) for x in record_file.read_text().split() if x)
        wait_start = time.time()
        while True:
            todo = [
                (e, p) for e, p in list_checkpoints(ckpt_dir)
                if e not in evaluated and e >= args.start_epoch
            ]
            if not todo:
                if (time.time() - wait_start) / 60 > args.max_waiting_mins:
                    break
                time.sleep(30)
                continue
            wait_start = time.time()
            for epoch, path in todo:
                state, _ = load_checkpoint(path, state)
                result_dir = eval_output_dir / f"epoch_{epoch}" / cfg.DATA_CONFIG.DATA_SPLIT["test"]
                result_dir.mkdir(parents=True, exist_ok=True)
                logger.info(f"*************** evaluating epoch {epoch} ***************")
                eval_one_epoch(
                    model, state, dataset, loader, cfg, logger,
                    result_dir=result_dir, save_to_file=args.save_to_file,
                )
                evaluated.add(epoch)
                with open(record_file, "a") as f:
                    f.write(f"{epoch}\n")
    else:
        assert args.ckpt is not None, "--ckpt required (or use --eval_all)"
        state, epoch = load_checkpoint(args.ckpt, state)
        result_dir = (
            eval_output_dir / f"epoch_{epoch}" / cfg.DATA_CONFIG.DATA_SPLIT["test"]
            / args.eval_tag
        )
        result_dir.mkdir(parents=True, exist_ok=True)
        eval_one_epoch(
            model, state, dataset, loader, cfg, logger,
            result_dir=result_dir, save_to_file=args.save_to_file,
        )


if __name__ == "__main__":
    main()
