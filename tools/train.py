"""Training CLI — same flag surface as the reference's tools/train.py:21-65.

Usage:
    python tools/train.py --cfg_file cfgs/kitti_models/centerpoint_nuscenes2kitti.yaml
"""
import argparse
import datetime
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dfu3d_tpu.utils.common import maybe_force_platform

maybe_force_platform()

import jax
import jax.numpy as jnp


def parse_config():
    parser = argparse.ArgumentParser(description="dfu3d_tpu training")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="global batch size (default: per-chip cfg × chips)")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--pretrained_model", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true")
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=30)
    parser.add_argument("--merge_all_iters_to_one_epoch", action="store_true")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="train steps scanned inside one device program "
                             "(amortizes per-dispatch host overhead — ~10 ms "
                             "on remote-tunneled chips; logging/ckpt cadence "
                             "rounds up to this granularity)")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--num_epochs_to_eval", type=int, default=0)
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


def main():
    args, cfg = parse_config()
    from dfu3d_tpu.data import build_dataloader
    from dfu3d_tpu.core.voxel import VoxelGrid
    from dfu3d_tpu.models import build_network
    from dfu3d_tpu.parallel import make_mesh
    from dfu3d_tpu.train import build_optimizer, create_train_state
    from dfu3d_tpu.train.checkpoint import load_checkpoint, load_latest
    from dfu3d_tpu.train.trainer import train_model
    from dfu3d_tpu.utils.common import create_logger, set_random_seed
    from dfu3d_tpu.utils.config import log_config_to_file

    num_devices = jax.device_count()
    if args.batch_size is None:
        batch_size = cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * num_devices
    else:
        assert args.batch_size % num_devices == 0
        batch_size = args.batch_size
    epochs = args.epochs if args.epochs is not None else cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / (
        "log_train_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    )
    logger = create_logger(log_file, rank=jax.process_index())
    logger.info("**********************Start logging**********************")
    logger.info(f"devices: {num_devices}, global batch size: {batch_size}")
    log_config_to_file(cfg, logger=logger)

    if args.fix_random_seed:
        set_random_seed(666 + jax.process_index())

    tb_log = None
    if jax.process_index() == 0:
        try:
            from tensorboardX import SummaryWriter

            tb_log = SummaryWriter(log_dir=str(output_dir / "tensorboard"))
        except Exception:
            pass

    dataset, train_loader = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG,
        class_names=cfg.CLASS_NAMES,
        batch_size=batch_size // jax.process_count(),
        workers=args.workers,
        logger=logger,
        training=True,
        merge_all_iters_to_one_epoch=args.merge_all_iters_to_one_epoch,
        total_epochs=epochs,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
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
        overrides["max_voxels"] = int(mv["train"] if hasattr(mv, "get") else mv)
    model = build_network(cfg.MODEL, cfg.CLASS_NAMES, grid, dtype=dtype,
                          **overrides)

    total_steps = len(train_loader) * epochs
    tx, lr_fn = build_optimizer(cfg.OPTIMIZATION, total_steps)

    example_batch, _ = next(iter(train_loader))
    state = create_train_state(model, example_batch, tx)

    start_epoch = 0
    if args.ckpt is not None:
        state, start_epoch = load_checkpoint(args.ckpt, state)
        logger.info(f"resumed from {args.ckpt} (epoch {start_epoch})")
    else:
        restored, epoch = load_latest(ckpt_dir, state)
        if restored is not None:
            state, start_epoch = restored, epoch
            logger.info(f"auto-resumed from epoch {epoch}")

    mesh = make_mesh(model=1)
    logger.info(f"mesh: {mesh}")
    logger.info("**********************Start training**********************")
    state = train_model(
        model, tx, state, train_loader, cfg, args, ckpt_dir, logger,
        tb_log=tb_log, lr_fn=lr_fn,
        start_epoch=start_epoch, mesh=mesh,
    )
    logger.info("**********************Training done**********************")

    if args.num_epochs_to_eval > 0:
        from dfu3d_tpu.train.eval_utils import eval_one_epoch

        test_dataset, test_loader = build_dataloader(
            dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
            batch_size=batch_size // jax.process_count(), workers=args.workers,
            logger=logger, training=False,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        eval_dir = output_dir / "eval" / "eval_with_train"
        eval_dir.mkdir(parents=True, exist_ok=True)
        result_str, result_dict, _ = eval_one_epoch(
            model, state, test_dataset, test_loader, cfg, logger,
            result_dir=eval_dir, mesh=mesh,
        )
        if tb_log is not None:
            for k, v in result_dict.items():
                tb_log.add_scalar(f"eval/{k}", float(v), epochs)


if __name__ == "__main__":
    main()
