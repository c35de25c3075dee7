"""Pseudo-box generation CLI — the reference's `tools/PENet/main.py --command
evaluate --detpath …` equivalent (SURVEY §3.1), minus the in-process foundation
models: SEEM masks and DepthAnything depth are consumed as precomputed
artifacts (see dfu3d_tpu/pseudo/factory.py for the format).

Usage:
    python tools/generate_pseudo_boxes.py --detpath data/nuscenes_kitti_format/train_28130 \
        [--start 0 --end 28130] [--label_dir label_train]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--detpath", type=str, required=True,
                        help="KITTI-format root with velodyne/ image_2/ calib/ "
                             "depth/ seem/")
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=None)
    parser.add_argument("--label_dir", type=str, default="label_train")
    parser.add_argument("--fov_only", action="store_true", default=True)
    parser.add_argument("--ground_z", type=float, default=0.0,
                        help="scene ground elevation in the lidar frame "
                             "(reference GenerateAnns hardcodes 0)")
    parser.add_argument("--z_offset", type=float, default=1.5,
                        help="box bottom offset (reference hardcodes 1.5)")
    parser.add_argument("--dataset", type=str, default="nuscenes",
                        choices=["nuscenes", "kitti", "waymo", "pandaset"],
                        help="factory variant preset: class size/height "
                             "priors + center placement (reference "
                             "my_loader_KittiPandasetWaymo.py:883-1010; "
                             "nuscenes = the flagship path, no priors)")
    parser.add_argument("--center_type", type=str, default=None,
                        choices=["ori", "prior_centerline",
                                 "prior_linecorner", "prior_center"],
                        help="override the preset's center placement strategy")
    parser.add_argument("--classes", type=str, default=None,
                        help="comma-separated thing-class vocabulary the "
                             "seem/<idx>.npz class indices point into "
                             "(default: the 10-class nuScenes list; the "
                             "reference's SEEM vocab is set at "
                             "vis_utils.py:181-182)")
    args = parser.parse_args()

    from dfu3d_tpu.pseudo.factory import (
        FACTORY_PRESETS, PseudoBoxFactory, load_frame_inputs,
    )
    from dfu3d_tpu.data.kitti_dataset import KittiDataset
    from dfu3d_tpu.utils.common import create_logger

    logger = create_logger()
    root = Path(args.detpath)
    ids = sorted(p.stem for p in (root / "velodyne").glob("*.bin"))
    ids = ids[args.start : args.end]
    logger.info(f"{len(ids)} frames to process")

    thing_classes = args.classes.split(",") if args.classes else None
    preset = dict(FACTORY_PRESETS[args.dataset])
    if args.center_type:
        preset["center_type"] = args.center_type
    factory = PseudoBoxFactory(ground_z=args.ground_z, z_offset=args.z_offset,
                               thing_classes=thing_classes, **preset)
    t0 = time.time()
    done = 0
    for idx in ids:
        try:
            frame = load_frame_inputs(root, idx)
        except FileNotFoundError as e:
            logger.warning(f"{idx}: missing input ({e}); skipped")
            continue
        if args.fov_only:
            pts_rect = frame.calib.lidar_to_rect(frame.lidar[:, 0:3])
            fov = KittiDataset.get_fov_flag(
                pts_rect, frame.depth.shape[:2], frame.calib
            )
            frame.lidar = frame.lidar[fov]
        out = factory.process_frame(frame)
        factory.write_frame(root, frame, out, label_dir=args.label_dir)
        done += 1
        if done % 50 == 0:
            rate = done / (time.time() - t0)
            logger.info(f"{done}/{len(ids)} frames  ({rate:.2f} frames/s)")
    rate = done / max(time.time() - t0, 1e-6)
    logger.info(f"done: {done} frames at {rate:.2f} frames/s")


if __name__ == "__main__":
    main()
