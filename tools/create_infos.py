"""Info-pkl + gt-database generation CLI (reference: `python -m
pcdet.datasets.kitti.kitti_dataset create_kitti_infos ...`, kitti_dataset.py:525-539).

Usage:
    python tools/create_infos.py --cfg_file cfgs/kitti_models/centerpoint_nuscenes2kitti.yaml \
        [--label_dir label_train] [--suffix _initial_pseudo_box] [--splits train val]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--label_dir", type=str, default=None)
    parser.add_argument("--suffix", type=str, default="")
    parser.add_argument("--splits", type=str, nargs="+", default=["train", "val"])
    parser.add_argument("--no_gt_database", action="store_true")
    args = parser.parse_args()

    from dfu3d_tpu.data.kitti_dataset import KittiDataset, create_kitti_infos
    from dfu3d_tpu.utils.common import create_logger
    from dfu3d_tpu.utils.config import CfgDict, cfg_from_yaml_file

    logger = create_logger()
    cfg = CfgDict()
    cfg_from_yaml_file(args.cfg_file, cfg)
    ds_cfg = cfg.DATA_CONFIG if "DATA_CONFIG" in cfg else cfg
    if args.label_dir:
        ds_cfg.LABEL_DIR = args.label_dir
    data_path = Path(args.data_path or ds_cfg.DATA_PATH)

    paths = create_kitti_infos(
        ds_cfg, cfg.get("CLASS_NAMES", None) or [], data_path, data_path,
        splits=tuple(args.splits), suffix=args.suffix, logger=logger,
    )
    if not args.no_gt_database and "train" in args.splits:
        ds = KittiDataset(ds_cfg, cfg.get("CLASS_NAMES", []), training=False,
                          root_path=data_path, logger=logger)
        ds.set_split("train")
        train_info = [p for p in paths if "train" in p.name][0]
        ds.create_groundtruth_database(
            train_info, data_path, used_classes=cfg.get("CLASS_NAMES", None),
            split="train", suffix=args.suffix,
        )
        logger.info("gt database created")


if __name__ == "__main__":
    main()
