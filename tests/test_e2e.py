"""End-to-end pipeline test on a synthetic KITTI-format dataset.

Covers: dataset files → info pkl generation → gt-database creation → loader
with augmentation → train steps → prediction writer → KITTI AP evaluation.
The strongest check: feeding the ground truth back as predictions through the
full lidar→camera→2D artifact chain must score AP ≈ 100.
"""
import pickle
from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

from dfu3d_tpu.data import build_dataloader
from dfu3d_tpu.data.kitti_dataset import KittiDataset, create_kitti_infos
from dfu3d_tpu.utils.config import CfgDict

from test_model import tiny_model_cfg

IMG_W, IMG_H = 1240, 370

CALIB_TXT = """P0: 700.0 0.0 620.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0
P1: 700.0 0.0 620.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0
P2: 700.0 0.0 620.0 45.0 0.0 700.0 180.0 -0.3 0.0 0.0 1.0 0.005
P3: 700.0 0.0 620.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0
R0_rect: 1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0
Tr_velo_to_cam: 0.0 -1.0 0.0 0.1 0.0 0.0 -1.0 -0.2 1.0 0.0 0.0 0.3
Tr_imu_to_velo: 1.0 0.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 0.0 1.0 0.0
"""

CLASSES = ["Car", "Pedestrian"]


def _make_frame(root, idx, rng):
    """One synthetic frame: gt boxes + points inside them + clutter."""
    from dfu3d_tpu.core.geometry.calibration import Calibration
    from dfu3d_tpu.data import np_geometry as npg

    (root / "calib").mkdir(exist_ok=True, parents=True)
    (root / "velodyne").mkdir(exist_ok=True)
    (root / "label_2").mkdir(exist_ok=True)
    (root / "image_2").mkdir(exist_ok=True)

    (root / "calib" / f"{idx}.txt").write_text(CALIB_TXT)
    calib = Calibration(root / "calib" / f"{idx}.txt")

    n_gt = rng.randint(4, 7)
    boxes = np.zeros((n_gt, 7), np.float32)
    # keep boxes well inside FOV (x forward, |y| < x/2 keeps them in-image)
    boxes[:, 0] = rng.uniform(8, 24, n_gt)
    boxes[:, 1] = rng.uniform(-4, 4, n_gt)
    boxes[:, 2] = rng.uniform(-1.2, -0.8, n_gt)
    is_car = rng.uniform(0, 1, n_gt) > 0.4
    boxes[:, 3] = np.where(is_car, 4.0, 0.7) + rng.uniform(-0.2, 0.2, n_gt)
    boxes[:, 4] = np.where(is_car, 1.8, 0.7) + rng.uniform(-0.1, 0.1, n_gt)
    boxes[:, 5] = np.where(is_car, 1.6, 1.7)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
    names = np.where(is_car, "Car", "Pedestrian")

    # points: ~80 per box + clutter
    pts = []
    for b in boxes:
        local = rng.uniform(-0.5, 0.5, (80, 3)) * b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        world = np.stack(
            [local[:, 0] * c - local[:, 1] * s + b[0],
             local[:, 0] * s + local[:, 1] * c + b[1],
             local[:, 2] + b[2]], axis=1,
        )
        pts.append(world)
    clutter = np.stack(
        [rng.uniform(2, 30, 600), rng.uniform(-10, 10, 600),
         rng.uniform(-1.8, -1.6, 600)], axis=1,
    )
    pts.append(clutter)
    pts = np.concatenate(pts).astype(np.float32)
    intensity = rng.uniform(0, 1, (len(pts), 1)).astype(np.float32)
    np.concatenate([pts, intensity], axis=1).tofile(root / "velodyne" / f"{idx}.bin")

    # labels: lidar → camera (bottom center) + projected 2D bbox
    lines = []
    for b, name in zip(boxes, names):
        xyz = b[0:3].copy()
        xyz[2] -= b[5] / 2
        loc_cam = calib.lidar_to_rect(xyz[None])[0]
        ry = -b[6] - np.pi / 2
        corners = npg.boxes_to_corners_3d(b[None])[0]
        corners_cam = calib.lidar_to_rect(corners)
        img_pts, _ = calib.rect_to_img(corners_cam)
        x1, y1 = img_pts.min(0)
        x2, y2 = img_pts.max(0)
        x1, x2 = np.clip([x1, x2], 0, IMG_W - 1)
        y1, y2 = np.clip([y1, y2], 0, IMG_H - 1)
        alpha = -np.arctan2(-b[1], b[0]) + ry
        lines.append(
            f"{name} 0.00 0 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
            f"{b[5]:.2f} {b[4]:.2f} {b[3]:.2f} "
            f"{loc_cam[0]:.2f} {loc_cam[1]:.2f} {loc_cam[2]:.2f} {ry:.2f}"
        )
    (root / "label_2" / f"{idx}.txt").write_text("\n".join(lines) + "\n")
    Image.new("L", (IMG_W, IMG_H)).save(root / "image_2" / f"{idx}.png")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_synth")
    rng = np.random.RandomState(5)
    ids = [f"{i:06d}" for i in range(30)]
    for idx in ids:
        _make_frame(root, idx, rng)
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids[:24]) + "\n")
    (root / "ImageSets" / "val.txt").write_text("\n".join(ids[24:]) + "\n")
    # generate infos + gt database once for the whole module
    cfg = _dataset_cfg(root)
    create_kitti_infos(cfg, CLASSES, root, root, splits=("train", "val"))
    ds = KittiDataset(cfg, CLASSES, training=False, root_path=root)
    ds.set_split("train")
    ds.create_groundtruth_database(
        root / "kitti_infos_train.pkl", root, used_classes=CLASSES, split="train"
    )
    return root


def _dataset_cfg(root):
    return CfgDict(
        {
            "DATASET": "KittiDataset",
            "DATA_PATH": str(root),
            "POINT_CLOUD_RANGE": [0, -25.6, -3, 25.6, 25.6, 1],
            "DATA_SPLIT": {"train": "train", "test": "val"},
            "INFO_PATH": {
                "train": ["kitti_infos_train.pkl"],
                "test": ["kitti_infos_val.pkl"],
            },
            "GET_ITEM_LIST": ["points"],
            "FOV_POINTS_ONLY": True,
            "MAX_POINTS_PER_FRAME": 4096,
            "MAX_GT_PER_FRAME": 64,
            "DATA_AUGMENTOR": {
                "DISABLE_AUG_LIST": ["placeholder"],
                "AUG_CONFIG_LIST": [
                    {
                        "NAME": "gt_sampling",
                        "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                        "PREPARE": {"filter_by_min_points": ["Car:5", "Pedestrian:5"]},
                        "SAMPLE_GROUPS": ["Car:4", "Pedestrian:4"],
                        "NUM_POINT_FEATURES": 4,
                        "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                        "LIMIT_WHOLE_SCENE": True,
                    },
                    {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
                    {"NAME": "random_world_rotation",
                     "WORLD_ROT_ANGLE": [-0.78539816, 0.78539816]},
                    {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [0.95, 1.05]},
                ],
            },
            "POINT_FEATURE_ENCODING": {
                "encoding_type": "absolute_coordinates_encoding",
                "used_feature_list": ["x", "y", "z", "intensity"],
                "src_feature_list": ["x", "y", "z", "intensity"],
            },
            "DATA_PROCESSOR": [
                {"NAME": "mask_points_and_boxes_outside_range",
                 "REMOVE_OUTSIDE_BOXES": True},
                {"NAME": "shuffle_points",
                 "SHUFFLE_ENABLED": {"train": True, "test": True}},
                {"NAME": "transform_points_to_voxels_placeholder",
                 "VOXEL_SIZE": [0.4, 0.4, 4.0]},
            ],
        }
    )


class TestInfoGeneration:
    def test_create_infos_and_database(self, synth_root):
        paths = [synth_root / "kitti_infos_train.pkl", synth_root / "kitti_infos_val.pkl"]
        for p in paths:
            assert p.exists()
        infos = pickle.load(open(paths[0], "rb"))
        assert len(infos) == 24
        a = infos[0]["annos"]
        assert len(a["name"]) >= 4
        assert a["gt_boxes_lidar"].shape[1] == 7
        assert (a["num_points_in_gt"] >= 5).all()

        dbinfos = pickle.load(open(synth_root / "kitti_dbinfos_train.pkl", "rb"))
        assert set(dbinfos.keys()) <= {"Car", "Pedestrian"}
        assert sum(len(v) for v in dbinfos.values()) >= 20

    def test_gt_roundtrip_ap_100(self, synth_root):
        """GT fed back as predictions through the writer → AP ≈ 100."""
        cfg = _dataset_cfg(synth_root)
        # use the train split as test too (more gt → protocol saturates better)
        cfg.INFO_PATH["test"] = ["kitti_infos_train.pkl"]
        ds = KittiDataset(cfg, CLASSES, training=False, root_path=synth_root)
        from dfu3d_tpu.data.dataset import BatchMeta

        pred_dicts, metas = [], []
        for info in ds.kitti_infos:
            gt = info["annos"]["gt_boxes_lidar"]
            names = info["annos"]["name"]
            labels = np.array([CLASSES.index(n) + 1 for n in names])
            rng = np.random.RandomState(hash(info["point_cloud"]["lidar_idx"]) % 2**31)
            pred_dicts.append(
                {
                    "pred_boxes": gt,
                    "pred_scores": rng.uniform(0.5, 1.0, len(gt)),
                    "pred_labels": labels,
                }
            )
            metas.append(
                (
                    info["point_cloud"]["lidar_idx"],
                    ds.get_calib(info["point_cloud"]["lidar_idx"]),
                    info["image"]["image_shape"],
                )
            )
        meta = BatchMeta(
            [m[0] for m in metas], [m[1] for m in metas], [m[2] for m in metas]
        )
        det_annos = ds.generate_prediction_dicts(meta, pred_dicts, CLASSES)
        result_str, ret = ds.evaluation(det_annos, CLASSES)
        # the 41-point protocol caps R40 at ~num_valid_gt/40 when gt < 41;
        # with ~60+ Car gt perfect predictions must saturate high
        assert ret["Car_3d/easy_R40"] > 85, result_str
        assert ret["Car_bev/easy_R40"] > 85
        assert ret["Pedestrian_3d/easy_R40"] > 60


class TestTrainEvalPipeline:
    def test_loader_and_train_steps(self, synth_root):
        cfg = _dataset_cfg(synth_root)
        dataset, loader = build_dataloader(
            dataset_cfg=cfg, class_names=CLASSES, batch_size=2, workers=2,
            training=True,
        )
        from dfu3d_tpu.models import build_network
        from dfu3d_tpu.core.voxel import VoxelGrid
        from dfu3d_tpu.train import build_optimizer, create_train_state
        from dfu3d_tpu.train.train_state import make_train_step

        model_cfg = tiny_model_cfg()
        model_cfg.DENSE_HEAD.CLASS_NAMES_EACH_HEAD = [["Car"], ["Pedestrian"]]
        grid = VoxelGrid.create(cfg.POINT_CLOUD_RANGE, [0.4, 0.4, 4.0])
        model = build_network(model_cfg, CLASSES, grid)
        tx, _ = build_optimizer(
            CfgDict({"OPTIMIZER": "adam_onecycle", "LR": 0.003,
                     "WEIGHT_DECAY": 0.01, "GRAD_NORM_CLIP": 10}),
            total_steps=20,
        )
        it = iter(loader)
        batch, meta = next(it)
        assert batch.points.shape == (2, 4096, 4)
        assert batch.gt_valid.any()  # gt sampling + scene gt present
        state = create_train_state(model, batch, tx)
        step = jax.jit(make_train_step(model, tx))
        for _ in range(3):
            state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_eval_one_epoch_runs(self, synth_root, tmp_path):
        cfg = _dataset_cfg(synth_root)
        full_cfg = CfgDict(
            {
                "CLASS_NAMES": CLASSES,
                "DATA_CONFIG": cfg,
                "MODEL": tiny_model_cfg(),
                "OPTIMIZATION": {"OPTIMIZER": "adam", "LR": 1e-3,
                                 "WEIGHT_DECAY": 0.0},
            }
        )
        full_cfg.MODEL.DENSE_HEAD.CLASS_NAMES_EACH_HEAD = [["Car"], ["Pedestrian"]]
        dataset, loader = build_dataloader(
            dataset_cfg=cfg, class_names=CLASSES, batch_size=2, workers=2,
            training=False,
        )
        from dfu3d_tpu.core.voxel import VoxelGrid
        from dfu3d_tpu.models import build_network
        from dfu3d_tpu.train import build_optimizer, create_train_state
        from dfu3d_tpu.train.eval_utils import eval_one_epoch
        from dfu3d_tpu.utils.common import create_logger

        grid = VoxelGrid.create(cfg.POINT_CLOUD_RANGE, [0.4, 0.4, 4.0])
        model = build_network(full_cfg.MODEL, CLASSES, grid)
        tx, _ = build_optimizer(full_cfg.OPTIMIZATION, total_steps=1)
        batch, _ = next(iter(loader))
        state = create_train_state(model, batch, tx)
        logger = create_logger()
        result_str, result_dict, det_annos = eval_one_epoch(
            model, state, dataset, loader, full_cfg, logger,
            result_dir=tmp_path, save_to_file=True,
        )
        assert "Car" in result_str
        assert len(det_annos) == 6
        # KITTI-format txts written
        written = list((tmp_path / "final_result" / "data").glob("*.txt"))
        assert len(written) == 6
