"""Native nuScenes dataset (reference: pcdet/datasets/nuscenes/
nuscenes_dataset.py) — devkit-free, built on the raw-table reader
(nuscenes_tables.py).

Covers: info generation from the raw JSON tables (boxes in the nuScenes lidar
frame + per-class counts), class-balanced epoch resampling (:66-106), minimum-
radius point filtering, and KITTI-style AP evaluation (the reference's
`kitti` EVAL_METRIC alternative via kitti_utils; the devkit `NuScenesEval`
path requires the nuscenes devkit and is intentionally out-of-process here).
Sweep accumulation is single-sweep for now (MAX_SWEEPS=1), matching the
DFU3D conversion path (README.md:64 "only using a single sweep").
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from .dataset import DatasetTemplate
from . import np_geometry as npg

# detection-name → KITTI-style class (capitalized, reference kitti_utils map)
DEFAULT_MAP = {
    "car": "Car", "truck": "Truck", "construction_vehicle": "Construction_vehicle",
    "bus": "Bus", "trailer": "Trailer", "barrier": "Barrier",
    "motorcycle": "Motorcycle", "bicycle": "Bicycle", "pedestrian": "Pedestrian",
    "traffic_cone": "Traffic_cone",
}


def create_nuscenes_infos(dataroot, version="v1.0-trainval", max_sweeps=1,
                          save_path=None, logger=None):
    """Info pkl from raw tables (reference nuscenes_utils.fill_trainval_infos
    semantics, single-sweep)."""
    from .nuscenes_tables import (
        NuScenesTables,
        Quaternion,
        category_to_detection_name,
    )

    nusc = NuScenesTables(dataroot, version)
    infos = []
    for sample in nusc.sample:
        lid_token = nusc.sample_data_token(sample, "LIDAR_TOP")
        sd_lid = nusc.get("sample_data", lid_token)
        anns = nusc.sample_annotations_of(sample["token"])
        names, boxes = [], []
        for ann in anns:
            cat = (
                nusc.get("category", ann["category_token"])["name"]
                if "category_token" in ann else ann.get("category_name", "")
            )
            det = category_to_detection_name(cat)
            if det is None:
                continue
            box = nusc.box_in_lidar_frame(ann, sd_lid)
            w, l, h = box.wlh
            # heading: box x-axis yaw in the lidar frame
            v = box.rotation_matrix @ np.array([1.0, 0, 0])
            yaw = np.arctan2(v[1], v[0])
            boxes.append([*box.center, l, w, h, yaw])
            # KITTI-style capitalized names (reference kitti_utils
            # map_name_to_kitti) so the KITTI-protocol evaluator applies
            names.append(DEFAULT_MAP.get(det, det.capitalize()))
        infos.append(
            {
                "token": sample["token"],
                "lidar_path": sd_lid["filename"],
                "gt_boxes": np.asarray(boxes, np.float32).reshape(-1, 7),
                "gt_names": np.asarray(names),
                "num_lidar_pts": np.asarray(
                    [a.get("num_lidar_pts", -1) for a in anns], np.int32
                ),
            }
        )
    if save_path is not None:
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        with open(save_path, "wb") as f:
            pickle.dump(infos, f)
        if logger:
            logger.info(f"nuscenes infos saved: {save_path} ({len(infos)})")
    return infos


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        super().__init__(
            dataset_cfg=dataset_cfg, class_names=class_names, training=training,
            root_path=root_path, logger=logger,
        )
        self.infos = []
        for info_path in dataset_cfg.INFO_PATH[self.mode]:
            p = Path(info_path)
            if not p.is_absolute():
                p = self.root_path / info_path
            if p.exists():
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if self.training and dataset_cfg.get("BALANCED_RESAMPLING", False):
            self.infos = self._balanced_resample(self.infos)
        if logger:
            logger.info(f"NuScenesDataset: {len(self.infos)} samples")

    def _balanced_resample(self, infos):
        """Duplicate-sample so every class appears ~uniformly
        (reference balanced_infos_resampling:66-106)."""
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info["gt_names"].tolist()):
                if name in cls_infos:
                    cls_infos[name].append(info)
        duplicated = sum(len(v) for v in cls_infos.values())
        if duplicated == 0:
            return infos
        frac = 1.0 / max(len(self.class_names), 1)
        out = []
        for v in cls_infos.values():
            if len(v) == 0:
                continue
            ratio = frac / (len(v) / duplicated)
            take = int(len(v) * ratio)
            idx = np.random.choice(len(v), take, replace=True) if take else []
            out.extend(v[i] for i in idx)
        return out or infos

    def __len__(self):
        if self._merge_all_iters_to_one_epoch:
            return len(self.infos) * max(self.total_epochs, 1)
        return len(self.infos)

    def __getitem__(self, index):
        from .nuscenes_tables import read_nuscenes_lidar

        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = self.infos[index]
        points = read_nuscenes_lidar(self.root_path / info["lidar_path"])

        # minimum-radius self-returns filter (reference :37-45)
        radius = float(self.dataset_cfg.get("MIN_POINT_RADIUS", 1.0))
        keep = np.linalg.norm(points[:, 0:2], axis=1) > radius
        points = points[keep]

        input_dict = {
            "frame_id": info["token"],
            "points": points,
            "gt_boxes": info["gt_boxes"].copy(),
            "gt_names": info["gt_names"].copy(),
        }
        data_dict = self.prepare_data(input_dict)
        if data_dict.pop("_needs_resample", False):
            return self.__getitem__(np.random.randint(len(self)))
        return data_dict

    def generate_prediction_dicts(self, batch_meta, pred_dicts, class_names,
                                  output_path=None):
        """Lidar-frame annos for the KITTI-style eval path (no camera geometry
        required: bbox/alpha filled with sentinels, locations carried in the
        camera-convention layout via identity calib)."""
        annos = []
        for i, box_dict in enumerate(pred_dicts):
            boxes = np.asarray(box_dict["pred_boxes"])
            labels = np.asarray(box_dict["pred_labels"]).astype(np.int64)
            n = len(boxes)
            annos.append(
                {
                    "frame_id": batch_meta.frame_ids[i],
                    "name": np.array(
                        [class_names[l - 1] for l in labels], dtype="<U32"
                    ),
                    "score": np.asarray(box_dict["pred_scores"]),
                    "boxes_lidar": boxes[:, :7],
                    "pred_labels": labels,
                }
            )
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """KITTI-style AP over lidar boxes (the reference's `kitti`
        EVAL_METRIC alternative; the devkit NuScenesEval needs the external
        nuscenes package)."""
        from ..eval import kitti_eval

        def to_kitti(boxes, names, scores=None):
            n = len(boxes)
            d = {
                "name": np.asarray(names),
                "truncated": np.zeros(n),
                "occluded": np.zeros(n),
                "alpha": np.full(n, -10.0),
                "bbox": np.tile([0, 0, 200, 200.0], (n, 1)),
                # camera layout [x=−y_l, y, z=x_l], dims (l, h, w), ry=−heading−π/2
                "dimensions": boxes[:, [3, 5, 4]] if n else np.zeros((0, 3)),
                "location": np.stack(
                    [-boxes[:, 1], -boxes[:, 2], boxes[:, 0]], axis=1
                ) if n else np.zeros((0, 3)),
                "rotation_y": (-boxes[:, 6] - np.pi / 2) if n else np.zeros(0),
            }
            if scores is not None:
                d["score"] = np.asarray(scores)
            return d

        gt_annos = [
            to_kitti(info["gt_boxes"], info["gt_names"]) for info in self.infos
        ]
        dt_annos = [
            to_kitti(a["boxes_lidar"], a["name"], a["score"]) for a in det_annos
        ]
        return kitti_eval.get_official_eval_result(gt_annos, dt_annos, class_names)
