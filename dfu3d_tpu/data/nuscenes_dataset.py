"""Native nuScenes dataset (reference: pcdet/datasets/nuscenes/
nuscenes_dataset.py) — devkit-free, built on the raw-table reader
(nuscenes_tables.py).

Covers: info generation from the raw JSON tables (boxes in the nuScenes lidar
frame + per-class counts, per-sample lidar→global transforms, multi-sweep
entries with sweep→key-frame transforms and time lags), class-balanced epoch
resampling (:66-106), minimum-radius point filtering, MAX_SWEEPS>1 sweep
accumulation with a trailing time-lag point channel (reference
get_lidar_with_sweeps, nuscenes_dataset.py:256-300), KITTI-style AP
evaluation (the reference's `kitti` EVAL_METRIC alternative via kitti_utils),
and the official nuScenes results.json writer for out-of-process devkit
NuScenesEval (run in-process when the devkit is importable).
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


def _sweep_entries(nusc, sd_ref, max_sweeps):
    """Up to max_sweeps−1 previous sweeps with their sweep→ref transforms
    (reference nuscenes_utils.get_sweeps/obtain_sensor2top semantics)."""
    from .nuscenes_tables import Quaternion, transform_matrix

    cs_ref = nusc.get("calibrated_sensor", sd_ref["calibrated_sensor_token"])
    pose_ref = nusc.get("ego_pose", sd_ref["ego_pose_token"])
    ref_from_car = transform_matrix(
        cs_ref["translation"], Quaternion(wxyz=cs_ref["rotation"]), inverse=True
    )
    car_from_global = transform_matrix(
        pose_ref["translation"], Quaternion(wxyz=pose_ref["rotation"]),
        inverse=True,
    )
    sweeps = []
    sd = sd_ref
    while len(sweeps) < max_sweeps - 1 and sd.get("prev"):
        sd = nusc.get("sample_data", sd["prev"])
        cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose = nusc.get("ego_pose", sd["ego_pose_token"])
        global_from_car = transform_matrix(
            pose["translation"], Quaternion(wxyz=pose["rotation"])
        )
        car_from_sensor = transform_matrix(
            cs["translation"], Quaternion(wxyz=cs["rotation"])
        )
        sweep2ref = (
            ref_from_car @ car_from_global @ global_from_car @ car_from_sensor
        )
        sweeps.append({
            "lidar_path": sd["filename"],
            "transform": sweep2ref.astype(np.float32),
            "time_lag": (sd_ref["timestamp"] - sd["timestamp"]) * 1e-6,
        })
    return sweeps


def create_nuscenes_infos(dataroot, version="v1.0-trainval", max_sweeps=1,
                          save_path=None, logger=None):
    """Info pkl from raw tables (reference nuscenes_utils.fill_trainval_infos
    semantics; max_sweeps > 1 records previous-sweep paths + sweep→key-frame
    transforms + time lags, nuscenes_dataset.py:256-300)."""
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
            # 9-dim gt with the lidar-frame velocity appended (reference
            # nuscenes_utils.fill_trainval_infos:447-451: locs|dims|rot|vel);
            # isolated/stale tracks carry nan, zeroed at load time under
            # SET_NAN_VELOCITY_TO_ZEROS
            boxes.append([*box.center, l, w, h, yaw, *box.velocity[:2]])
            # KITTI-style capitalized names (reference kitti_utils
            # map_name_to_kitti) so the KITTI-protocol evaluator applies
            names.append(DEFAULT_MAP.get(det, det.capitalize()))
        from .nuscenes_tables import transform_matrix as _tm

        cs = nusc.get("calibrated_sensor", sd_lid["calibrated_sensor_token"])
        pose = nusc.get("ego_pose", sd_lid["ego_pose_token"])
        lidar2global = (
            _tm(pose["translation"], Quaternion(wxyz=pose["rotation"]))
            @ _tm(cs["translation"], Quaternion(wxyz=cs["rotation"]))
        ).astype(np.float32)
        infos.append(
            {
                "token": sample["token"],
                "lidar_path": sd_lid["filename"],
                "lidar2global": lidar2global,
                "sweeps": _sweep_entries(nusc, sd_lid, max_sweeps),
                "gt_boxes": np.asarray(boxes, np.float32).reshape(-1, 9),
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
        # velocity-width batches whenever the infos carry (vx, vy) columns
        # (9-dim infos, reference fill_trainval_infos:451); old 7-dim info
        # pkls keep the compact contract
        if any(len(i.get("gt_boxes", np.zeros((0, 7)))) and
               i["gt_boxes"].shape[1] >= 9 for i in self.infos):
            self.gt_box_width = 9
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

    def _load_points(self, info):
        """Key-frame points (+ accumulated sweeps when MAX_SWEEPS > 1, with a
        trailing time-lag channel — reference get_lidar_with_sweeps)."""
        from .nuscenes_tables import read_nuscenes_lidar

        radius = float(self.dataset_cfg.get("MIN_POINT_RADIUS", 1.0))
        max_sweeps = int(self.dataset_cfg.get("MAX_SWEEPS", 1))

        def load_one(path, transform=None, time_lag=0.0):
            pts = read_nuscenes_lidar(self.root_path / path)
            pts = pts[np.linalg.norm(pts[:, 0:2], axis=1) > radius]
            if transform is not None:
                xyz1 = np.concatenate(
                    [pts[:, :3], np.ones((len(pts), 1), np.float32)], axis=1
                )
                pts[:, :3] = (xyz1 @ np.asarray(transform, np.float32).T)[:, :3]
            if max_sweeps > 1:
                pts = np.concatenate(
                    [pts, np.full((len(pts), 1), time_lag, np.float32)], axis=1
                )
            return pts

        parts = [load_one(info["lidar_path"])]
        for sw in info.get("sweeps", [])[: max_sweeps - 1]:
            parts.append(
                load_one(sw["lidar_path"], sw["transform"], sw["time_lag"])
            )
        return np.concatenate(parts, axis=0)

    def __getitem__(self, index, _retry=0):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.infos)
        info = self.infos[index]
        points = self._load_points(info)

        gt_boxes = info["gt_boxes"].copy()
        if self.dataset_cfg.get("SET_NAN_VELOCITY_TO_ZEROS", True):
            gt_boxes[np.isnan(gt_boxes)] = 0.0
        input_dict = {
            "frame_id": info["token"],
            "points": points,
            "gt_boxes": gt_boxes,
            "gt_names": info["gt_names"].copy(),
        }
        data_dict = self.prepare_data(input_dict)
        if data_dict.pop("_needs_resample", False):
            return self.__getitem__(self._resample(_retry), _retry + 1)
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
                    # keep (vx, vy) when the model regresses velocity — the
                    # devkit results JSON reads cols 7:9 (nuscenes_utils:479)
                    "boxes_lidar": boxes[:, :9 if boxes.shape[1] >= 9 else 7],
                    "pred_labels": labels,
                }
            )
        return annos

    # default attribute per detection class (devkit eval convention)
    _DEFAULT_ATTR = {
        "car": "vehicle.parked", "truck": "vehicle.parked",
        "bus": "vehicle.moving", "trailer": "vehicle.parked",
        "construction_vehicle": "vehicle.parked",
        "pedestrian": "pedestrian.standing", "motorcycle": "cycle.without_rider",
        "bicycle": "cycle.without_rider", "barrier": "", "traffic_cone": "",
    }

    def write_nuscenes_results_json(self, det_annos, output_path):
        """Official nuScenes detection results.json (out-of-process devkit
        eval contract, like the SEEM/depth artifacts): boxes converted
        lidar→global via the per-sample lidar2global recorded in infos.
        Evaluate with the devkit where installed:
            python -m nuscenes.eval.detection.evaluate \
                --result_path results.json --eval_set val ...
        (reference nuscenes_dataset.py:256-300 / nuscenes_utils.py:588).
        """
        import json

        from .nuscenes_tables import Quaternion

        inv_map = {v: k for k, v in DEFAULT_MAP.items()}
        by_token = {info["token"]: info for info in self.infos}
        results = {}
        for anno in det_annos:
            token = anno["frame_id"]
            info = by_token.get(token)
            tf = np.asarray(
                info.get("lidar2global", np.eye(4)) if info else np.eye(4),
                np.float64,
            )
            dets = []
            boxes = np.asarray(anno["boxes_lidar"], np.float64)
            for j in range(len(boxes)):
                b = boxes[j]
                center = tf[:3, :3] @ b[:3] + tf[:3, 3]
                yaw = b[6]
                rot = tf[:3, :3] @ np.array(
                    [[np.cos(yaw), -np.sin(yaw), 0],
                     [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]]
                )
                q = Quaternion(matrix=rot).q  # (w, x, y, z)
                name = inv_map.get(str(anno["name"][j]),
                                   str(anno["name"][j]).lower())
                # lidar-frame (vx, vy) → global (reference nuscenes_utils
                # boxes_lidar_to_nusecnes:479 + lidar_nusc_box_to_global)
                vel = (tf[:3, :3] @ np.nan_to_num(np.array([b[7], b[8], 0.0]))
                       if boxes.shape[1] >= 9 else np.zeros(3))
                # speed-gated attribute (reference nuscenes_utils:526-539):
                # moving vehicles / ridden cycles above 0.2 m/s, else the
                # class's dominant static attribute
                if float(np.hypot(vel[0], vel[1])) > 0.2:
                    attr = ("vehicle.moving" if name in (
                        "car", "construction_vehicle", "bus", "truck",
                        "trailer") else "cycle.with_rider" if name in (
                        "bicycle", "motorcycle") else
                        self._DEFAULT_ATTR.get(name, ""))
                else:
                    attr = ("pedestrian.standing" if name == "pedestrian"
                            else "vehicle.stopped" if name == "bus"
                            else self._DEFAULT_ATTR.get(name, ""))
                dets.append({
                    "sample_token": token,
                    "translation": center.tolist(),
                    "size": [float(b[4]), float(b[3]), float(b[5])],  # w, l, h
                    "rotation": [float(v) for v in q],
                    "velocity": [float(vel[0]), float(vel[1])],
                    "detection_name": name,
                    "detection_score": float(anno["score"][j]),
                    "attribute_name": attr,
                })
            results[token] = dets
        payload = {
            "meta": {"use_camera": False, "use_lidar": True, "use_radar": False,
                     "use_map": False, "use_external": False},
            "results": results,
        }
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        output_path.write_text(json.dumps(payload))
        return output_path

    def evaluation(self, det_annos, class_names, **kwargs):
        """KITTI-style AP over lidar boxes (the reference's `kitti`
        EVAL_METRIC alternative). EVAL_METRIC='nuscenes' additionally writes
        the official results.json and, when the nuscenes devkit is importable,
        runs NuScenesEval in-process; otherwise the json + command are
        reported for out-of-process evaluation."""
        if kwargs.get("eval_metric") == "nuscenes" or (
            self.dataset_cfg.get("EVAL_METRIC") == "nuscenes"
        ):
            out = Path(kwargs.get("output_path", self.root_path)) / "results_nusc.json"
            self.write_nuscenes_results_json(det_annos, out)
            try:
                from nuscenes import NuScenes  # noqa: F401 (optional devkit)
                from nuscenes.eval.detection.evaluate import NuScenesEval  # noqa
            except ImportError:
                return (
                    f"nuScenes results written to {out}; install the nuscenes "
                    "devkit and run nuscenes.eval.detection.evaluate on it "
                    "(devkit not available in this environment)",
                    {"results_json": str(out)},
                )
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
