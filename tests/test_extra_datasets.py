"""ONCE / Custom / Waymo / Lyft / Pandaset / Argo2 dataset + evaluator tests
on synthetic fixtures."""
import json
import pickle

import numpy as np
import pytest

from dfu3d_tpu.utils.config import CfgDict


def _processor_cfg():
    return {
        "POINT_CLOUD_RANGE": [-25.6, -25.6, -3, 25.6, 25.6, 3],
        "MAX_POINTS_PER_FRAME": 2048,
        "MAX_GT_PER_FRAME": 16,
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": False,
                                                           "test": False}},
            {"NAME": "transform_points_to_voxels_placeholder",
             "VOXEL_SIZE": [0.2, 0.2, 6.0]},
        ],
    }


def _boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(-15, 15, n)
    b[:, 1] = rng.uniform(-15, 15, n)
    b[:, 2] = rng.uniform(-1, 0, n)
    b[:, 3:6] = rng.uniform(1, 4, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def _points(rng, n=500):
    p = rng.uniform(-20, 20, (n, 4)).astype(np.float32)
    p[:, 2] = rng.uniform(-2, 1, n)
    p[:, 3] = rng.uniform(0, 1, n)
    return p


class TestONCE:
    def test_infos_getitem_eval(self, tmp_path):
        from dfu3d_tpu.data.once_dataset import ONCEDataset, create_once_infos

        rng = np.random.RandomState(0)
        seq = "000077"
        seq_dir = tmp_path / "data" / seq
        (seq_dir / "lidar_roof").mkdir(parents=True)
        frames = []
        for i in range(3):
            fid = f"{1000 + i}"
            _points(rng).tofile(seq_dir / "lidar_roof" / f"{fid}.bin")
            boxes = _boxes(rng, 4)
            frames.append({
                "frame_id": fid, "pose": np.eye(4).tolist(),
                "annos": {"names": ["Car", "Bus", "Truck", "Pedestrian"],
                          "boxes_3d": boxes.tolist()},
            })
        (seq_dir / f"{seq}.json").write_text(json.dumps(
            {"meta_info": {}, "calib": {}, "frames": frames}))
        (tmp_path / "ImageSets").mkdir()
        (tmp_path / "ImageSets" / "train.txt").write_text(seq + "\n")

        cfg = CfgDict({
            "DATASET": "ONCEDataset", "DATA_PATH": str(tmp_path),
            "DATA_SPLIT": {"train": "train", "test": "train"},
            "INFO_PATH": {"train": ["once_infos_train.pkl"],
                          "test": ["once_infos_train.pkl"]},
            **_processor_cfg(),
        })
        classes = ["Car", "Bus", "Truck", "Pedestrian", "Cyclist"]
        create_once_infos(cfg, classes, tmp_path, tmp_path, splits=("train",))
        ds = ONCEDataset(cfg, classes, training=False, root_path=tmp_path)
        assert len(ds) == 3
        item = ds[0]
        assert item["gt_boxes"].shape[1] == 8

        # gt-as-predictions → near-100 overall AP
        from dfu3d_tpu.data.dataset import BatchMeta

        preds = [{
            "pred_boxes": np.asarray(info["annos"]["boxes_3d"]),
            "pred_scores": np.full(len(info["annos"]["name"]), 0.9),
            "pred_labels": np.array(
                [classes.index(n) + 1 for n in info["annos"]["name"]]
            ),
        } for info in ds.once_infos]
        meta = BatchMeta([i["frame_id"] for i in ds.once_infos], [None] * 3,
                         [None] * 3)
        annos = ds.generate_prediction_dicts(meta, preds, classes)
        result_str, ret = ds.evaluation(annos, classes)
        assert ret["AP_Vehicle/overall"] > 95, ret
        assert ret["AP_mean/overall"] > 60, ret  # cyclist absent → 0

        # gt database
        db = ds.create_groundtruth_database(
            tmp_path / "once_infos_train.pkl", used_classes=classes
        )
        assert db.exists()

    def test_heading_gate(self):
        from dfu3d_tpu.eval.once_eval import iou3d_with_heading

        b = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
        flipped = b.copy()
        flipped[0, 6] = np.pi * 0.9  # >90° off
        assert iou3d_with_heading(b, b)[0, 0] > 0.99
        assert iou3d_with_heading(b, flipped)[0, 0] == 0.0
        assert iou3d_with_heading(b, flipped, with_heading=False)[0, 0] > 0.5


class TestCustom:
    def test_roundtrip(self, tmp_path):
        from dfu3d_tpu.data.custom_dataset import (
            CustomDataset, create_custom_infos,
        )

        rng = np.random.RandomState(1)
        (tmp_path / "points").mkdir()
        (tmp_path / "labels").mkdir()
        (tmp_path / "ImageSets").mkdir()
        ids = []
        for i in range(15):
            idx = f"{i:06d}"
            np.save(tmp_path / "points" / f"{idx}.npy", _points(rng))
            boxes = _boxes(rng, 4)
            lines = [
                " ".join(f"{v:.3f}" for v in b) + " Vehicle" for b in boxes
            ]
            (tmp_path / "labels" / f"{idx}.txt").write_text("\n".join(lines))
            ids.append(idx)
        (tmp_path / "ImageSets" / "train.txt").write_text("\n".join(ids))

        cfg = CfgDict({
            "DATASET": "CustomDataset", "DATA_PATH": str(tmp_path),
            "DATA_SPLIT": {"train": "train", "test": "train"},
            "INFO_PATH": {"train": ["custom_infos_train.pkl"],
                          "test": ["custom_infos_train.pkl"]},
            "MAP_CLASS_TO_KITTI": {"Vehicle": "Car"},
            **_processor_cfg(),
        })
        create_custom_infos(cfg, ["Vehicle"], tmp_path, tmp_path,
                            splits=("train",))
        ds = CustomDataset(cfg, ["Vehicle"], training=False,
                           root_path=tmp_path)
        assert len(ds) == 15
        item = ds[1]
        assert (item["gt_boxes"][:, 7] == 1).all()

        from dfu3d_tpu.data.dataset import BatchMeta

        preds = [{
            "pred_boxes": info["annos"]["gt_boxes_lidar"],
            "pred_scores": rng.uniform(0.5, 1.0, 4),
            "pred_labels": np.ones(4, np.int64),
        } for info in ds.custom_infos]
        meta = BatchMeta(ids, [None] * 15, [None] * 15)
        annos = ds.generate_prediction_dicts(meta, preds, ["Vehicle"])
        _, ret = ds.evaluation(annos, ["Vehicle"])
        assert ret["Car_3d/moderate_R40"] > 95, ret


class TestWaymo:
    def test_processed_layout(self, tmp_path):
        from dfu3d_tpu.data.waymo_dataset import WaymoDataset

        rng = np.random.RandomState(2)
        seq = "segment-123"
        seq_dir = tmp_path / "waymo_processed_data" / seq
        seq_dir.mkdir(parents=True)
        infos = []
        for i in range(4):
            pts = np.concatenate(
                [_points(rng), np.zeros((500, 1), np.float32),
                 np.full((500, 1), -1, np.float32)], axis=1)
            np.save(seq_dir / f"{i:04d}.npy", pts)
            infos.append({
                "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
                "frame_id": f"{seq}_{i}",
                "annos": {"name": np.array(["Vehicle"] * 20 + ["Pedestrian"] * 5),
                          "gt_boxes_lidar": _boxes(rng, 25),
                          "num_points_in_gt": np.full(25, 10)},
            })
        with open(seq_dir / f"{seq}.pkl", "wb") as f:
            pickle.dump(infos, f)
        (tmp_path / "ImageSets").mkdir()
        (tmp_path / "ImageSets" / "train.txt").write_text(seq + ".tfrecord\n")

        cfg = CfgDict({
            "DATASET": "WaymoDataset", "DATA_PATH": str(tmp_path),
            "PROCESSED_DATA_TAG": "waymo_processed_data",
            "DATA_SPLIT": {"train": "train", "test": "train"},
            "SAMPLED_INTERVAL": {"train": 2, "test": 1},
            "INFO_PATH": {"train": [], "test": []},
            **_processor_cfg(),
        })
        classes = ["Vehicle", "Pedestrian", "Cyclist"]
        ds = WaymoDataset(cfg, classes, training=False, root_path=tmp_path)
        assert len(ds) == 4  # test-split SAMPLED_INTERVAL = 1
        item = ds[0]
        assert item["points"].shape[1] == 4

        from dfu3d_tpu.data.dataset import BatchMeta

        preds = [{
            "pred_boxes": info["annos"]["gt_boxes_lidar"],
            "pred_scores": rng.uniform(0.5, 1.0, 25),
            "pred_labels": np.array([1] * 20 + [2] * 5),
        } for info in ds.infos]
        meta = BatchMeta([i["frame_id"] for i in ds.infos],
                         [None] * len(ds.infos), [None] * len(ds.infos))
        annos = ds.generate_prediction_dicts(meta, preds, classes)
        _, ret = ds.evaluation(annos, classes)
        assert ret["Car_3d/moderate_R40"] > 95, ret

        # EVAL_METRIC: waymo → official-metric artifact contract (the
        # waymo-open-dataset package is absent here, so the annos are dumped
        # with the out-of-process command; reference waymo_eval.py path)
        ds.dataset_cfg["EVAL_METRIC"] = "waymo"
        text, ret = ds.evaluation(annos, classes, output_path=str(tmp_path))
        assert "det_annos" in ret and "command" in ret
        with open(ret["det_annos"], "rb") as f:
            dumped = pickle.load(f)
        assert len(dumped) == len(annos)

    def test_official_metric_marshalling(self):
        """_flatten reproduces the reference's difficulty-upgrade and
        class-id rules (waymo_eval.py:41-57)."""
        from dfu3d_tpu.eval.waymo_official import _flatten

        gt = [{
            "name": np.array(["Vehicle", "Pedestrian", "Cyclist", "Vehicle",
                              "Sign", "unknown"]),
            "gt_boxes_lidar": np.tile(
                np.array([[0, 0, 0, 4, 2, 1.5, 4.0]], np.float32), (6, 1)),
            "num_points_in_gt": np.array([10, 3, 0, 7, 9, 5]),
            "difficulty": np.array([0, 0, 0, 2, 0, 0]),
        }]
        fid, boxes, types, scores, diffs = _flatten(
            gt, ["Vehicle", "Pedestrian", "Cyclist"], is_gt=True)
        # Cyclist dropped (0 pts), Sign and unknown dropped (not in classes)
        assert list(types) == [1, 2, 1]  # Vehicle, Pedestrian, Vehicle ids
        assert list(diffs) == [1, 2, 2]  # >5 pts → L1, ≤5 → L2, explicit 2
        assert np.all(np.abs(boxes[:, 6]) <= np.pi)  # heading wrapped


class TestLyftPandasetArgo2:
    def test_lyft_map(self):
        from dfu3d_tpu.data.lyft_dataset import lyft_average_precisions

        rng = np.random.RandomState(3)
        boxes = _boxes(rng, 5)
        gt = [{"name": np.array(["car"] * 5), "boxes_lidar": boxes}]
        det = [{"name": np.array(["car"] * 5), "boxes_lidar": boxes,
                "score": np.full(5, 0.9)}]
        aps = lyft_average_precisions(gt, det, ["car"])
        assert aps.min() > 0.95  # perfect detections at every threshold

        # shifted detections fail at high IoU thresholds
        det2 = [{"name": np.array(["car"] * 5),
                 "boxes_lidar": boxes + np.array([0.4, 0, 0, 0, 0, 0, 0]),
                 "score": np.full(5, 0.9)}]
        aps2 = lyft_average_precisions(gt, det2, ["car"])
        assert aps2[0, 0] > aps2[-1, 0]

    def test_pandaset_argo2_layout(self, tmp_path):
        from dfu3d_tpu.data.pandaset_dataset import (
            _ConvertedLidarDataset, PandasetDataset,
        )

        class Argo2Dataset(_ConvertedLidarDataset):
            # the pre-round-3 converted-contract alias shape (the native
            # Argo2Dataset now lives in data/argo2_dataset.py)
            INFO_PREFIX = "pandaset"
            CLASS_MAP = PandasetDataset.CLASS_MAP

        rng = np.random.RandomState(4)
        (tmp_path / "points").mkdir()
        infos = []
        for i in range(2):
            fid = f"f{i}"
            np.save(tmp_path / "points" / f"{fid}.npy", _points(rng))
            infos.append({
                "frame_id": fid,
                "annos": {"name": np.array(["Car"] * 22 + ["Pedestrian"] * 3),
                          "gt_boxes_lidar": _boxes(rng, 25)},
            })
        with open(tmp_path / "pandaset_infos_train.pkl", "wb") as f:
            pickle.dump(infos, f)

        cfg = CfgDict({
            "DATASET": "PandasetDataset", "DATA_PATH": str(tmp_path),
            "DATA_SPLIT": {"train": "train", "test": "train"},
            "INFO_PATH": {"train": ["pandaset_infos_train.pkl"],
                          "test": ["pandaset_infos_train.pkl"]},
            **_processor_cfg(),
        })
        for cls_ in (PandasetDataset, Argo2Dataset):
            ds = cls_(cfg, ["Car", "Pedestrian"], training=False,
                      root_path=tmp_path)
            assert len(ds) == 2
            item = ds[0]
            assert item["gt_boxes"].shape[1] == 8

            from dfu3d_tpu.data.dataset import BatchMeta

            preds = [{
                "pred_boxes": info["annos"]["gt_boxes_lidar"],
                "pred_scores": rng.uniform(0.5, 1.0, 25),
                "pred_labels": np.array([1] * 22 + [2] * 3),
            } for info in ds.infos]
            meta = BatchMeta(["f0", "f1"], [None, None], [None, None])
            annos = ds.generate_prediction_dicts(meta, preds,
                                                 ["Car", "Pedestrian"])
            _, ret = ds.evaluation(annos, ["Car", "Pedestrian"])
            assert ret["Car_3d/moderate_R40"] > 95, ret

    def test_argo2_native(self, tmp_path):
        """Native AV2 loader: feather fixture → convert → load → gt-roundtrip
        AP (reference argo2_dataset.py; so3 quat↔yaw)."""
        import pandas as pd

        from dfu3d_tpu.data.argo2_dataset import (
            Argo2Dataset, LABEL_ATTR, convert_av2_sensor, quat_to_yaw,
            yaw_to_quat,
        )

        # SO3 roundtrip
        yaws = np.linspace(-np.pi + 0.01, np.pi - 0.01, 17)
        np.testing.assert_allclose(quat_to_yaw(yaw_to_quat(yaws)), yaws,
                                   atol=1e-9)

        rng = np.random.RandomState(5)
        av2 = tmp_path / "sensor"
        # ≥41 gts total: the KITTI R40 protocol samples 41 recall points, so
        # fewer gts than that caps the AP of even perfect detections (the
        # reference evaluator behaves identically)
        n_obj = 25
        boxes_by_ts = {}
        for split, log in (("train", "log_a"), ("val", "log_b")):
            for ts in (1000, 2000):
                d = av2 / split / log / "sensors" / "lidar"
                d.mkdir(parents=True, exist_ok=True)
                pts = rng.uniform(-20, 20, (500, 3))
                df = pd.DataFrame({
                    "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2] * 0.05,
                    "intensity": rng.uniform(0, 255, 500),
                })
                df.to_feather(d / f"{ts}.feather")
            boxes = _boxes(rng, n_obj)
            rows = []
            for ts in (1000, 2000):
                quat = yaw_to_quat(boxes[:, 6])
                rows.append(pd.DataFrame({
                    "timestamp_ns": np.full(n_obj, ts, np.int64),
                    "tx_m": boxes[:, 0], "ty_m": boxes[:, 1],
                    "tz_m": boxes[:, 2],
                    "length_m": boxes[:, 3], "width_m": boxes[:, 4],
                    "height_m": boxes[:, 5],
                    "qw": quat[:, 0], "qx": quat[:, 1],
                    "qy": quat[:, 2], "qz": quat[:, 3],
                    "category": ["REGULAR_VEHICLE"] * n_obj,
                    "num_interior_pts": np.full(n_obj, 20, np.int64),
                }))
                boxes_by_ts[(log, ts)] = boxes
            pd.concat(rows).reset_index(drop=True).to_feather(
                av2 / split / log / "annotations.feather"
            )

        out = tmp_path / "converted"
        out.mkdir()
        paths = convert_av2_sensor(av2, out)
        assert set(paths) == {"train", "val"}
        assert (out / "val_anno.feather").exists()

        cfg = CfgDict({
            "DATASET": "Argo2Dataset", "DATA_PATH": str(out),
            "DATA_SPLIT": {"train": "train", "test": "val"},
            "INFO_PATH": {"train": ["argo2_infos_train.pkl"],
                          "test": ["argo2_infos_val.pkl"]},
            **_processor_cfg(),
        })
        ds = Argo2Dataset(cfg, ["Regular_vehicle"], training=False,
                          root_path=out)
        assert len(ds) == 2
        item = ds[0]
        assert item["gt_boxes"].shape[1] == 8
        info = ds.argo2_infos[0]
        # yaw survives the quat roundtrip through conversion
        log, ts = info["uuid"].split("/")
        src = boxes_by_ts[(log, int(ts))]
        got = np.sort(info["annos"]["rotation_y"])
        want = np.sort(np.arctan2(np.sin(src[:, 6]), np.cos(src[:, 6])))
        np.testing.assert_allclose(got, want, atol=1e-6)

        from dfu3d_tpu.data.dataset import BatchMeta

        preds = []
        fids = []
        for info in ds.argo2_infos:
            a = info["annos"]
            gt = np.concatenate(
                [a["location"], a["dimensions"], a["rotation_y"][..., None]],
                axis=1,
            )
            preds.append({
                "pred_boxes": gt,
                "pred_scores": rng.uniform(0.5, 1.0, len(gt)),
                "pred_labels": np.ones(len(gt), np.int64),
            })
            fids.append(info["sample_idx"])
        meta = BatchMeta(fids, [None] * len(fids), [None] * len(fids))
        annos = ds.generate_prediction_dicts(meta, preds, ["Regular_vehicle"])
        # submission marshalling: LABEL_ATTR columns + uppercase categories
        dts = ds.format_results(annos)
        assert set(LABEL_ATTR) <= set(dts.columns)
        assert (dts["category"] == "REGULAR_VEHICLE").all()
        # gt-roundtrip AP through the fallback KITTI-protocol eval
        _, ret = ds.evaluation(annos, ["Regular_vehicle"])
        assert ret["Car_3d/moderate_R40"] > 95, ret
