"""Native NuScenesDataset tests on the synthetic raw-table database."""
import numpy as np
import pytest

from dfu3d_tpu.data.nuscenes_dataset import NuScenesDataset, create_nuscenes_infos
from dfu3d_tpu.utils.config import CfgDict

from test_nuscenes2kitti import nusc_root  # noqa: F401


def _cfg(root):
    return CfgDict(
        {
            "DATASET": "NuScenesDataset",
            "DATA_PATH": str(root),
            "POINT_CLOUD_RANGE": [-25.6, -25.6, -3, 25.6, 25.6, 3],
            "DATA_SPLIT": {"train": "train", "test": "val"},
            "INFO_PATH": {"train": ["nuscenes_infos.pkl"],
                          "test": ["nuscenes_infos.pkl"]},
            "MAX_POINTS_PER_FRAME": 2048,
            "MAX_GT_PER_FRAME": 32,
            "BALANCED_RESAMPLING": False,
            "POINT_FEATURE_ENCODING": {
                "encoding_type": "absolute_coordinates_encoding",
                "used_feature_list": ["x", "y", "z", "intensity"],
                "src_feature_list": ["x", "y", "z", "intensity"],
            },
            "DATA_PROCESSOR": [
                {"NAME": "mask_points_and_boxes_outside_range",
                 "REMOVE_OUTSIDE_BOXES": True},
                {"NAME": "shuffle_points",
                 "SHUFFLE_ENABLED": {"train": True, "test": False}},
                {"NAME": "transform_points_to_voxels_placeholder",
                 "VOXEL_SIZE": [0.2, 0.2, 6.0]},
            ],
        }
    )


class TestNuScenesDataset:
    def test_infos_and_getitem(self, nusc_root):
        infos = create_nuscenes_infos(
            nusc_root, "v1.0-mini",
            save_path=nusc_root / "nuscenes_infos.pkl",
        )
        assert len(infos) == 1
        assert infos[0]["gt_names"].tolist() == ["Car"]
        # the car sits at nu-lidar (0, 10, 1) with heading -pi/2 in the lidar
        # frame (global +x = lidar -... verified by geometry): check position
        box = infos[0]["gt_boxes"][0]
        assert np.allclose(box[:3], [0, 10, 1], atol=0.05), box
        assert np.allclose(sorted(box[3:6]), [1.6, 1.8, 4.0], atol=0.01)

        ds = NuScenesDataset(
            _cfg(nusc_root), ["Car"], training=False, root_path=nusc_root
        )
        assert len(ds) == 1
        item = ds[0]
        assert len(item["points"]) > 0
        assert item["gt_boxes"].shape[1] == 8

        # eval round-trip: gt as predictions → AP table produced
        from dfu3d_tpu.data.dataset import BatchMeta

        preds = [{
            "pred_boxes": infos[0]["gt_boxes"],
            "pred_scores": np.array([0.9]),
            "pred_labels": np.array([1]),
        }]
        meta = BatchMeta([infos[0]["token"]], [None], [None])
        annos = ds.generate_prediction_dicts(meta, preds, ["Car"])
        result_str, ret = ds.evaluation(annos, ["Car"])
        assert "car" in result_str.lower()


class TestMultiSweep:
    def test_sweep_transform_and_time_channel(self, nusc_root, tmp_path):
        """A sweep recorded with a known sweep→key transform lands its points
        in the key frame with the time-lag channel appended."""
        import pickle

        infos = create_nuscenes_infos(
            nusc_root, "v1.0-mini", max_sweeps=3,
        )
        assert "sweeps" in infos[0] and infos[0]["sweeps"] == []  # no prev chain
        assert "lidar2global" in infos[0]

        # synthesize a sweep: pure translation (+2, 0, 0) and 0.1 s lag
        sweep_pts = np.zeros((5, 5), np.float32)
        sweep_pts[:, 0] = np.arange(5) + 10
        sweep_pts[:, 3] = 0.5
        (nusc_root / "sweeps").mkdir(exist_ok=True)
        sweep_pts.tofile(nusc_root / "sweeps" / "s1.pcd.bin")
        tf = np.eye(4, dtype=np.float32)
        tf[0, 3] = 2.0
        info = dict(infos[0])
        info["sweeps"] = [{"lidar_path": "sweeps/s1.pcd.bin", "transform": tf,
                           "time_lag": 0.1}]
        with open(nusc_root / "nuscenes_infos_sw.pkl", "wb") as f:
            pickle.dump([info], f)

        cfg = _cfg(nusc_root)
        cfg["INFO_PATH"] = {"train": ["nuscenes_infos_sw.pkl"],
                            "test": ["nuscenes_infos_sw.pkl"]}
        cfg["MAX_SWEEPS"] = 3
        ds = NuScenesDataset(cfg, ["Car"], training=False, root_path=nusc_root)
        pts = ds._load_points(info)
        assert pts.shape[1] == 5  # x y z i t
        key_n = len(pts) - 5
        assert np.all(pts[:key_n, 4] == 0.0)
        sweep_loaded = pts[key_n:]
        np.testing.assert_allclose(sweep_loaded[:, 0], np.arange(5) + 12,
                                   atol=1e-5)
        np.testing.assert_allclose(sweep_loaded[:, 4], 0.1, atol=1e-7)

    def test_results_json(self, nusc_root, tmp_path):
        import json

        infos = create_nuscenes_infos(
            nusc_root, "v1.0-mini",
            save_path=nusc_root / "nuscenes_infos.pkl",
        )
        ds = NuScenesDataset(_cfg(nusc_root), ["Car"], training=False,
                             root_path=nusc_root)
        annos = [{
            "frame_id": infos[0]["token"],
            "name": np.array(["Car"]),
            "score": np.array([0.8]),
            "boxes_lidar": infos[0]["gt_boxes"],
            "pred_labels": np.array([1]),
        }]
        out = ds.write_nuscenes_results_json(annos, tmp_path / "results.json")
        payload = json.loads(out.read_text())
        assert payload["meta"]["use_lidar"]
        dets = payload["results"][infos[0]["token"]]
        assert len(dets) == 1
        d = dets[0]
        assert d["detection_name"] == "car"
        # round-trip: global translation back through inv(lidar2global)
        tf = np.asarray(infos[0]["lidar2global"], np.float64)
        back = np.linalg.inv(tf) @ np.array([*d["translation"], 1.0])
        np.testing.assert_allclose(back[:3], infos[0]["gt_boxes"][0, :3],
                                   atol=1e-3)
        assert sorted(d["size"]) == sorted(
            [float(x) for x in infos[0]["gt_boxes"][0, [4, 3, 5]]]
        )
