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
        # 9-dim infos → velocity-width contract: [x y z dx dy dz rot vx vy cls]
        assert item["gt_boxes"].shape[1] == 10
        # the isolated annotation has nan velocity, zeroed at load
        assert np.allclose(item["gt_boxes"][:, 7:9], 0.0)

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


@pytest.fixture
def nusc_root_velo(nusc_root):
    """Extend the synthetic database with a prev/next annotation chain so the
    key-frame car carries a finite-difference velocity (devkit box_velocity
    semantics): global positions 9.5→10.0→10.5 in x and +0.25→0→−0.25 in y
    over 1.0 s ⇒ v_global = (1.0, −0.5) m/s."""
    import json

    tdir = nusc_root / "v1.0-mini"

    def load(name):
        return json.loads((tdir / f"{name}.json").read_text())

    samples = load("sample")
    samples[0]["timestamp"] = 500000  # µs
    samples += [
        {"token": "samp_prev", "scene_token": "scene0", "timestamp": 0},
        {"token": "samp_next", "scene_token": "scene0", "timestamp": 1000000},
    ]
    sd = load("sample_data")
    for tok, samp in (("sd_lid_p", "samp_prev"), ("sd_lid_n", "samp_next")):
        sd.append({
            "token": tok, "sample_token": samp, "is_key_frame": True,
            "calibrated_sensor_token": "cs_lid", "ego_pose_token": "pose0",
            "filename": "samples/LIDAR_TOP/lid0.pcd.bin", "next": "",
        })
    anns = load("sample_annotation")
    anns[0]["prev"] = "ann_prev"
    anns[0]["next"] = "ann_next"
    anns += [
        {"token": "ann_prev", "sample_token": "samp_prev",
         "category_token": "cat_car", "translation": [9.5, 0.25, 1.0],
         "size": [1.8, 4.0, 1.6], "rotation": [1, 0, 0, 0],
         "prev": "", "next": "ann0"},
        {"token": "ann_next", "sample_token": "samp_next",
         "category_token": "cat_car", "translation": [10.5, -0.25, 1.0],
         "size": [1.8, 4.0, 1.6], "rotation": [1, 0, 0, 0],
         "prev": "ann0", "next": ""},
    ]
    (tdir / "sample.json").write_text(json.dumps(samples))
    (tdir / "sample_data.json").write_text(json.dumps(sd))
    (tdir / "sample_annotation.json").write_text(json.dumps(anns))
    return nusc_root


class TestVelocity:
    def test_box_velocity_devkit_semantics(self, nusc_root_velo):
        from dfu3d_tpu.data.nuscenes_tables import NuScenesTables

        nusc = NuScenesTables(nusc_root_velo, "v1.0-mini")
        ann0 = nusc.get("sample_annotation", "ann0")
        # central difference over the full prev→next window
        np.testing.assert_allclose(
            nusc.box_velocity(ann0), [1.0, -0.5, 0.0], atol=1e-9)
        # one-sided at track ends
        np.testing.assert_allclose(
            nusc.box_velocity(nusc.get("sample_annotation", "ann_prev")),
            [1.0, -0.5, 0.0], atol=1e-9)
        # isolated annotation → nan
        lone = {"token": "x", "sample_token": "samp0",
                "translation": [0, 0, 0], "prev": "", "next": ""}
        assert np.isnan(nusc.box_velocity(lone)).all()
        # stale gap (> max_time_diff) → nan
        assert np.isnan(nusc.box_velocity(ann0, max_time_diff=0.4)).all()

    def test_infos_carry_lidar_frame_velocity(self, nusc_root_velo):
        infos = create_nuscenes_infos(
            nusc_root_velo, "v1.0-mini",
            save_path=nusc_root_velo / "nuscenes_infos.pkl",
        )
        by_tok = {i["token"]: i for i in infos}
        box = by_tok["samp0"]["gt_boxes"][0]
        assert box.shape == (9,)
        # lidar = ego rotated by +90° about z (fixture cs rotation −90°):
        # v_lidar = rot(+90°) @ (1.0, −0.5) = (0.5, 1.0)
        np.testing.assert_allclose(box[7:9], [0.5, 1.0], atol=1e-6)

    def test_batch_contract_and_augmentor(self, nusc_root_velo):
        create_nuscenes_infos(
            nusc_root_velo, "v1.0-mini",
            save_path=nusc_root_velo / "nuscenes_infos.pkl",
        )
        ds = NuScenesDataset(_cfg(nusc_root_velo), ["Car"], training=False,
                             root_path=nusc_root_velo)
        assert ds.gt_box_width == 9
        items = [ds[i] for i in range(len(ds))]
        batch, _ = ds.collate_batch(items)
        assert batch.gt_boxes.shape[-1] == 10
        # class id rides in the LAST column; velocity in 7:9
        key = [i for i, it in enumerate(items)
               if it["frame_id"] == "samp0"][0]
        assert batch.gt_boxes[key, 0, -1] == 1.0
        np.testing.assert_allclose(batch.gt_boxes[key, 0, 7:9], [0.5, 1.0],
                                   atol=1e-6)

        # global rotation carries the velocity vector along
        from dfu3d_tpu.data.augmentor_utils import global_rotation

        g9 = np.asarray(
            [[0, 10, 1, 4.0, 1.8, 1.6, 0.0, 0.5, 1.0]], np.float32)
        rot, _, ang = global_rotation(g9, np.zeros((1, 4), np.float32),
                                      [np.pi / 2, np.pi / 2], np.random)
        np.testing.assert_allclose(rot[0, 7:9], [-1.0, 0.5], atol=1e-6)
