"""nuScenes→KITTI converter test on a synthetic raw-JSON database.

A car is placed at a known global position; after conversion, reading the
KITTI artifacts back through our Calibration/label path must recover the box
at the correct KITTI-lidar-frame location.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from dfu3d_tpu.data.nuscenes_tables import Quaternion


def _quat(axis, angle):
    return Quaternion(axis=axis, angle=angle).q.tolist()


@pytest.fixture
def nusc_root(tmp_path):
    root = tmp_path / "nuscenes"
    tdir = root / "v1.0-mini"
    tdir.mkdir(parents=True)
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)

    # lidar points in the nuScenes LIDAR frame (x right, y forward):
    # a cluster around the car at nu-lidar (0, 10, 1)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (100, 3)) + [0, 10, 1]
    raw = np.concatenate(
        [pts, rng.uniform(0, 1, (100, 1)), np.zeros((100, 1))], axis=1
    ).astype(np.float32)
    raw.tofile(root / "samples" / "LIDAR_TOP" / "lid0.pcd.bin")

    # R_lid2ego = rotation −90° about z (x right, y forward sensor frame)
    lid_rot = _quat((0, 0, 1), -np.pi / 2)
    # camera: z forward, x right, y down mounted looking along ego +x
    cam_mat = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], dtype=float)
    cam_rot = Quaternion(matrix=cam_mat).q.tolist()

    tables = {
        "sensor": [
            {"token": "sen_lid", "channel": "LIDAR_TOP", "modality": "lidar"},
            {"token": "sen_cam", "channel": "CAM_FRONT", "modality": "camera"},
        ],
        "calibrated_sensor": [
            {"token": "cs_lid", "sensor_token": "sen_lid",
             "translation": [0, 0, 0], "rotation": lid_rot,
             "camera_intrinsic": []},
            {"token": "cs_cam", "sensor_token": "sen_cam",
             "translation": [0, 0, 1.5], "rotation": cam_rot,
             "camera_intrinsic": [[1266.0, 0, 800.0], [0, 1266.0, 450.0], [0, 0, 1]]},
        ],
        "ego_pose": [
            {"token": "pose0", "translation": [0, 0, 0], "rotation": [1, 0, 0, 0]},
        ],
        "log": [{"token": "log0", "logfile": "log0"}],
        "scene": [{"token": "scene0", "log_token": "log0", "name": "scene-0001"}],
        "sample": [
            {"token": "samp0", "scene_token": "scene0", "timestamp": 0},
        ],
        "sample_data": [
            {"token": "sd_lid", "sample_token": "samp0", "is_key_frame": True,
             "calibrated_sensor_token": "cs_lid", "ego_pose_token": "pose0",
             "filename": "samples/LIDAR_TOP/lid0.pcd.bin", "next": ""},
            {"token": "sd_cam", "sample_token": "samp0", "is_key_frame": True,
             "calibrated_sensor_token": "cs_cam", "ego_pose_token": "pose0",
             "filename": "samples/CAM_FRONT/cam0.jpg", "next": ""},
        ],
        "category": [{"token": "cat_car", "name": "vehicle.car"}],
        "sample_annotation": [
            {
                "token": "ann0", "sample_token": "samp0",
                "category_token": "cat_car",
                # global: 10 m ahead of the ego, heading along +x (ego fwd)
                "translation": [10.0, 0.0, 1.0],
                "size": [1.8, 4.0, 1.6],  # w, l, h
                "rotation": [1, 0, 0, 0],
            },
        ],
    }
    for name, rows in tables.items():
        (tdir / f"{name}.json").write_text(json.dumps(rows))
    return root


class TestConverter:
    def test_roundtrip_geometry(self, nusc_root, tmp_path):
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        from nuscenes2kitti import convert

        out = convert(
            nusc_root, tmp_path / "kitti", split="all", image_count=10,
            nusc_version="v1.0-mini",
        )
        assert (out / "velodyne" / "000000.bin").exists()
        assert (out / "calib" / "000000.txt").exists()

        # lidar rotated into the KITTI frame: cluster now at (10, 0, 1)
        pts = np.fromfile(out / "velodyne" / "000000.bin", np.float32).reshape(-1, 4)
        assert np.allclose(pts[:, :3].mean(0), [10, 0, 1], atol=0.2)

        # calib asserts the canonical KITTI velo→cam pattern
        from dfu3d_tpu.core.geometry.calibration import Calibration

        calib = Calibration(out / "calib" / "000000.txt")
        assert np.allclose(
            np.round(calib.V2C[:, :3]),
            np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]]),
        )

        # label → lidar box recovers the car at (10, 0, 1) with l=4 w=1.8 h=1.6
        from dfu3d_tpu.data import kitti_io

        objs = kitti_io.get_objects_from_label(out / "label_2" / "000000.txt")
        assert len(objs) == 1 and objs[0].cls_type == "Car"
        o = objs[0]
        assert (o.l, o.w, o.h) == pytest.approx((4.0, 1.8, 1.6), abs=0.01)
        loc_lidar = calib.rect_to_lidar(o.loc[None])[0]
        loc_lidar[2] += o.h / 2
        assert np.allclose(loc_lidar, [10, 0, 1], atol=0.05), loc_lidar
        heading = -(o.ry + np.pi / 2)
        # nuScenes yaw identity → heading 0 in KITTI lidar
        assert abs(((heading + np.pi) % (2 * np.pi)) - np.pi) < 0.02
        # 2D bbox lands around the image center (car dead ahead)
        assert 0 <= o.box2d[0] < 800 < o.box2d[2] <= 1600
        # ImageSets written
        assert (out / "ImageSets" / "all_10.txt").read_text().strip() == "000000"
