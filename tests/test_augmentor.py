"""Augmentation pipeline unit tests: transform invariants + gt-sampling."""
import pickle

import numpy as np
import pytest

from dfu3d_tpu.data import augmentor_utils as au
from dfu3d_tpu.data import np_geometry as npg
from dfu3d_tpu.data.database_sampler import DataBaseSampler
from dfu3d_tpu.utils.config import CfgDict


def _scene(rng, n_gt=3, n_pts=200):
    gt = np.zeros((n_gt, 7), np.float32)
    gt[:, 0:2] = rng.uniform(-10, 10, (n_gt, 2))
    gt[:, 2] = -1.0
    gt[:, 3:6] = rng.uniform(1, 4, (n_gt, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
    pts = rng.uniform(-15, 15, (n_pts, 4)).astype(np.float32)
    return gt, pts


class TestWorldTransforms:
    def test_flip_preserves_point_in_box(self, rng):
        gt, pts = _scene(rng)
        inside_before = npg.points_in_boxes(pts[:, :3], gt)
        gt2, pts2, enabled = au.random_flip_along_x(gt, pts, rng, force=True)
        inside_after = npg.points_in_boxes(pts2[:, :3], gt2)
        assert enabled
        assert np.array_equal(inside_before, inside_after)

    def test_rotation_preserves_point_in_box(self, rng):
        gt, pts = _scene(rng)
        inside_before = npg.points_in_boxes(pts[:, :3], gt)
        gt2, pts2, ang = au.global_rotation(gt, pts, [0.5, 0.5], rng)
        assert abs(ang - 0.5) < 1e-6
        inside_after = npg.points_in_boxes(pts2[:, :3], gt2)
        assert np.array_equal(inside_before, inside_after)

    def test_scaling_scales_everything(self, rng):
        gt, pts = _scene(rng)
        gt2, pts2, s = au.global_scaling(gt, pts, [1.1, 1.3], rng, force=1.2)
        assert abs(s - 1.2) < 1e-6
        assert np.allclose(pts2[:, :3], pts[:, :3] * 1.2, atol=1e-5)
        assert np.allclose(gt2[:, :6], gt[:, :6] * 1.2, atol=1e-5)
        assert np.allclose(gt2[:, 6], gt[:, 6])

    def test_translation(self, rng):
        gt, pts = _scene(rng)
        gt2, pts2, off = au.global_translation(gt, pts, [0.1, 0.1, 0.1], rng)
        assert np.allclose(pts2[:, :3] - pts[:, :3], off, atol=1e-6)
        assert np.allclose(gt2[:, :3] - gt[:, :3], off, atol=1e-6)


class TestDataBaseSampler:
    @pytest.fixture
    def db(self, tmp_path, rng):
        gtdb = tmp_path / "gt_database"
        gtdb.mkdir()
        infos = {"Car": []}
        for i in range(10):
            pts = rng.uniform(-1, 1, (30, 4)).astype(np.float32)
            f = gtdb / f"x_Car_{i}.bin"
            pts.tofile(f)
            infos["Car"].append(
                {
                    "name": "Car",
                    "path": f"gt_database/x_Car_{i}.bin",
                    "box3d_lidar": np.array(
                        [5.0 + 6 * i, 0, -1, 4, 2, 1.5, 0.3], np.float32
                    ),
                    "num_points_in_gt": 30,
                    "difficulty": 0,
                }
            )
        with open(tmp_path / "dbinfos.pkl", "wb") as f:
            pickle.dump(infos, f)
        return tmp_path

    def _sampler(self, root, n=4):
        cfg = CfgDict(
            {
                "DB_INFO_PATH": ["dbinfos.pkl"],
                "PREPARE": {"filter_by_min_points": ["Car:5"]},
                "SAMPLE_GROUPS": [f"Car:{n}"],
                "NUM_POINT_FEATURES": 4,
                "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                "LIMIT_WHOLE_SCENE": False,
            }
        )
        return DataBaseSampler(root, cfg, ["Car"], rng=np.random.RandomState(0))

    def test_adds_samples_and_points(self, db, rng):
        sampler = self._sampler(db)
        pts = rng.uniform(-30, 30, (500, 4)).astype(np.float32)
        data = {
            "gt_boxes": np.zeros((0, 7), np.float32),
            "gt_names": np.array([], dtype="<U10"),
            "points": pts,
            "gt_boxes_mask": np.ones(0, dtype=bool),
        }
        out = sampler(data)
        assert len(out["gt_boxes"]) == 4
        assert (out["gt_names"] == "Car").all()
        assert len(out["points"]) > 500  # object points pasted in

    def test_collision_rejection(self, db, rng):
        sampler = self._sampler(db, n=10)
        # existing gt exactly on top of the first 5 db boxes
        existing = np.stack(
            [np.array([5.0 + 6 * i, 0, -1, 4, 2, 1.5, 0.3]) for i in range(5)]
        ).astype(np.float32)
        data = {
            "gt_boxes": existing,
            "gt_names": np.array(["Car"] * 5),
            "points": rng.uniform(-30, 30, (200, 4)).astype(np.float32),
            "gt_boxes_mask": np.ones(5, dtype=bool),
        }
        out = sampler(data)
        new_boxes = out["gt_boxes"][5:]
        if len(new_boxes):
            iou = npg.pairwise_iou_bev(new_boxes[:, :7], existing)
            assert iou.max() < 1e-6  # no collisions with scene gt

    def test_removes_scene_points_inside_sampled_boxes(self, db, rng):
        sampler = self._sampler(db, n=10)
        # scene points exactly at a db box location
        pts = np.tile(np.array([[8.0, 0, -1, 0.5]], np.float32), (50, 1))
        data = {
            "gt_boxes": np.zeros((0, 7), np.float32),
            "gt_names": np.array([], dtype="<U10"),
            "points": pts,
            "gt_boxes_mask": np.ones(0, dtype=bool),
        }
        out = sampler(data)
        sampled = out["gt_boxes"]
        inside = npg.points_in_boxes(out["points"][:, :3], sampled[:, :7])
        # any point inside a sampled box must be an object point, and the
        # original scene points inside pasted boxes were removed:
        # count survivors of the 50 identical scene points not inside boxes
        at_loc = np.isclose(out["points"][:, 0], 8.0) & np.isclose(
            out["points"][:, 3], 0.5
        )
        if npg.points_in_boxes(np.array([[8.0, 0, -1]]), sampled[:, :7]).any():
            assert at_loc.sum() == 0
