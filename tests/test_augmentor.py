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

    def test_image_copy_paste(self, tmp_path, rng):
        """IMG_AUG_TYPE: kitti — sampled objects' image crops are pasted into
        the scene image at their projected 2D boxes, gt_boxes2d extends, and
        2D-IoU rejection holds (reference database_sampler.py:168-305)."""
        from PIL import Image

        from dfu3d_tpu.pseudo.synthetic import CALIB_TXT, IMG_H, IMG_W, make_calib

        gtdb = tmp_path / "gt_database"
        gtdb.mkdir()
        (tmp_path / "calib").mkdir()
        (tmp_path / "image_2").mkdir()
        calib = make_calib()
        infos = {"Car": []}
        # in-FOV boxes spread laterally so their 2D boxes don't overlap
        centers = [(12.0, -4.0), (16.0, 5.0), (24.0, -9.0), (30.0, 10.0)]
        for i, (cx, cy) in enumerate(centers):
            idx = f"{i:06d}"
            (tmp_path / "calib" / f"{idx}.txt").write_text(CALIB_TXT)
            # distinctive solid-color source image per frame
            img = np.full((IMG_H, IMG_W, 3), (i + 1) * 40, np.uint8)
            Image.fromarray(img).save(tmp_path / "image_2" / f"{idx}.png")
            box = np.array([cx, cy, -1, 4, 2, 1.5, 0.0], np.float32)
            pts = rng.uniform(-1, 1, (30, 4)).astype(np.float32)
            (pts).tofile(gtdb / f"img_Car_{i}.bin")
            corners = npg.boxes_to_corners_3d(box[None])[0]
            bbox, _ = calib.corners3d_to_img_boxes(
                calib.lidar_to_rect(corners.reshape(-1, 3)).reshape(-1, 8, 3)
            )
            infos["Car"].append({
                "name": "Car", "path": f"gt_database/img_Car_{i}.bin",
                "box3d_lidar": box, "num_points_in_gt": 30, "difficulty": 0,
                "image_idx": idx, "bbox": bbox[0].astype(np.float32),
            })
        with open(tmp_path / "dbinfos.pkl", "wb") as f:
            pickle.dump(infos, f)

        cfg = CfgDict({
            "DB_INFO_PATH": ["dbinfos.pkl"],
            "PREPARE": {"filter_by_min_points": ["Car:5"]},
            "SAMPLE_GROUPS": ["Car:4"],
            "NUM_POINT_FEATURES": 4,
            "LIMIT_WHOLE_SCENE": False,
            "IMG_AUG_TYPE": "kitti",
            "IMG_AUG_IOU_THRESH": 0.5,
        })
        sampler = DataBaseSampler(tmp_path, cfg, ["Car"],
                                  rng=np.random.RandomState(0))
        scene_img = np.zeros((IMG_H, IMG_W, 3), np.float32)
        data = {
            "gt_boxes": np.zeros((0, 7), np.float32),
            "gt_names": np.array([], dtype="<U10"),
            "points": rng.uniform(-30, 30, (300, 4)).astype(np.float32),
            "gt_boxes_mask": np.ones(0, dtype=bool),
            "images": scene_img,
            "gt_boxes2d": np.zeros((0, 4), np.float32),
            "calib": calib,
        }
        out = sampler(data)
        n = len(out["gt_boxes"])
        assert n >= 2
        assert out["gt_boxes2d"].shape == (n, 4)
        # each sampled object's crop (solid nonzero color) was pasted into
        # the black scene image at its 2D box
        for b in out["gt_boxes2d"]:
            bi = b.astype(int)
            region = out["images"][bi[1]:bi[3], bi[0]:bi[2]]
            assert region.size > 0 and region.max() > 0
        # 2D boxes respect the pairwise IoU threshold
        iou = sampler._iou_2d(out["gt_boxes2d"], out["gt_boxes2d"])
        iou[range(n), range(n)] = 0
        assert iou.max() < 0.5


class TestLocalAugs:
    def _scene(self, rng, n_boxes=3, pts_per=60):
        boxes = np.zeros((n_boxes, 7), np.float32)
        boxes[:, 0] = rng.uniform(5, 30, n_boxes)
        boxes[:, 1] = rng.uniform(-10, 10, n_boxes)
        boxes[:, 2] = -1.0
        boxes[:, 3:6] = [4.0, 1.8, 1.6]
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
        pts = []
        for b in boxes:
            local = np.stack([
                rng.uniform(-b[3] / 2, b[3] / 2, pts_per),
                rng.uniform(-b[4] / 2, b[4] / 2, pts_per),
                rng.uniform(-b[5] / 2, b[5] / 2, pts_per)], axis=1)
            c, s = np.cos(b[6]), np.sin(b[6])
            pts.append(np.stack([
                local[:, 0] * c - local[:, 1] * s + b[0],
                local[:, 0] * s + local[:, 1] * c + b[1],
                local[:, 2] + b[2],
                rng.uniform(0, 1, pts_per)], axis=1))
        pts.append(np.stack([
            rng.uniform(0, 40, 500), rng.uniform(-20, 20, 500),
            np.full(500, -1.8), rng.uniform(0, 1, 500)], axis=1))
        return boxes, np.concatenate(pts).astype(np.float32)

    def test_local_translation_moves_box_points_together(self):
        from dfu3d_tpu.data import augmentor_utils as au

        rng = np.random.RandomState(0)
        boxes, points = self._scene(rng, n_boxes=1)
        inside_before = au.points_in_box_mask(points, boxes[0]).sum()
        b2, p2 = au.random_local_translation_along_x(
            boxes.copy(), points.copy(), [1.0, 1.0], np.random.RandomState(1)
        )
        assert np.isclose(b2[0, 0] - boxes[0, 0], 1.0)
        inside_after = au.points_in_box_mask(p2, b2[0]).sum()
        assert inside_after == inside_before  # points moved with the box

    def test_local_rotation_scaling_keep_membership(self):
        from dfu3d_tpu.data import augmentor_utils as au

        rng = np.random.RandomState(2)
        boxes, points = self._scene(rng, n_boxes=2)
        before = [au.points_in_box_mask(points, b).sum() for b in boxes]
        b2, p2 = au.local_rotation(boxes.copy(), points.copy(), [0.3, 0.3],
                                   np.random.RandomState(3))
        # note: a degenerate scale range is a no-op (reference guard)
        b3, p3 = au.local_scaling(b2, p2, [1.05, 1.15], np.random.RandomState(4))
        after = [au.points_in_box_mask(p3, b).sum() for b in b3]
        assert after[0] >= before[0] and after[1] >= before[1]
        ratios = b3[:, 3:6] / boxes[:, 3:6]
        assert ((ratios > 1.049) & (ratios < 1.151)).all()
        assert np.allclose(b3[:, 6], boxes[:, 6] + 0.3)

    def test_frustum_dropouts(self):
        from dfu3d_tpu.data import augmentor_utils as au

        rng = np.random.RandomState(5)
        boxes, points = self._scene(rng)
        n0 = len(points)
        b2, p2 = au.global_frustum_dropout(boxes.copy(), points.copy(),
                                           [0.3, 0.3], "top",
                                           np.random.RandomState(6))
        assert len(p2) < n0
        zmax = points[:, 2].max()
        zmin = points[:, 2].min()
        assert p2[:, 2].max() < zmax - 0.29 * (zmax - zmin) + 1e-5

        b3, p3 = au.local_frustum_dropout(boxes.copy(), points.copy(),
                                          [0.5, 0.5], "top",
                                          np.random.RandomState(7))
        assert len(p3) < n0
        # only in-box points dropped
        assert len(p3) > n0 - 3 * 60

    def test_pyramid_masks_partition_box(self):
        """The 6 face pyramids of a box exactly partition its interior."""
        from dfu3d_tpu.data import augmentor_utils as au

        rng = np.random.RandomState(8)
        boxes, points = self._scene(rng, n_boxes=1, pts_per=300)
        inside = au.points_in_box_mask(points, boxes[0])
        pyr = au.get_pyramids(boxes)  # (1, 6, 15)
        pm = au.points_in_pyramids_mask(points, pyr[0])
        counts = pm[inside].sum(1)
        # every inside point belongs to >= 1 pyramid (boundaries may overlap)
        assert (counts >= 1).all()
        assert pm[~inside].sum() == 0 or pm[~inside].mean() < 0.02

    def test_pyramid_dropout_sparsify_swap_run(self):
        from dfu3d_tpu.data import augmentor_utils as au

        rng = np.random.RandomState(9)
        boxes, points = self._scene(rng, n_boxes=3, pts_per=200)
        b, p, pyr = au.local_pyramid_dropout(boxes.copy(), points.copy(), 1.0,
                                             np.random.RandomState(10))
        assert len(p) < len(points)  # every box dropped one pyramid
        b, p, pyr = au.local_pyramid_sparsify(boxes.copy(), points.copy(), 1.0,
                                              10, np.random.RandomState(11))
        assert len(p) < len(points)
        b, p2 = au.local_pyramid_swap(boxes.copy(), points.copy(), 1.0, 5,
                                      np.random.RandomState(12))
        assert np.isfinite(p2).all()

    def test_dispatch_from_config(self):
        from dfu3d_tpu.data.data_augmentor import DataAugmentor
        from dfu3d_tpu.utils.config import CfgDict

        rng = np.random.RandomState(13)
        boxes, points = self._scene(rng)
        cfgs = CfgDict({"AUG_CONFIG_LIST": [
            {"NAME": "random_local_translation",
             "ALONG_AXIS_LIST": ["x", "y"],
             "LOCAL_TRANSLATION_RANGE": [-0.2, 0.2]},
            {"NAME": "random_local_rotation", "LOCAL_ROT_ANGLE": [-0.1, 0.1]},
            {"NAME": "random_local_scaling", "LOCAL_SCALE_RANGE": [0.95, 1.05]},
            {"NAME": "random_world_frustum_dropout",
             "INTENSITY_RANGE": [0.05, 0.1], "DIRECTION": ["top"]},
            {"NAME": "random_local_frustum_dropout",
             "INTENSITY_RANGE": [0.05, 0.1], "DIRECTION": ["top"]},
            {"NAME": "random_local_pyramid_aug", "DROP_PROB": 0.2,
             "SPARSIFY_PROB": 0.2, "SPARSIFY_MAX_NUM": 20,
             "SWAP_PROB": 0.2, "SWAP_MAX_NUM": 10},
            {"NAME": "random_image_flip", "ALONG_AXIS_LIST": ["horizontal"]},
        ]})
        aug = DataAugmentor(None, cfgs, ["Car"],
                            rng=np.random.RandomState(14))
        out = aug.forward({"points": points.copy(), "gt_boxes": boxes.copy(),
                           "gt_names": np.array(["Car"] * len(boxes))})
        assert np.isfinite(out["points"]).all()
        assert out["gt_boxes"].shape[1] == 7
