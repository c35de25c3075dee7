"""Geometry core tests: independent oracles, not re-implementations.

Oracles: analytic axis-aligned IoU, closed-form 45° square intersection,
Monte-Carlo area estimation, rotation/translation invariance, corner-hull
point containment.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dfu3d_tpu.core import geometry as G


def _rand_boxes(rng, n, rot=True):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:3] = rng.uniform(-5, 5, (n, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    if rot:
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


class TestCorners:
    def test_unit_box_corners(self):
        box = jnp.array([[0.0, 0, 0, 2, 4, 6, 0]])
        c = np.asarray(G.boxes_to_corners_3d(box))[0]
        assert np.allclose(sorted(c[:, 0]), [-1, -1, -1, -1, 1, 1, 1, 1])
        assert np.allclose(sorted(c[:, 1]), [-2, -2, -2, -2, 2, 2, 2, 2])
        assert np.allclose(sorted(c[:, 2]), [-3, -3, -3, -3, 3, 3, 3, 3])
        # reference corner ordering: corner 0 = (+x, +y, -z)
        assert np.allclose(c[0], [1, 2, -3])
        assert np.allclose(c[6], [-1, -2, 3])

    def test_rotation_90deg(self):
        box = jnp.array([[0.0, 0, 0, 2, 4, 2, np.pi / 2]])
        c = np.asarray(G.boxes_to_corners_3d(box))[0]
        # after +90° around z, the long axis (dy=4) maps onto -x/+x... box-local
        # +x (half 1) rotates to +y; box-local +y (half 2) rotates to -x
        assert np.allclose(np.abs(c[:, 0]).max(), 2.0, atol=1e-5)
        assert np.allclose(np.abs(c[:, 1]).max(), 1.0, atol=1e-5)


class TestPointsInBoxes:
    def test_against_local_frame_oracle(self, rng):
        boxes = _rand_boxes(rng, 8)
        pts = rng.uniform(-8, 8, (500, 3)).astype(np.float32)
        got = np.asarray(G.points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
        for m, b in enumerate(boxes):
            # oracle: inverse-rotate points into the box frame with a full 3x3 matrix
            ang = -b[6]
            R = np.array(
                [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
            )
            local = (pts - b[:3]) @ R.T
            want = np.all(np.abs(local) <= b[3:6] / 2 + 1e-6, axis=1)
            strict = np.all(np.abs(local) <= b[3:6] / 2 - 1e-6, axis=1)
            # allow boundary disagreement
            assert np.all(got[:, m] | ~strict)
            assert np.all(~got[:, m] | want)


class TestIoU:
    def test_identical(self, rng):
        boxes = _rand_boxes(rng, 16)
        iou = np.asarray(G.pairwise_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
        assert np.allclose(np.diag(iou), 1.0, atol=1e-4)

    def test_axis_aligned_analytic(self, rng):
        a = _rand_boxes(rng, 24, rot=False)
        b = _rand_boxes(rng, 24, rot=False)
        got = np.asarray(G.pairwise_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        xo = np.maximum(
            np.minimum(a[:, None, 0] + a[:, None, 3] / 2, b[None, :, 0] + b[None, :, 3] / 2)
            - np.maximum(a[:, None, 0] - a[:, None, 3] / 2, b[None, :, 0] - b[None, :, 3] / 2),
            0,
        )
        yo = np.maximum(
            np.minimum(a[:, None, 1] + a[:, None, 4] / 2, b[None, :, 1] + b[None, :, 4] / 2)
            - np.maximum(a[:, None, 1] - a[:, None, 4] / 2, b[None, :, 1] - b[None, :, 4] / 2),
            0,
        )
        inter = xo * yo
        union = (a[:, 3] * a[:, 4])[:, None] + (b[:, 3] * b[:, 4])[None] - inter
        assert np.allclose(got, inter / np.maximum(union, 1e-6), atol=1e-4)

    def test_45deg_square_closed_form(self):
        # unit square vs itself rotated 45°: intersection is a regular octagon
        # with area 2*(sqrt(2)-1).
        a = jnp.array([[0.0, 0, 0, 1, 1, 1, 0]])
        b = jnp.array([[0.0, 0, 0, 1, 1, 1, np.pi / 4]])
        inter = float(G.pairwise_overlap_bev(a, b)[0, 0])
        want = 2 * (np.sqrt(2) - 1)
        assert abs(inter - want) < 1e-5
        iou = float(G.pairwise_iou_bev(a, b)[0, 0])
        assert abs(iou - want / (2 - want)) < 1e-5

    def test_disjoint(self):
        a = jnp.array([[0.0, 0, 0, 1, 1, 1, 0.3]])
        b = jnp.array([[10.0, 10, 0, 1, 1, 1, -0.7]])
        assert float(G.pairwise_iou_bev(a, b)[0, 0]) == 0.0

    def test_rigid_motion_invariance(self, rng):
        a = _rand_boxes(rng, 10)
        b = _rand_boxes(rng, 10)
        base = np.asarray(G.pairwise_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        theta, shift = 0.77, np.array([3.0, -2.0])
        R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
        for boxes in (a, b):
            boxes[:, 0:2] = boxes[:, 0:2] @ R.T + shift
            boxes[:, 6] += theta
        moved = np.asarray(G.pairwise_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        assert np.allclose(base, moved, atol=1e-4)

    def test_monte_carlo(self, rng):
        a = _rand_boxes(rng, 6)
        b = _rand_boxes(rng, 6)
        a[:, 0:2] = rng.uniform(-1, 1, (6, 2))  # force overlap region nearby
        b[:, 0:2] = rng.uniform(-1, 1, (6, 2))
        # sample points live at z=0 — make every box contain that plane
        a[:, 2], a[:, 5] = 0.0, 10.0
        b[:, 2], b[:, 5] = 0.0, 10.0
        got = np.asarray(G.pairwise_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
        pts = rng.uniform(-6, 6, (200_000, 2)).astype(np.float32)
        pts3 = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], axis=1)
        in_a = np.asarray(G.points_in_boxes(jnp.asarray(pts3), jnp.asarray(a)))
        in_b = np.asarray(G.points_in_boxes(jnp.asarray(pts3), jnp.asarray(b)))
        mc = (in_a[:, :, None] & in_b[:, None, :]).mean(0) * 144.0
        assert np.allclose(got, mc, atol=0.15)

    def test_iou3d_height_decomposition(self):
        a = jnp.array([[0.0, 0, 0, 2, 2, 2, 0]])
        b = jnp.array([[0.0, 0, 1, 2, 2, 2, 0]])  # half height overlap
        iou = float(G.pairwise_iou3d(a, b)[0, 0])
        # inter = 4 (bev) * 1 (h) = 4; union = 8 + 8 - 4 = 12
        assert abs(iou - 4 / 12) < 1e-5

    def test_aligned_matches_pairwise_diag(self, rng):
        a = _rand_boxes(rng, 12)
        b = _rand_boxes(rng, 12)
        a[:, 0:2] = rng.uniform(-1, 1, (12, 2))
        b[:, 0:2] = rng.uniform(-1, 1, (12, 2))
        full = np.asarray(G.pairwise_iou3d(jnp.asarray(a), jnp.asarray(b)))
        diag = np.asarray(G.aligned_iou3d(jnp.asarray(a), jnp.asarray(b)))
        assert np.allclose(np.diag(full), diag, atol=1e-5)


class TestNMS:
    def test_suppresses_duplicates(self):
        boxes = jnp.array(
            [
                [0.0, 0, 0, 4, 2, 1.5, 0.2],
                [0.05, 0, 0, 4, 2, 1.5, 0.2],  # near-duplicate of 0
                [20.0, 0, 0, 4, 2, 1.5, 1.0],
                [0.0, 20, 0, 4, 2, 1.5, -0.5],
            ]
        )
        scores = jnp.array([0.9, 0.8, 0.7, 0.6])
        idx, keep = G.nms_bev(boxes, scores, 0.1, pre_max=4, post_max=4)
        kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
        assert kept == {0, 2, 3}

    def test_score_order_and_validity(self, rng):
        boxes = jnp.asarray(_rand_boxes(rng, 64))
        scores = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
        idx, keep = G.nms_bev(boxes, scores, 0.01, pre_max=64, post_max=16)
        s = np.asarray(scores)[np.asarray(idx)]
        k = np.asarray(keep)
        assert np.all(np.diff(s[k]) <= 1e-6)
        assert k.sum() <= 16

    def test_thresh_one_keeps_everything(self, rng):
        boxes = jnp.asarray(_rand_boxes(rng, 32))
        scores = jnp.asarray(rng.uniform(0, 1, 32).astype(np.float32))
        idx, keep = G.nms_bev(boxes, scores, 1.01, pre_max=32, post_max=32)
        assert np.asarray(keep).all()

    def test_valid_mask_respected(self, rng):
        boxes = jnp.asarray(_rand_boxes(rng, 8))
        scores = jnp.ones(8, dtype=jnp.float32)
        valid = jnp.array([True] * 4 + [False] * 4)
        idx, keep = G.nms_bev(boxes, scores, 1.01, pre_max=8, post_max=8, valid=valid)
        assert set(np.asarray(idx)[np.asarray(keep)].tolist()) <= {0, 1, 2, 3}


class TestCalibration:
    def _make_calib(self):
        P2 = np.array(
            [[700.0, 0, 600, 45.0], [0, 700.0, 180, -0.3], [0, 0, 1, 0.005]],
            dtype=np.float32,
        )
        # small rotation for R0
        th = 0.01
        R0 = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            dtype=np.float32,
        )
        V2C = np.array(
            [[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3]], dtype=np.float32
        )
        return G.Calibration({"P2": P2, "R0": R0, "Tr_velo2cam": V2C})

    def test_lidar_rect_roundtrip(self, rng):
        calib = self._make_calib()
        pts = rng.uniform(-20, 20, (100, 3)).astype(np.float32)
        back = calib.rect_to_lidar(calib.lidar_to_rect(pts))
        assert np.allclose(back, pts, atol=1e-3)

    def test_img_rect_roundtrip(self, rng):
        calib = self._make_calib()
        pts_rect = np.stack(
            [
                rng.uniform(-10, 10, 100),
                rng.uniform(-3, 3, 100),
                rng.uniform(5, 60, 100),
            ],
            axis=1,
        ).astype(np.float32)
        img, depth = calib.rect_to_img(pts_rect)
        back = calib.img_to_rect(img[:, 0], img[:, 1], depth)
        assert np.allclose(back, pts_rect, atol=1e-2)

    def test_box_conversion_roundtrip(self, rng):
        calib = self._make_calib()
        boxes = _rand_boxes(rng, 20)
        cam = G.boxes3d_lidar_to_kitti_camera(
            jnp.asarray(boxes), lambda p: jnp.asarray(calib.lidar_to_rect(np.asarray(p)))
        )
        back = G.boxes3d_kitti_camera_to_lidar(
            cam, lambda p: jnp.asarray(calib.rect_to_lidar(np.asarray(p)))
        )
        back = np.asarray(back)
        assert np.allclose(back[:, 0:6], boxes[:, 0:6], atol=1e-3)
        # headings equal modulo 2π
        d = (back[:, 6] - boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
        assert np.allclose(d, 0, atol=1e-4)


class TestMisc:
    def test_limit_period(self):
        vals = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi / 2, 5.0])
        out = np.asarray(G.limit_period(vals))
        assert np.all(out >= -np.pi / 2 - 1e-6) and np.all(out < np.pi / 2 + 1e-6)

    def test_nearest_bev_iou_axis_aligned_case(self):
        a = jnp.array([[0.0, 0, 0, 2, 4, 1, 0]])
        b = jnp.array([[0.0, 0, 0, 4, 2, 1, np.pi / 2]])  # same footprint after snap
        iou = float(G.boxes3d_nearest_bev_iou(a, b)[0, 0])
        assert abs(iou - 1.0) < 1e-5

    def test_enlarge_and_range_mask(self):
        boxes = jnp.array([[0.0, 0, 0, 1, 1, 1, 0], [100.0, 0, 0, 1, 1, 1, 0]])
        bigger = np.asarray(G.enlarge_box3d(boxes, (0.2, 0.2, 0.2)))
        assert np.allclose(bigger[:, 3:6], 1.2)
        mask = np.asarray(
            G.mask_boxes_outside_range(boxes, [-10, -10, -10, 10, 10, 10])
        )
        assert mask.tolist() == [True, False]


class TestNMSFixedPoint:
    def test_matches_sequential_oracle(self, rng):
        import jax.numpy as jnp
        from dfu3d_tpu.core.geometry import nms as N
        from dfu3d_tpu.core.geometry.iou import pairwise_iou_bev

        for trial in range(5):
            n = 128
            boxes = _rand_boxes(rng, n)
            boxes[:, 0:2] = rng.uniform(-8, 8, (n, 2))  # dense → real suppression chains
            iou = pairwise_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes))
            valid = jnp.asarray(rng.uniform(0, 1, n) > 0.1)
            for thresh in (0.05, 0.3, 0.7):
                fast = np.asarray(N._suppression_scan(iou, valid, thresh))
                slow = np.asarray(N._suppression_scan_reference(iou, valid, thresh))
                assert np.array_equal(fast, slow), (trial, thresh)

    def test_chain_of_dominoes(self):
        """Worst case for fixed-point: a line where each box overlaps the next."""
        import jax.numpy as jnp
        from dfu3d_tpu.core import geometry as G

        n = 32
        boxes = np.zeros((n, 7), np.float32)
        boxes[:, 0] = np.arange(n) * 0.5  # each overlaps its neighbors
        boxes[:, 3:6] = 1.0
        scores = np.linspace(1.0, 0.5, n).astype(np.float32)
        idx, keep = G.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.3, pre_max=n, post_max=n)
        kept = sorted(np.asarray(idx)[np.asarray(keep)].tolist())
        # greedy: keep 0, suppress 1, keep 2, ... (IoU(0,1)=1/3>0.3, IoU(0,2)=0)
        assert kept == list(range(0, n, 2))


class TestCircleNMS:
    def test_distance_suppression(self):
        from dfu3d_tpu.core.geometry.nms import circle_nms

        boxes = jnp.array(
            [
                [0.0, 0, 0, 1, 1, 1, 0],
                [0.5, 0, 0, 1, 1, 1, 0],   # within radius of 0
                [10.0, 0, 0, 1, 1, 1, 0],
                [10.5, 0.5, 0, 1, 1, 1, 0],  # within radius of 2
                [30.0, 0, 0, 1, 1, 1, 0],
            ]
        )
        scores = jnp.array([0.9, 0.8, 0.85, 0.7, 0.6])
        idx, keep = circle_nms(boxes, scores, min_radius=1.0, post_max=5)
        kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
        assert kept == {0, 2, 4}
