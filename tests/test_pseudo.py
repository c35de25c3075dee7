"""Pseudo-box factory tests: synthetic scenes with known geometry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu3d_tpu.pseudo import ops


def _pad(pts, cap=256):
    out = np.zeros((cap, 3), np.float32)
    out[: len(pts)] = pts[:, :3]
    valid = np.zeros(cap, bool)
    valid[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(valid)


class TestGroundPlane:
    def test_recovers_tilted_plane(self, rng):
        # plane z = 0.02 x - 0.01 y - 1.5 plus objects above
        xy = rng.uniform(-40, 40, (3000, 2))
        z = 0.02 * xy[:, 0] - 0.01 * xy[:, 1] - 1.5 + rng.normal(0, 0.02, 3000)
        ground = np.column_stack([xy, z]).astype(np.float32)
        objs = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
        objs[:, 2] = rng.uniform(-0.5, 1.5, 300)
        pts = np.concatenate([ground, objs])
        valid = np.ones(len(pts), bool)
        plane = np.asarray(
            ops.fit_ground_plane(
                jnp.asarray(pts), jnp.asarray(valid), jax.random.PRNGKey(0)
            )
        )
        # normal ≈ (-0.02, 0.01, 1)/norm
        want = np.array([-0.02, 0.01, 1.0])
        want /= np.linalg.norm(want)
        assert np.allclose(plane[:3], want, atol=0.01), plane
        above = np.asarray(
            ops.above_plane(jnp.asarray(pts), jnp.asarray(plane), offset=0.1)
        )
        assert above[len(ground):].mean() > 0.95   # objects above
        assert above[: len(ground)].mean() < 0.05  # ground removed


class TestNoiseSuppression:
    def test_radius_outlier(self):
        cluster = np.random.RandomState(0).uniform(0, 0.5, (20, 3)).astype(np.float32)
        isolated = np.array([[50.0, 50.0, 0.0]], np.float32)
        pts, valid = _pad(np.concatenate([cluster, isolated]))
        keep = np.asarray(ops.radius_outlier_mask(pts, valid, 3.0))
        assert keep[:20].all()
        assert not keep[20]
        assert not keep[21:].any()  # padding stays invalid

    def test_ball_gate(self):
        lidar = np.array([[10.0, 0, 0], [20.0, 5, 0]], np.float32)
        pseudo = np.array([[10.05, 0, 0], [15.0, 0, 0]], np.float32)
        lp, lv = _pad(lidar)
        pp, pv = _pad(pseudo)
        keep = np.asarray(ops.ball_gate_mask(pp, pv, lp, lv, c=0.1))
        assert keep[0] and not keep[1]

    def test_ball_gate_no_lidar(self):
        pp, pv = _pad(np.ones((5, 3), np.float32))
        lp, lv = _pad(np.zeros((0, 3), np.float32))
        keep = np.asarray(ops.ball_gate_mask(pp, pv, lp, lv))
        assert not keep.any()


class TestClustering:
    def test_two_clusters(self, rng):
        c1 = rng.uniform(0, 1, (30, 3)).astype(np.float32) + [5, 0, 0]
        c2 = rng.uniform(0, 1, (25, 3)).astype(np.float32) + [30, 20, 0]
        pts, valid = _pad(np.concatenate([c1, c2]))
        labels = np.asarray(ops.connected_components(pts, valid, r0=3.0, rd=0.001))
        l1 = set(labels[:30].tolist())
        l2 = set(labels[30:55].tolist())
        assert len(l1) == 1 and len(l2) == 1 and l1 != l2
        assert (labels[55:] == pts.shape[0]).all()

    def test_chain_merges(self, rng):
        # a chain of points 2.5 m apart (< R0=3) merges into one cluster
        chain = np.stack(
            [np.arange(0, 25, 2.5), np.zeros(10), np.zeros(10)], axis=1
        ).astype(np.float32)
        pts, valid = _pad(chain)
        labels = np.asarray(ops.connected_components(pts, valid))
        assert len(set(labels[:10].tolist())) == 1


class TestRectangleSearch:
    def _box_boundary_points(self, cx, cy, l, w, theta, n=120, rng=None):
        rng = rng or np.random.RandomState(0)
        t = rng.uniform(0, 1, n)
        side = rng.randint(0, 4, n)
        xs = np.where(side == 0, -l / 2 + t * l,
             np.where(side == 1, l / 2,
             np.where(side == 2, -l / 2 + t * l, -l / 2)))
        ys = np.where(side == 0, -w / 2,
             np.where(side == 1, -w / 2 + t * w,
             np.where(side == 2, w / 2, -w / 2 + t * w)))
        c, s = np.cos(theta), np.sin(theta)
        return np.stack([xs * c - ys * s + cx, xs * s + ys * c + cy], axis=1)

    def test_recovers_rotated_rectangle(self):
        gt = dict(cx=12.0, cy=-3.0, l=4.2, w=1.8, theta=0.4)
        pts2 = self._box_boundary_points(**gt).astype(np.float32)
        cap = 256
        x = np.zeros(cap, np.float32)
        y = np.zeros(cap, np.float32)
        x[: len(pts2)], y[: len(pts2)] = pts2[:, 0], pts2[:, 1]
        valid = np.zeros(cap, bool)
        valid[: len(pts2)] = True
        corners, theta = ops.rectangle_search(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
        )
        corners = np.asarray(corners)
        center = (corners[0] + corners[2]) / 2
        assert np.allclose(center, [gt["cx"], gt["cy"]], atol=0.15)
        l1 = np.linalg.norm(corners[0] - corners[3])
        l2 = np.linalg.norm(corners[0] - corners[1])
        dims = sorted([l1, l2])
        assert abs(dims[1] - gt["l"]) < 0.25 and abs(dims[0] - gt["w"]) < 0.25
        # θ recovered modulo π/2
        dt = (float(theta) - gt["theta"]) % (np.pi / 2)
        assert min(dt, np.pi / 2 - dt) < np.deg2rad(2.5)

    def test_box_from_corners(self):
        gt = dict(cx=8.0, cy=2.0, l=4.0, w=1.7, theta=0.3)
        pts2 = self._box_boundary_points(**gt).astype(np.float32)
        cap = 256
        x = np.zeros(cap, np.float32)
        y = np.zeros(cap, np.float32)
        x[: len(pts2)], y[: len(pts2)] = pts2[:, 0], pts2[:, 1]
        valid = np.zeros(cap, bool)
        valid[: len(pts2)] = True
        corners, _ = ops.rectangle_search(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
        )
        box, ok = ops.box_from_corners(corners, jnp.float32(0.3), True)
        box = np.asarray(box)
        assert bool(ok)
        assert np.allclose(box[0:2], [gt["cx"], gt["cy"]], atol=0.15)
        assert abs(box[3] - gt["l"]) < 0.25 and abs(box[4] - gt["w"]) < 0.25
        # height = max_z, z center = max_z/2 - 1.5 (GenerateAnns convention)
        assert abs(box[5] - 0.3) < 1e-5 and abs(box[2] - (0.15 - 1.5)) < 1e-5
        # heading modulo π/2 (L-shape can't disambiguate front/side)
        dh = (float(box[6]) - gt["theta"]) % (np.pi / 2)
        assert min(dh, np.pi / 2 - dh) < np.deg2rad(2.5)

    def test_size_height_priors(self):
        """Cross-dataset variant (my_loader_KittiPandasetWaymo.py:883-1010):
        size priors replace the fitted l/w unconditionally; the height prior
        applies only when the measured height < 1 m."""
        gt = dict(cx=8.0, cy=2.0, l=2.0, w=1.0, theta=0.0)
        pts2 = self._box_boundary_points(**gt).astype(np.float32)
        cap = 256
        x = np.zeros(cap, np.float32)
        y = np.zeros(cap, np.float32)
        x[: len(pts2)], y[: len(pts2)] = pts2[:, 0], pts2[:, 1]
        valid = np.zeros(cap, bool)
        valid[: len(pts2)] = True
        corners, _ = ops.rectangle_search(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
        )
        box, ok = ops.box_from_corners(
            corners, jnp.float32(0.5), True,
            size_prior=jnp.asarray([3.9, 1.6]),
            height_prior=jnp.float32(1.56),
        )
        box = np.asarray(box)
        assert bool(ok)
        assert np.allclose(box[3:5], [3.9, 1.6])  # prior size wins
        assert abs(box[5] - 1.56) < 1e-5          # short cluster → prior h
        # center unchanged by the size override (center_type None)
        assert np.allclose(box[0:2], [gt["cx"], gt["cy"]], atol=0.15)
        # a tall-enough cluster keeps its measured height
        box2, _ = ops.box_from_corners(
            corners, jnp.float32(1.4), True,
            size_prior=jnp.asarray([3.9, 1.6]),
            height_prior=jnp.float32(1.56),
        )
        assert abs(float(box2[5]) - 1.4) < 1e-5
        # negative prior disables
        box3, _ = ops.box_from_corners(
            corners, jnp.float32(0.5), True,
            size_prior=jnp.asarray([-1.0, -1.0]),
            height_prior=jnp.float32(-1.0),
        )
        assert abs(float(box3[3]) - gt["l"]) < 0.25

    def test_prior_centerline_moves_center(self):
        """prior_centerline: center steps from the short-edge midpoint along
        the heading by half the prior length (reference :930-936)."""
        # small partial observation: only the back half of a car (an L of
        # a 2.0×1.6 region) at origin, axis-aligned
        gt = dict(cx=0.0, cy=0.0, l=1.8, w=1.4, theta=0.0)
        pts2 = self._box_boundary_points(**gt).astype(np.float32)
        cap = 256
        x = np.zeros(cap, np.float32)
        y = np.zeros(cap, np.float32)
        x[: len(pts2)], y[: len(pts2)] = pts2[:, 0], pts2[:, 1]
        valid = np.zeros(cap, bool)
        valid[: len(pts2)] = True
        corners, _ = ops.rectangle_search(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
        )
        box, ok = ops.box_from_corners(
            corners, jnp.float32(1.5), True,
            size_prior=jnp.asarray([3.9, 1.6]),
            height_prior=jnp.float32(1.56),
            center_type="prior_centerline",
        )
        box = np.asarray(box)
        assert bool(ok)
        assert np.allclose(box[3:5], [3.9, 1.6])
        # the fitted rect is 'small' (l<2, w<1.5) → step = prior w? no:
        # small → step = pw/2; center lands half the swapped prior from the
        # short-edge midpoint — just assert it MOVED off the cluster center
        # along one axis by a nontrivial amount and stayed finite
        moved = np.linalg.norm(box[0:2] - [gt["cx"], gt["cy"]])
        assert np.all(np.isfinite(box))
        assert moved > 0.2

    def test_aspect_reject_for_car(self):
        # degenerate line-like cluster: aspect > 5 → rejected for Car
        x = np.linspace(0, 10, 50).astype(np.float32)
        y = np.zeros(50, np.float32) + np.random.RandomState(0).normal(0, 0.05, 50).astype(np.float32)
        cap = 64
        xs = np.zeros(cap, np.float32)
        ys = np.zeros(cap, np.float32)
        xs[:50], ys[:50] = x, y
        valid = np.zeros(cap, bool)
        valid[:50] = True
        corners, _ = ops.rectangle_search(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(valid))
        _, ok_car = ops.box_from_corners(corners, jnp.float32(1.0), True)
        _, ok_ped = ops.box_from_corners(corners, jnp.float32(1.0), False)
        assert not bool(ok_car)
        assert bool(ok_ped)


class TestFactoryEndToEnd:
    def test_synthetic_frame(self, tmp_path, rng):
        """A car-shaped cluster + consistent depth/mask → recovered Car box."""
        from dfu3d_tpu.core.geometry.calibration import Calibration
        from dfu3d_tpu.pseudo.factory import FrameInputs, PseudoBoxFactory

        P2 = np.array(
            [[700.0, 0, 620, 0], [0, 700.0, 180, 0], [0, 0, 1, 0]], np.float32
        )
        R0 = np.eye(3, dtype=np.float32)
        V2C = np.array(
            [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float32
        )
        calib = Calibration({"P2": P2, "R0": R0, "Tr_velo2cam": V2C})

        # ground points + a car box at (12, 0) with l=4, w=1.8, heading 0.35
        gx = rng.uniform(2, 30, 4000)
        gy = rng.uniform(-8, 8, 4000)
        ground = np.stack([gx, gy, np.full(4000, -1.5)], axis=1)
        gt = dict(cx=12.0, cy=0.0, l=4.0, w=1.8, h=1.6, theta=0.35)
        t = rng.uniform(0, 1, 800)
        side = rng.randint(0, 4, 800)
        xs = np.where(side == 0, -gt["l"] / 2 + t * gt["l"],
             np.where(side == 1, gt["l"] / 2,
             np.where(side == 2, -gt["l"] / 2 + t * gt["l"], -gt["l"] / 2)))
        ys = np.where(side == 0, -gt["w"] / 2,
             np.where(side == 1, -gt["w"] / 2 + t * gt["w"],
             np.where(side == 2, gt["w"] / 2, -gt["w"] / 2 + t * gt["w"])))
        c, s = np.cos(gt["theta"]), np.sin(gt["theta"])
        car = np.stack(
            [xs * c - ys * s + gt["cx"], xs * s + ys * c + gt["cy"],
             rng.uniform(-1.4, gt["h"] - 1.5, 800)], axis=1,
        )
        lidar = np.concatenate([ground, car]).astype(np.float32)
        intensity = rng.uniform(0, 1, (len(lidar), 1)).astype(np.float32)
        lidar = np.concatenate([lidar, intensity], axis=1)

        img_h, img_w = 370, 1240
        image = np.full((img_h, img_w, 3), 128, np.uint8)

        # mask: project car points, take their pixel bbox
        pix, depth_v = calib.lidar_to_img(car)
        pix = np.round(pix).astype(int)
        ok = (pix[:, 0] >= 0) & (pix[:, 0] < img_w) & (pix[:, 1] >= 0) & (pix[:, 1] < img_h)
        assert ok.sum() > 100
        mask = np.zeros((img_h, img_w), bool)
        x1, y1 = pix[ok].min(0)
        x2, y2 = pix[ok].max(0)
        mask[y1 : y2 + 1, x1 : x2 + 1] = True

        # dense depth: render the car points into the depth map
        depth = np.zeros((img_h, img_w), np.float32)
        depth[pix[ok][:, 1], pix[ok][:, 0]] = depth_v[ok]

        frame = FrameInputs(
            frame_id="000000", lidar=lidar, image=image, depth=depth, calib=calib,
            masks=mask[None], classes=np.array([0]), scores=np.array([0.9]),
            boxes2d=np.array([[x1, y1, x2, y2]], np.float32),
        )
        factory = PseudoBoxFactory()
        out = factory.process_frame(frame)

        assert len(out.boxes_lidar) >= 1, "no box recovered"
        b = out.boxes_lidar[0]
        assert out.names[0] == "Car"
        assert np.allclose(b[0:2], [gt["cx"], gt["cy"]], atol=0.4), b
        dims = sorted(b[3:5])
        assert abs(dims[1] - gt["l"]) < 0.5 and abs(dims[0] - gt["w"]) < 0.5
        # fused cloud: lidar flag 2, pseudo flag 1
        flags = out.fused_points[:, 7]
        assert (flags == 2).sum() == len(lidar)
        assert (flags == 1).sum() > 0

        # artifact writing round-trips through the KITTI reader
        cal_dir = tmp_path / "calib"
        cal_dir.mkdir()
        factory.write_frame(tmp_path, frame, out)
        from dfu3d_tpu.data import kitti_io

        objs = kitti_io.get_objects_from_label(tmp_path / "label_train" / "000000.txt")
        assert len(objs) == len(out.boxes_lidar)
        assert objs[0].cls_type == "Car"
        # bottom-center convention: reading back + h/2 restores the center z
        loc_lidar = calib.rect_to_lidar(objs[0].loc[None])[0]
        assert abs((loc_lidar[2] + objs[0].h / 2) - b[2]) < 1e-2
