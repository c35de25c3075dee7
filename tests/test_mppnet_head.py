"""MPPNet head structural tests: trajectory matching, cropping semantics,
proxy grids, and the E2E memory-bank roll (reference behaviors from
pcdet/models/roi_heads/mppnet_head.py + mppnet_memory_bank_e2e.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.models.mppnet_head import (
    crop_roi_frame_points,
    generate_trajectory,
    proxy_points_of_roi,
    spherical_corner_feature,
)


def _box(x, y, z=0.0, dx=4.0, dy=2.0, dz=1.5, ry=0.0, vx=0.0, vy=0.0):
    return [x, y, z, dx, dy, dz, ry, vx, vy]


class TestGenerateTrajectory:
    def test_matched_frames_adopt_proposals(self):
        # roi 0 moves +1m/frame in x; frame-1/2 proposal sets contain the
        # displaced box. roi 1 is static with no matching proposals.
        cur = jnp.asarray([[_box(10.0, 0.0, vx=-1.0), _box(0.0, 5.0)]])
        props = np.zeros((1, 3, 2, 9), np.float32)
        props[0, 1, 0] = _box(9.1, 0.0)    # near propagated (9, 0)
        props[0, 1, 1] = _box(50.0, 50.0)  # far from roi 1
        props[0, 2, 0] = _box(8.2, 0.0)    # near (9.1 - 1, 0) = (8.1, 0)
        props[0, 2, 1] = _box(50.0, 50.0)
        pv = np.ones((1, 3, 2), bool)
        traj, valid = generate_trajectory(
            cur, jnp.ones((1, 2), bool), jnp.asarray(props), jnp.asarray(pv)
        )
        traj, valid = np.asarray(traj), np.asarray(valid)
        assert valid[0, 0].all()
        assert valid[0, 1, 0] and valid[0, 2, 0]
        assert not valid[0, 1, 1] and not valid[0, 2, 1]
        # matched frames take the proposal box verbatim
        np.testing.assert_allclose(traj[0, 1, 0, :2], [9.1, 0.0], atol=1e-5)
        np.testing.assert_allclose(traj[0, 2, 0, :2], [8.2, 0.0], atol=1e-5)
        # unmatched rois hold the velocity-propagated box (vel 0 -> static)
        np.testing.assert_allclose(traj[0, 1, 1, :2], [0.0, 5.0], atol=1e-5)

    def test_seven_dim_boxes_propagate_static(self):
        cur = jnp.asarray([[_box(3.0, 1.0)[:7]]])
        props = jnp.broadcast_to(cur[:, None], (1, 4, 1, 7))
        traj, valid = generate_trajectory(
            cur, jnp.ones((1, 1), bool), props, jnp.ones((1, 4, 1), bool)
        )
        np.testing.assert_allclose(
            np.asarray(traj), np.broadcast_to(np.asarray(cur)[:, None],
                                              (1, 4, 1, 7)), atol=1e-6
        )
        assert np.asarray(valid).all()


class TestCropping:
    def test_padding_and_empty_semantics(self):
        # roi at origin (4x2 box -> crop radius 1.1*sqrt(5) ~ 2.46)
        rois = jnp.asarray([_box(0.0, 0.0)[:7], _box(100.0, 100.0)[:7]])
        pts = np.zeros((6, 5), np.float32)
        pts[0, :3] = [0.5, 0.1, 0.0]
        pts[1, :3] = [1.0, -0.2, 0.3]
        pts[2, :3] = [30.0, 0.0, 0.0]   # out of range of both
        pts[3:, :3] = [[40, 0, 0]] * 3
        pts[:, 3] = np.arange(6)
        out, nonempty = crop_roi_frame_points(
            jnp.asarray(pts), jnp.ones(6, bool), rois, jnp.ones(2, bool), k=4
        )
        out, nonempty = np.asarray(out), np.asarray(nonempty)
        assert nonempty[0] and not nonempty[1]
        # two real hits; the padding slots repeat the first hit (ref :480-486)
        got = {tuple(float(v) for v in np.round(row[:3].astype(np.float64), 3))
               for row in out[0]}
        assert (0.5, 0.1, 0.0) in got and (1.0, -0.2, 0.3) in got
        assert len(got) == 2
        # empty roi rows are zeroed
        assert (out[1] == 0).all()

    def test_invalid_roi_is_empty(self):
        rois = jnp.asarray([_box(0.0, 0.0)[:7]])
        pts = jnp.zeros((4, 5))
        _, nonempty = crop_roi_frame_points(
            pts, jnp.ones(4, bool), rois, jnp.zeros(1, bool), k=2
        )
        assert not np.asarray(nonempty)[0]


class TestProxyAndSpherical:
    def test_proxy_points_fill_the_box(self):
        rois = jnp.asarray([[2.0, -1.0, 0.5, 4.0, 2.0, 1.0, 0.0]])
        glob, local = proxy_points_of_roi(rois, 4)
        glob, local = np.asarray(glob)[0], np.asarray(local)[0]
        assert glob.shape == (64, 3)
        assert (np.abs(local[:, 0]) <= 2.0).all()
        assert (np.abs(local[:, 1]) <= 1.0).all()
        assert (np.abs(local[:, 2]) <= 0.5).all()
        np.testing.assert_allclose(glob.mean(0), [2.0, -1.0, 0.5], atol=1e-5)

    def test_rotation_moves_proxies(self):
        r0 = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 1.0, 1.0, 0.0]])
        r90 = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 1.0, 1.0, np.pi / 2]])
        g0, _ = proxy_points_of_roi(r0, 3)
        g90, _ = proxy_points_of_roi(r90, 3)
        # the long axis swaps from x to y under a 90 deg yaw
        g0, g90 = np.asarray(g0)[0], np.asarray(g90)[0]
        assert np.ptp(g0[:, 0]) > np.ptp(g0[:, 1])
        assert np.ptp(g90[:, 1]) > np.ptp(g90[:, 0])

    def test_spherical_feature_layout(self):
        xyz = jnp.asarray(np.random.RandomState(0).randn(1, 5, 3) * 0.5)
        roi = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
        feat = np.asarray(spherical_corner_feature(xyz, roi))
        assert feat.shape == (1, 5, 27)
        assert np.isfinite(feat).all()
        # first 9 channels are diag-normalized distances: non-negative
        assert (feat[..., :9] >= 0).all()


class TestE2EBank:
    def _model_and_batch(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent))
        from test_pointpillar import CLASSES
        from test_pvrcnn import pv_grid
        from test_zoo_variants import TestMPPNet

        from dfu3d_tpu.models import build_network

        cfg = TestMPPNet._cfg("MPPNetE2E")
        cfg["ROI_HEAD"]["NUM_LIDAR_POINTS"] = 32
        cfg["ROI_HEAD"]["GRID_SIZE"] = 3
        model = build_network(cfg, CLASSES, pv_grid(), max_voxels=512)
        batch = TestMPPNet()._batch_with_time(np.random.RandomState(3), b=1,
                                              n=256)
        return model, batch

    def test_bank_rolls_and_predicts(self):
        model, batch = self._model_and_batch()
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)

        def bank_step(batch, bank):
            return model.apply(
                variables, batch, bank,
                method=lambda m, b, bk: m.predict_with_bank(b, bk),
            )

        bank0 = model.bind(variables).empty_bank(1)
        (boxes1, scores1, _, valid1), bank1 = jax.jit(bank_step)(batch, bank0)
        assert np.isfinite(np.asarray(boxes1)).all()
        # frame-0 slot of the rolled bank carries the fresh geometry memory
        assert bank1.feats.shape == bank0.feats.shape
        assert np.asarray(bank1.valid)[:, 0].any()
        # second step consumes the bank without shape drift
        (boxes2, *_), bank2 = jax.jit(bank_step)(batch, bank1)
        assert np.isfinite(np.asarray(boxes2)).all()
        assert bank2.rois.shape == bank1.rois.shape
        # the step-1 current rois moved into the frame-1 slot
        np.testing.assert_allclose(np.asarray(bank2.rois[:, 1]),
                                   np.asarray(bank1.rois[:, 0]), atol=1e-6)
