"""Focal sparse convolution tests (VoxelBackBone8xFocal + FocalSparseConv)."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core.voxel.sparse_ops import SparseGrid
from dfu3d_tpu.models.sparse_backbone import SparseTensor
from dfu3d_tpu.models.sparse_backbone_focal import (
    FocalSparseConv,
    VoxelBackBone8xFocal,
    binary_focal_loss,
)

PCR = (0.0, 0.0, 0.0, 8.0, 8.0, 4.0)
VS = (0.25, 0.25, 0.5)


def make_inputs(rng, b=2, v=64, grid=SparseGrid(32, 32, 8)):
    coords = np.stack([
        rng.randint(1, grid.nx - 1, (b, v)),
        rng.randint(1, grid.ny - 1, (b, v)),
        rng.randint(1, grid.nz - 1, (b, v)),
    ], axis=-1).astype(np.int32)
    valid = np.ones((b, v), bool)
    valid[:, v - 8:] = False
    feats = rng.randn(b, v, 8).astype(np.float32)
    return feats, coords, valid


class TestFocalSparseConv:
    def _apply(self, feats, coords, valid, train=True, **kw):
        grid = SparseGrid(32, 32, 8)
        st = SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                          jnp.asarray(valid), grid)
        gt = jnp.zeros((feats.shape[0], 4, 8), jnp.float32)
        gt = gt.at[:, 0, 0:3].set(jnp.asarray([4.0, 4.0, 1.0]))
        gt = gt.at[:, 0, 3:6].set(2.0)
        gv = jnp.zeros((feats.shape[0], 4), bool).at[:, 0].set(True)
        layer = FocalSparseConv(
            channels=8, voxel_stride=1, point_cloud_range=PCR, voxel_size=VS,
            dilate_cap=32, **kw)
        variables = layer.init(jax.random.PRNGKey(0), st, gt, gv, False)
        (out, loss), _ = layer.apply(variables, st, gt, gv, train,
                                     mutable=["batch_stats"])
        return out, loss, variables, layer, (st, gt, gv)

    def test_shapes_and_capacity_growth(self):
        rng = np.random.RandomState(0)
        feats, coords, valid = make_inputs(rng)
        out, loss, *_ = self._apply(feats, coords, valid)
        assert out.features.shape == (2, 64 + 32, 8)
        assert out.coords.shape == (2, 96, 3)
        assert bool(np.isfinite(float(loss)))
        # originals stay active
        assert np.all(np.asarray(out.valid[:, :56]))

    def test_dilated_voxels_are_new_cells(self):
        rng = np.random.RandomState(1)
        feats, coords, valid = make_inputs(rng)
        out, _, *_ = self._apply(feats, coords, valid, threshold=0.2)
        grid = SparseGrid(32, 32, 8)
        for b in range(2):
            orig = {tuple(c) for c, ok in zip(coords[b], valid[b]) if ok}
            new = np.asarray(out.coords[b, 64:])
            new_valid = np.asarray(out.valid[b, 64:])
            seen = set()
            for c, ok in zip(new, new_valid):
                if not ok:
                    continue
                t = tuple(int(x) for x in c)
                # not an original cell, not a duplicate, inside the grid
                assert t not in orig
                assert t not in seen
                seen.add(t)
                assert 0 <= t[0] < grid.nx and 0 <= t[1] < grid.ny \
                    and 0 <= t[2] < grid.nz

    def test_eval_no_dilation_loss(self):
        rng = np.random.RandomState(2)
        feats, coords, valid = make_inputs(rng)
        out, loss, *_ = self._apply(feats, coords, valid, train=False)
        assert float(loss) == 0.0

    def test_grads_flow_to_importance_conv(self):
        rng = np.random.RandomState(3)
        feats, coords, valid = make_inputs(rng)
        _, _, variables, layer, (st, gt, gv) = self._apply(
            feats, coords, valid)

        def loss_fn(params):
            (out, floss), _ = layer.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                st, gt, gv, True, mutable=["batch_stats"])
            return jnp.sum(out.features ** 2) * 0.0 + floss

        g = jax.grad(loss_fn)(variables["params"])
        imp = jax.tree_util.tree_leaves(g["conv_imp"])
        assert sum(float(np.abs(np.asarray(x)).sum()) for x in imp) > 0


class TestBinaryFocalLoss:
    def test_matches_manual_two_class(self):
        p = jnp.asarray([0.9, 0.2, 0.5])
        t = jnp.asarray([1.0, 0.0, 1.0])
        valid = jnp.asarray([True, True, True])
        got = float(binary_focal_loss(p, t, valid, gamma=2.0))
        pc = np.clip(np.asarray(p), 1e-7, 1 - 1e-7)
        tn = np.asarray(t)
        manual = (-tn * np.log(pc) * (1 - pc) ** 2
                  - (1 - tn) * np.log(1 - pc) * pc ** 2)
        assert abs(got - manual.sum() / 6.0) < 1e-6

    def test_invalid_masked(self):
        p = jnp.asarray([0.9, 0.0001])
        t = jnp.asarray([1.0, 1.0])
        full = float(binary_focal_loss(p, t, jnp.asarray([True, True])))
        masked = float(binary_focal_loss(p, t, jnp.asarray([True, False])))
        assert masked < full


class TestVoxelBackBone8xFocal:
    def test_fwd_and_grads(self):
        rng = np.random.RandomState(0)
        grid = SparseGrid(32, 32, 8)
        feats, coords, valid = make_inputs(rng, v=96, grid=grid)
        gt = np.zeros((2, 4, 8), np.float32)
        gt[:, 0, 0:3] = [4.0, 4.0, 1.0]
        gt[:, 0, 3:6] = 2.0
        gv = np.zeros((2, 4), bool)
        gv[:, 0] = True
        model = VoxelBackBone8xFocal(
            grid=grid, voxel_cap=96, point_cloud_range=PCR, voxel_size=VS,
            channels=(8, 8, 8, 16, 16), out_channels=16)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(coords),
            jnp.asarray(valid), False)

        def loss(params):
            (st, stages, floss), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid),
                True, gt_boxes=jnp.asarray(gt), gt_valid=jnp.asarray(gv),
                mutable=["batch_stats"])
            assert len(stages) == 4
            return jnp.sum(st.features ** 2) + floss

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert sum(float(np.abs(np.asarray(x)).sum()) for x in leaves) > 0


class TestVoxelRCNNFocal:
    def test_focal_voxelrcnn_loss_and_predict(self):
        from pathlib import Path

        from dfu3d_tpu.core.voxel import VoxelGrid
        from dfu3d_tpu.data.dataset import MultimodalBatch
        from dfu3d_tpu.models import build_network
        from dfu3d_tpu.utils.config import CfgDict, cfg_from_yaml_file

        cfg = CfgDict()
        cfg_from_yaml_file(
            Path(__file__).parent.parent
            / "tools/cfgs/kitti_models/voxel_rcnn_focal.yaml", cfg)
        pcr = [0.0, -4.0, -3.0, 8.0, 4.0, 1.0]
        grid = VoxelGrid.create(pcr, [0.25, 0.25, 0.25])
        model = build_network(cfg.MODEL, cfg.CLASS_NAMES, grid,
                              max_voxels=256)

        rng = np.random.RandomState(0)
        b, n, m = 2, 512, 8
        pts = np.zeros((b, n, 4), np.float32)
        pts[..., 0] = rng.uniform(0.5, 7.5, (b, n))
        pts[..., 1] = rng.uniform(-3.5, 3.5, (b, n))
        pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
        gt = np.zeros((b, m, 8), np.float32)
        gt[..., 0] = rng.uniform(1, 7, (b, m))
        gt[..., 1] = rng.uniform(-3, 3, (b, m))
        gt[..., 2] = -1.0
        gt[..., 3:6] = rng.uniform(0.5, 2.0, (b, m, 3))
        gt[..., 7] = 1
        gv = np.zeros((b, m), bool)
        gv[:, :4] = True
        h, w = 32, 48
        batch = MultimodalBatch(
            points=pts, points_valid=np.ones((b, n), bool),
            gt_boxes=gt, gt_valid=gv,
            images=rng.rand(b, 1, h, w, 3).astype(np.float32),
            cam_intrinsics=np.tile(np.eye(3, dtype=np.float32), (b, 1, 1, 1)),
            cam2lidar_rots=np.tile(np.eye(3, dtype=np.float32), (b, 1, 1, 1)),
            cam2lidar_trans=np.zeros((b, 1, 3), np.float32),
            lidar_to_cam=np.tile(np.eye(4, dtype=np.float32), (b, 1, 1, 1)),
            cam_to_img=np.tile(np.eye(3, 4, dtype=np.float32)[None],
                               (b, 1, 1, 1)),
            depth_maps=np.zeros((b, 1, h, w), np.float32),
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        (loss, tb), _ = model.apply(variables, batch, train=True,
                                    mutable=["batch_stats"])
        assert np.isfinite(float(loss))
        assert "loss_box_of_pts" in tb
        boxes, scores, labels, valid = model.apply(
            variables, batch, method=lambda mm, bb: mm.predict(bb))
        assert boxes.shape[0] == b and boxes.shape[-1] == 7
