"""Backbone variants + AnchorHeadMulti + circle_nms wiring tests."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core.voxel.sparse_ops import SparseGrid


class TestVoxelResBackBone8x:
    def test_fwd_and_grads(self):
        from dfu3d_tpu.models.sparse_backbone import VoxelResBackBone8x

        rng = np.random.RandomState(0)
        grid = SparseGrid(32, 32, 8)
        b, v = 2, 96
        coords = np.stack([
            rng.randint(0, 32, (b, v)), rng.randint(0, 32, (b, v)),
            rng.randint(0, 8, (b, v))], axis=-1).astype(np.int32)
        valid = np.ones((b, v), bool)
        valid[:, 80:] = False
        feats = rng.randn(b, v, 4).astype(np.float32)
        model = VoxelResBackBone8x(grid=grid, voxel_cap=v,
                                   channels=(8, 8, 16, 16), out_channels=16)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                               jnp.asarray(coords), jnp.asarray(valid), False)

        def loss(params):
            st = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid),
                True, mutable=["batch_stats"])[0]
            return jnp.sum(st.features ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert sum(float(np.abs(np.asarray(x)).sum()) for x in leaves) > 0


class TestBEVVariants:
    def test_res_backbone_shapes(self):
        from dfu3d_tpu.models.backbone_2d import BaseBEVResBackbone

        m = BaseBEVResBackbone(layer_nums=[2, 2], layer_strides=[1, 2],
                               num_filters=[16, 32], upsample_strides=[1, 2],
                               num_upsample_filters=[16, 16])
        x = jnp.zeros((1, 32, 32, 8))
        v = m.init(jax.random.PRNGKey(0), x, False)
        out = m.apply(v, x, False)
        assert out.shape == (1, 32, 32, 32)

    def test_v1_multi_scale(self):
        from dfu3d_tpu.models.backbone_2d import BaseBEVBackboneV1

        # reference constraint: NUM_FILTERS[0] == sum(NUM_UPSAMPLE_FILTERS)
        # (blocks[0] refines the deblock concat, base_bev_backbone.py:202)
        m = BaseBEVBackboneV1(layer_nums=[2, 2], num_filters=[32, 32],
                              upsample_strides=[1, 2],
                              num_upsample_filters=[16, 16])
        maps = [jnp.zeros((1, 32, 32, 32)), jnp.zeros((1, 16, 16, 32))]
        v = m.init(jax.random.PRNGKey(0), maps, False)
        out = m.apply(v, maps, False)
        assert out.shape == (1, 32, 32, 32)


class TestAnchorHeadMulti:
    def test_detector_with_multi_head(self):
        from dfu3d_tpu.models import build_network

        from test_model import make_batch
        from test_pointpillar import CLASSES, pp_model_cfg, tiny_grid

        cfg = pp_model_cfg()
        cfg["DENSE_HEAD"]["NAME"] = "AnchorHeadMulti"
        cfg["DENSE_HEAD"]["SHARED_CONV_NUM_FILTER"] = 16
        model = build_network(cfg, CLASSES, tiny_grid())
        batch = make_batch(np.random.RandomState(3), b=2, n=256)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        (loss, tb), _ = model.apply(variables, batch, train=True,
                                    mutable=["batch_stats"])
        assert np.isfinite(float(loss)) and float(loss) > 0

        def loss_fn(params):
            (l, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"])
            return l

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        boxes, scores, labels, keep = model.apply(
            variables, batch, method=lambda m, b: m.predict(b))
        assert np.isfinite(np.asarray(boxes)).all()


class TestCircleNMSWiring:
    def test_centerpoint_circle_nms_predict(self):
        from dfu3d_tpu.models import build_network
        from dfu3d_tpu.core.voxel import VoxelGrid

        from test_model import CLASS_NAMES, make_batch, tiny_model_cfg

        cfg = tiny_model_cfg()
        cfg["DENSE_HEAD"]["POST_PROCESSING"]["NMS_CONFIG"]["NMS_TYPE"] = "circle_nms"
        cfg["DENSE_HEAD"]["POST_PROCESSING"]["NMS_CONFIG"]["NMS_THRESH"] = 2.0
        grid = VoxelGrid.create([0, -6.4, -3, 6.4, 6.4, 1], [0.2, 0.2, 4.0])
        model = build_network(cfg, CLASS_NAMES, grid)
        batch = make_batch(np.random.RandomState(4), b=1, n=256)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        boxes, scores, labels, keep = model.apply(
            variables, batch, method=lambda m, b: m.predict(b))
        assert np.isfinite(np.asarray(boxes)).all()


class TestDSVTAndPillarNet:
    def test_dsvt_centerpoint(self):
        from dfu3d_tpu.core.voxel import VoxelGrid
        from dfu3d_tpu.models import build_network

        from test_model import CLASS_NAMES, make_batch, tiny_model_cfg

        cfg = tiny_model_cfg()
        cfg["BACKBONE_3D"] = {"NAME": "DSVT", "DIM": 16, "NUM_HEADS": 2,
                              "NUM_BLOCKS": 2, "WINDOW_SHAPE": [8, 8],
                              "SET_SIZE": 16, "MAX_SETS": 128}
        grid = VoxelGrid.create([0, -6.4, -3, 6.4, 6.4, 1], [0.2, 0.2, 4.0])
        model = build_network(cfg, CLASS_NAMES, grid, max_voxels=512)
        batch = make_batch(np.random.RandomState(5), b=2, n=256)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        (loss, _), _ = model.apply(variables, batch, train=True,
                                   mutable=["batch_stats"])
        assert np.isfinite(float(loss)) and float(loss) > 0

        def loss_fn(params):
            (l, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"])
            return l

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        boxes, *_ = model.apply(variables, batch,
                                method=lambda m, b: m.predict(b))
        assert np.isfinite(np.asarray(boxes)).all()

    def test_dsvt_voxel_centerpoint(self):
        """Multi-stage 3D DSVT (reference dsvt_voxel.yaml): two stages of
        3D rotated-set windows with attention-pooled z-downsampling, via
        the reference's native BACKBONE_3D schema + DynamicVoxelVFE."""
        from dfu3d_tpu.core.voxel import VoxelGrid
        from dfu3d_tpu.models import build_network

        from test_model import CLASS_NAMES, make_batch, tiny_model_cfg

        cfg = tiny_model_cfg()
        cfg["VFE"] = {"NAME": "DynamicVoxelVFE", "WITH_DISTANCE": False,
                      "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
                      "NUM_FILTERS": [16, 16]}
        cfg["BACKBONE_3D"] = {
            "NAME": "DSVT",
            "INPUT_LAYER": {
                "sparse_shape": [64, 64, 4],
                "downsample_stride": [[1, 1, 4]],
                "window_shape": [[8, 8, 4], [8, 8, 1]],
                "hybrid_factor": [2, 2, 1],
            },
            "set_info": [[8, 1], [8, 1]],
            "d_model": [16, 16],
            "nhead": [2, 2],
            "dim_feedforward": [32, 32],
            "MAX_SETS": 128,
        }
        grid = VoxelGrid.create([0, -6.4, -3, 6.4, 6.4, 1], [0.2, 0.2, 1.0])
        model = build_network(cfg, CLASS_NAMES, grid, max_voxels=512)
        batch = make_batch(np.random.RandomState(6), b=2, n=256)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        (loss, _), mut = model.apply(variables, batch, train=True,
                                     mutable=["batch_stats"])
        assert np.isfinite(float(loss)) and float(loss) > 0

        def loss_fn(params):
            (l, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"])
            return l

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        boxes, *_ = model.apply(variables, batch,
                                method=lambda m, b: m.predict(b))
        assert np.isfinite(np.asarray(boxes)).all()

    def test_pillarnet(self):
        from dfu3d_tpu.core.voxel import VoxelGrid
        from dfu3d_tpu.models import build_network

        from test_model import CLASS_NAMES, make_batch, tiny_model_cfg

        cfg = tiny_model_cfg()
        cfg["NAME"] = "PillarNet"
        cfg["VFE"] = {"NAME": "MeanVFE"}
        cfg["BACKBONE_3D"] = {"NAME": "PillarRes18BackBone8x",
                              "CHANNELS": [8, 8, 16, 16, 16],
                              "OUT_CHANNELS": 16, "CONV5_CHANNELS": 16}
        # the rebuilt PillarNet pins the reference neck (pillarnet.py:147)
        cfg["BACKBONE_2D"] = {
            "NAME": "BaseBEVBackboneV1",
            "LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
            "NUM_FILTERS": [16, 16], "UPSAMPLE_STRIDES": [1, 2],
            "NUM_UPSAMPLE_FILTERS": [16, 16],
        }
        cfg["DENSE_HEAD"]["TARGET_ASSIGNER_CONFIG"]["FEATURE_MAP_STRIDE"] = 16
        grid = VoxelGrid.create([0, -6.4, -3, 6.4, 6.4, 1], [0.1, 0.1, 4.0])
        model = build_network(cfg, CLASS_NAMES, grid, max_voxels=512)
        batch = make_batch(np.random.RandomState(6), b=2, n=256)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        (loss, _), _ = model.apply(variables, batch, train=True,
                                   mutable=["batch_stats"])
        assert np.isfinite(float(loss)) and float(loss) > 0
        boxes, *_ = model.apply(variables, batch,
                                method=lambda m, b: m.predict(b))
        assert np.isfinite(np.asarray(boxes)).all()


class TestMPPNet:
    def _batch_with_time(self, rng, b=2, n=384):
        from test_model import make_batch

        batch = make_batch(rng, b=b, n=n)
        lag = rng.randint(0, 4, (b, n)).astype(np.float32) * 0.1
        pts = np.concatenate([np.asarray(batch.points), lag[..., None]], axis=-1)
        return batch._replace(points=pts)

    @staticmethod
    def _cfg(name):
        from test_pvrcnn import pv_cfg

        cfg = pv_cfg()
        cfg["NAME"] = name
        cfg["ROI_HEAD"] = {"NAME": "MPPNetHead", "NMS_PRE_MAXSIZE": 128,
                           "NMS_POST_MAXSIZE": 8, "NMS_THRESH": 0.8,
                           "NUM_FRAMES": 4, "NSAMPLE": 16, "RADIUS": 2.4,
                           "HIDDEN": 16, "NUM_LAYERS": 1,
                           "TARGET_CONFIG": {"ROI_PER_IMAGE": 8}}
        return cfg

    def test_mppnet_and_e2e(self):
        from dfu3d_tpu.models import build_network

        from test_pvrcnn import pv_grid
        from test_pointpillar import CLASSES

        for name in ("MPPNet", "MPPNetE2E"):
            model = build_network(self._cfg(name), CLASSES, pv_grid(),
                                  max_voxels=512)
            batch = self._batch_with_time(np.random.RandomState(7))
            variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                                   train=False)
            (loss, tb), _ = model.apply(variables, batch, train=True,
                                        mutable=["batch_stats"])
            assert np.isfinite(float(loss)) and float(loss) > 0, name
            for k in ("rcnn_cls_loss", "rcnn_reg_loss"):
                assert np.isfinite(float(tb[k])), (name, k)

            def loss_fn(params):
                (l, _), _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    batch, train=True, mutable=["batch_stats"])
                return l

            g = jax.grad(loss_fn)(variables["params"])
            leaves = jax.tree_util.tree_leaves(g)
            assert all(np.isfinite(np.asarray(x)).all() for x in leaves), name
            boxes, *_ = model.apply(variables, batch,
                                    method=lambda m, b: m.predict(b))
            assert np.isfinite(np.asarray(boxes)).all(), name
