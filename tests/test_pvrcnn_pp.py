"""PV-RCNN++ + VoxelRCNN + vector_pool tests."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core import pointnet2 as P
from dfu3d_tpu.models import build_network

from test_model import CLASS_NAMES, make_batch
from test_pvrcnn import pv_cfg, pv_grid


class TestVectorPool:
    def test_bin_means_match_bruteforce(self):
        rng = np.random.RandomState(0)
        n, m, c = 200, 8, 5
        xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        feats = rng.randn(n, c).astype(np.float32)
        valid = np.ones(n, bool)
        valid[150:] = False
        queries = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
        radius, nsample, bins = 1.0, 64, (2, 2, 2)

        out, has = P.vector_pool(
            jnp.asarray(queries), jnp.ones(m, bool), jnp.asarray(xyz),
            jnp.asarray(valid), jnp.asarray(feats), radius, nsample, bins,
        )
        out = np.asarray(out).reshape(m, 8, 3 + c)

        for q in range(m):
            d = xyz - queries[q]
            within = (np.sum(d * d, axis=1) <= radius**2) & valid
            idx = np.where(within)[0][:nsample]
            assert bool(has[q]) == (len(idx) > 0)
            rel = (xyz[idx] - queries[q] + radius) / (2 * radius)
            b = (np.clip((rel * 2).astype(int), 0, 1) * [4, 2, 1]).sum(1)
            for bin_ in range(8):
                sel = idx[b == bin_]
                if len(sel) == 0:
                    np.testing.assert_allclose(out[q, bin_], 0.0, atol=1e-6)
                else:
                    want = np.concatenate(
                        [(xyz[sel] - queries[q]).mean(0), feats[sel].mean(0)]
                    )
                    np.testing.assert_allclose(out[q, bin_], want,
                                               rtol=1e-4, atol=1e-4)

    def test_empty_source(self):
        out, has = P.vector_pool(
            jnp.zeros((4, 3)), jnp.ones(4, bool), jnp.zeros((10, 3)),
            jnp.zeros(10, bool), jnp.zeros((10, 2)), 1.0, 8, (2, 2, 2),
        )
        assert not np.any(np.asarray(has))
        assert np.all(np.asarray(out) == 0)


def _two_stage_smoke(cfg_name, extra_cfg=None):
    cfg = pv_cfg()
    cfg["NAME"] = cfg_name
    if extra_cfg:
        cfg.update(extra_cfg)
    model = build_network(cfg, CLASS_NAMES, pv_grid())
    batch = make_batch(np.random.RandomState(9), b=2, n=384)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    (loss, tb), _ = model.apply(variables, batch, train=True,
                                mutable=["batch_stats"])
    assert np.isfinite(float(loss)) and float(loss) > 0

    def loss_fn(params):
        (l, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"],
        )
        return l

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert sum(float(np.abs(g).sum()) for g in leaves) > 0

    boxes, scores, labels, keep = model.apply(
        variables, batch, method=lambda m, b: m.predict(b)
    )
    assert boxes.shape == (2, 8, 7)
    assert np.all(np.isfinite(np.asarray(boxes)))
    return tb


class TestPVRCNNPlusPlus:
    def test_loss_grads_predict(self):
        # reference VectorPoolAggregationModuleMSG ROI_GRID_POOL schema at
        # test scale (pv_rcnn_plusplus yaml GROUP_CFG_i)
        tb = _two_stage_smoke("PVRCNNPlusPlus", {
            "PFE": {"NAME": "VectorPoolAggregation", "NUM_KEYPOINTS": 128,
                    "SA_MLP": [8, 8], "FUSION_MLP": [32], "NSAMPLE": 8,
                    "STAGE_RADII": [0.4, 0.8, 1.6, 3.2], "VP_BINS": [2, 2, 2],
                    "SPC_RADIUS": 2.4},
            "ROI_HEAD": {
                **pv_cfg()["ROI_HEAD"],
                "NAME": "PVRCNNHead",
                "ROI_GRID_POOL": {
                    "GRID_SIZE": 4,
                    "NAME": "VectorPoolAggregationModuleMSG",
                    "NUM_GROUPS": 2,
                    "MSG_POST_MLPS": [16],
                    "GROUP_CFG_0": {"NUM_LOCAL_VOXEL": [2, 2, 2],
                                    "MAX_NEIGHBOR_DISTANCE": 0.8,
                                    "NEIGHBOR_NSAMPLE": 8,
                                    "POST_MLPS": [16, 16]},
                    "GROUP_CFG_1": {"NUM_LOCAL_VOXEL": [2, 2, 2],
                                    "MAX_NEIGHBOR_DISTANCE": 1.6,
                                    "NEIGHBOR_NSAMPLE": 8,
                                    "POST_MLPS": [16, 16]},
                },
            },
        })
        for k in ("kp_seg_loss", "rcnn_cls_loss", "rcnn_reg_loss"):
            assert np.isfinite(float(tb[k])), k


def _pool_layer(radius):
    return {"MLPS": [[16, 16]], "QUERY_RANGES": [[4, 4, 4]],
            "POOL_RADIUS": [radius], "NSAMPLE": [8],
            "POOL_METHOD": "max_pool"}


class TestVoxelRCNN:
    def test_loss_grads_predict(self):
        # reference voxel_rcnn_car.yaml ROI_HEAD schema at test scale
        tb = _two_stage_smoke("VoxelRCNN", {
            "ROI_HEAD": {
                "NAME": "VoxelRCNNHead", "CLASS_AGNOSTIC": True,
                "SHARED_FC": [32, 32], "CLS_FC": [16], "REG_FC": [16],
                "DP_RATIO": 0.3,
                "NMS_CONFIG": {
                    "TRAIN": {"NMS_PRE_MAXSIZE": 128,
                              "NMS_POST_MAXSIZE": 32, "NMS_THRESH": 0.8},
                    "TEST": {"NMS_PRE_MAXSIZE": 128,
                             "NMS_POST_MAXSIZE": 8, "NMS_THRESH": 0.7},
                },
                "ROI_GRID_POOL": {
                    "GRID_SIZE": 4,
                    "FEATURES_SOURCE": ["x_conv2", "x_conv3", "x_conv4"],
                    "POOL_LAYERS": {
                        "x_conv2": _pool_layer(0.4),
                        "x_conv3": _pool_layer(0.8),
                        "x_conv4": _pool_layer(1.6),
                    },
                },
                "TARGET_CONFIG": {
                    "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
                    "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
                    "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
                    "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
                    "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
                },
                "LOSS_CONFIG": {
                    "CLS_LOSS": "BinaryCrossEntropy",
                    "REG_LOSS": "smooth-l1",
                    "CORNER_LOSS_REGULARIZATION": True,
                    "LOSS_WEIGHTS": {
                        "rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                        "rcnn_corner_weight": 1.0,
                        "code_weights": [1.0] * 7,
                    },
                },
            },
        })
        for k in ("rcnn_cls_loss", "rcnn_reg_loss"):
            assert np.isfinite(float(tb[k])), k
