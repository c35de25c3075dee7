"""PartA2 tests: UNet decode shapes, part targets, RoI-aware pooling, e2e."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core.voxel import VoxelGrid
from dfu3d_tpu.models import build_network
from dfu3d_tpu.utils.config import CfgDict

from test_model import CLASS_NAMES, make_batch
from test_pointpillar import pp_model_cfg


def pa2_cfg():
    cfg = pp_model_cfg()
    cfg["NAME"] = "PartA2Net"
    cfg["VFE"] = {"NAME": "MeanVFE"}
    cfg["BACKBONE_3D"] = {"NAME": "UNetV2",
                          "CHANNELS": [8, 8, 16, 16, 16], "OUT_CHANNELS": 32}
    cfg["BACKBONE_2D"] = {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2], "LAYER_STRIDES": [1],
        "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1],
        "NUM_UPSAMPLE_FILTERS": [32],
    }
    cfg["POINT_HEAD"] = {"NAME": "PointIntraPartOffsetHead", "CLS_FC": [32]}
    # reference PartA2.yaml ROI_HEAD schema at test scale
    cfg["ROI_HEAD"] = {
        "NAME": "PartA2FCHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "CLS_FC": [16], "REG_FC": [16],
        "DP_RATIO": 0.3,
        "SEG_MASK_SCORE_THRESH": 0.3,
        "ROI_POINT_SAMPLES": 32,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 8,
                     "NMS_THRESH": 0.7},
        },
        "ROI_AWARE_POOL": {"POOL_SIZE": 8, "NUM_FEATURES": 32,
                           "MAX_POINTS_PER_VOXEL": 32},
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
            "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
            "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.65,
        },
        "LOSS_CONFIG": {
            "CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {
                "rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                "rcnn_corner_weight": 1.0, "code_weights": [1.0] * 7,
            },
        },
    }
    for c in cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"]:
        c["feature_map_stride"] = 8
    return cfg


def pa2_grid():
    return VoxelGrid.create([0, -6.4, -3, 6.4, 6.4, 1], [0.2, 0.2, 0.25])


class TestRoIAwarePool:
    def test_grid_placement(self):
        from dfu3d_tpu.models.parta2 import roiaware_pool

        # a single roi at origin, axis-aligned; points in known octants
        rois = jnp.asarray(np.array([[0, 0, 0, 2, 2, 2, 0]], np.float32))
        pts = jnp.asarray(np.array(
            [[-0.75, -0.75, -0.75], [0.75, 0.75, 0.75]], np.float32
        ))
        feats = jnp.asarray(np.array([[1.0], [2.0]], np.float32))
        grids = roiaware_pool(
            pts, feats, jnp.ones(2, bool), rois, jnp.ones(1, bool),
            num_samples=8, grid_size=4,
        )
        g = np.asarray(grids)[0, ..., 0]  # (4,4,4) indexed [x][y][z]
        assert g[0, 0, 0] == 1.0   # low corner
        assert g[3, 3, 3] == 2.0   # high corner
        assert g.sum() == 3.0      # nothing else


class TestPartA2:
    def test_loss_grads_predict(self):
        model = build_network(pa2_cfg(), CLASS_NAMES, pa2_grid())
        batch = make_batch(np.random.RandomState(6), b=2, n=512)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        (loss, tb), _ = model.apply(variables, batch, train=True,
                                    mutable=["batch_stats"])
        assert np.isfinite(float(loss)) and float(loss) > 0
        for k in ("seg_loss", "part_loss", "rcnn_cls_loss"):
            assert np.isfinite(float(tb[k])), k

        def loss_fn(params):
            (l, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            return l

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(g)) for g in leaves)

        boxes, scores, labels, keep = model.apply(
            variables, batch, method=lambda m, b: m.predict(b)
        )
        assert boxes.shape == (2, 8, 7)
        assert np.all(np.isfinite(np.asarray(boxes)))
