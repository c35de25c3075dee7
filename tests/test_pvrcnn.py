"""PV-RCNN tests: VSA keypoint features, PKW, RoI grid pooling, e2e."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.core.voxel import VoxelGrid
from dfu3d_tpu.models import build_network
from dfu3d_tpu.utils.config import CfgDict

from test_model import CLASS_NAMES, make_batch
from test_pointpillar import pp_model_cfg


def pv_cfg():
    cfg = pp_model_cfg()
    cfg["NAME"] = "PVRCNN"
    cfg["VFE"] = {"NAME": "MeanVFE"}
    cfg["BACKBONE_3D"] = {"NAME": "VoxelBackBone8x",
                          "CHANNELS": [8, 8, 16, 16, 16], "OUT_CHANNELS": 32}
    cfg["BACKBONE_2D"] = {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2], "LAYER_STRIDES": [1],
        "NUM_FILTERS": [32], "UPSAMPLE_STRIDES": [1],
        "NUM_UPSAMPLE_FILTERS": [32],
    }
    cfg["PFE"] = {"NAME": "VoxelSetAbstraction", "NUM_KEYPOINTS": 128,
                  "SA_MLP": [8, 8], "FUSION_MLP": [32], "NSAMPLE": 8,
                  "STAGE_RADII": [0.4, 0.8, 1.6, 3.2]}
    cfg["POINT_HEAD"] = {"NAME": "PointHeadSimple"}
    # reference pv_rcnn.yaml ROI_HEAD schema at test scale
    cfg["ROI_HEAD"] = {
        "NAME": "PVRCNNHead", "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32], "CLS_FC": [16], "REG_FC": [16],
        "DP_RATIO": 0.3,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 8,
                     "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {
            "GRID_SIZE": 4, "MLPS": [[16, 16], [16, 16]],
            "POOL_RADIUS": [0.8, 1.6], "NSAMPLE": [8, 8],
            "POOL_METHOD": "max_pool",
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
            "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
            "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
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


def pv_grid():
    return VoxelGrid.create([0, -6.4, -3, 6.4, 6.4, 1], [0.2, 0.2, 0.25])


class TestPVRCNN:
    def test_loss_grads_predict(self):
        model = build_network(pv_cfg(), CLASS_NAMES, pv_grid())
        batch = make_batch(np.random.RandomState(8), b=2, n=384)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        (loss, tb), _ = model.apply(variables, batch, train=True,
                                    mutable=["batch_stats"])
        assert np.isfinite(float(loss)) and float(loss) > 0
        for k in ("kp_seg_loss", "rcnn_cls_loss", "rcnn_reg_loss"):
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
        assert sum(float(np.abs(g).sum()) for g in leaves) > 0

        boxes, scores, labels, keep = model.apply(
            variables, batch, method=lambda m, b: m.predict(b)
        )
        assert boxes.shape == (2, 8, 7)
        assert np.all(np.isfinite(np.asarray(boxes)))
