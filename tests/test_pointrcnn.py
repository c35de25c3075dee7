"""PointRCNN two-stage detector tests (tiny config, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.models import build_network
from dfu3d_tpu.utils.config import CfgDict

from test_model import CLASS_NAMES, make_batch, tiny_grid


def prcnn_cfg():
    return CfgDict(
        {
            "NAME": "PointRCNN",
            "BACKBONE_3D": {
                "NAME": "PointNet2MSG",
                "SA_CONFIG": {
                    "NPOINTS": [128, 32],
                    "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
                    "NSAMPLE": [[8, 16], [8, 16]],
                    "MLPS": [[[16, 16], [16, 32]], [[32, 32], [32, 64]]],
                },
                "FP_MLPS": [[64, 64], [64, 64]],
            },
            "POINT_HEAD": {
                "NAME": "PointHeadBox",
                "CLS_FC": [64, 64],
                "REG_FC": [64, 64],
                "TARGET_CONFIG": {
                    "BOX_CODER_CONFIG": {
                        "use_mean_size": True,
                        "mean_size": [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73],
                                      [1.76, 0.6, 1.73]],
                    }
                },
            },
            # reference pointrcnn.yaml ROI_HEAD schema at test scale
            "ROI_HEAD": {
                "NAME": "PointRCNNHead",
                "CLASS_AGNOSTIC": True,
                "ROI_POINT_POOL": {
                    "POOL_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                    "NUM_SAMPLED_POINTS": 32,
                    "DEPTH_NORMALIZER": 70.0,
                },
                "XYZ_UP_LAYER": [16, 16],
                "CLS_FC": [16], "REG_FC": [16],
                "DP_RATIO": 0.0, "USE_BN": False,
                "SA_CONFIG": {
                    "NPOINTS": [16, 8, -1],
                    "RADIUS": [0.2, 0.4, 100],
                    "NSAMPLE": [8, 8, 8],
                    "MLPS": [[16, 16], [16, 32], [32, 32]],
                },
                "NMS_CONFIG": {
                    "TRAIN": {"NMS_PRE_MAXSIZE": 128,
                              "NMS_POST_MAXSIZE": 32, "NMS_THRESH": 0.8},
                    "TEST": {"NMS_PRE_MAXSIZE": 128,
                             "NMS_POST_MAXSIZE": 16, "NMS_THRESH": 0.85},
                },
                "TARGET_CONFIG": {
                    "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
                    "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
                    "CLS_SCORE_TYPE": "cls",
                    "CLS_FG_THRESH": 0.6, "CLS_BG_THRESH": 0.45,
                    "CLS_BG_THRESH_LO": 0.1, "HARD_BG_RATIO": 0.8,
                    "REG_FG_THRESH": 0.55,
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
            "POST_PROCESSING": {
                "SCORE_THRESH": 0.1,
                "NMS_CONFIG": {"NMS_PRE_MAXSIZE": 128,
                               "NMS_POST_MAXSIZE": 16, "NMS_THRESH": 0.1},
            },
        }
    )


class TestPointRCNN:
    def test_loss_gradients_predict(self):
        model = build_network(prcnn_cfg(), CLASS_NAMES, tiny_grid())
        batch = make_batch(np.random.RandomState(12), b=2, n=256)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, train=False
        )
        (loss, tb), _ = model.apply(variables, batch, train=True,
                                    mutable=["batch_stats"])
        assert np.isfinite(float(loss)) and float(loss) > 0
        for k in ("point_cls_loss", "point_reg_loss", "rcnn_cls_loss",
                  "rcnn_reg_loss"):
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

        boxes, scores, labels, valid = model.apply(
            variables, batch, method=lambda m, b: m.predict(b)
        )
        assert boxes.shape == (2, 16, 7)
        assert np.all(np.isfinite(np.asarray(boxes)))

    def test_point_target_assignment(self):
        from dfu3d_tpu.models.pointrcnn import assign_point_targets

        pts = jnp.asarray(np.array(
            [[0.0, 0, 0], [0.0, 0.95, 0], [5.0, 5, 5]], np.float32
        ))
        gt = jnp.asarray(np.array([[0.0, 0, 0, 2, 1.8, 2, 0, 2]], np.float32))
        labels, matched = assign_point_targets(
            pts, jnp.ones(3, bool), gt, jnp.ones(1, bool)
        )
        labels = np.asarray(labels)
        assert labels[0] == 2       # inside → class id
        assert labels[1] == -1      # in enlarged shell → ignored
        assert labels[2] == 0       # far away → background
