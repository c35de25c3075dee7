"""PointPillar / anchor-head tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu3d_tpu.core.voxel import VoxelGrid
from dfu3d_tpu.models import build_network
from dfu3d_tpu.models.anchor_head import (
    decode_boxes,
    encode_boxes,
    generate_anchors,
)
from dfu3d_tpu.utils.config import CfgDict

from test_model import make_batch, tiny_grid


CLASSES = ["Car", "Pedestrian", "Cyclist"]


def pp_model_cfg():
    return CfgDict(
        {
            "NAME": "PointPillar",
            "VFE": {
                "NAME": "DynPillarVFE",
                "WITH_DISTANCE": False,
                "USE_ABSLOTE_XYZ": True,
                "USE_NORM": True,
                "NUM_FILTERS": [32],
            },
            "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 32},
            "BACKBONE_2D": {
                "NAME": "BaseBEVBackbone",
                "LAYER_NUMS": [2, 2],
                "LAYER_STRIDES": [2, 2],
                "NUM_FILTERS": [32, 64],
                "UPSAMPLE_STRIDES": [1, 2],
                "NUM_UPSAMPLE_FILTERS": [32, 32],
            },
            "DENSE_HEAD": {
                "NAME": "AnchorHeadSingle",
                "CLASS_AGNOSTIC": False,
                "USE_DIRECTION_CLASSIFIER": True,
                "DIR_OFFSET": 0.78539,
                "DIR_LIMIT_OFFSET": 0.0,
                "NUM_DIR_BINS": 2,
                "ANCHOR_GENERATOR_CONFIG": [
                    {
                        "class_name": "Car",
                        "anchor_sizes": [[3.9, 1.6, 1.56]],
                        "anchor_rotations": [0, 1.57],
                        "anchor_bottom_heights": [-1.78],
                        "align_center": False,
                        "feature_map_stride": 2,
                        "matched_threshold": 0.6,
                        "unmatched_threshold": 0.45,
                    },
                    {
                        "class_name": "Pedestrian",
                        "anchor_sizes": [[0.8, 0.6, 1.73]],
                        "anchor_rotations": [0, 1.57],
                        "anchor_bottom_heights": [-0.6],
                        "align_center": False,
                        "feature_map_stride": 2,
                        "matched_threshold": 0.5,
                        "unmatched_threshold": 0.35,
                    },
                    {
                        "class_name": "Cyclist",
                        "anchor_sizes": [[1.76, 0.6, 1.73]],
                        "anchor_rotations": [0, 1.57],
                        "anchor_bottom_heights": [-0.6],
                        "align_center": False,
                        "feature_map_stride": 2,
                        "matched_threshold": 0.5,
                        "unmatched_threshold": 0.35,
                    },
                ],
                "TARGET_ASSIGNER_CONFIG": {
                    "NAME": "AxisAlignedTargetAssigner",
                    "POS_FRACTION": -1.0,
                    "SAMPLE_SIZE": 512,
                    "NORM_BY_NUM_EXAMPLES": False,
                    "MATCH_HEIGHT": False,
                },
                "LOSS_CONFIG": {
                    "LOSS_WEIGHTS": {
                        "cls_weight": 1.0,
                        "loc_weight": 2.0,
                        "dir_weight": 0.2,
                        "code_weights": [1.0] * 7,
                    }
                },
            },
            "POST_PROCESSING": {
                "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                "SCORE_THRESH": 0.1,
                "NMS_CONFIG": {
                    "MULTI_CLASSES_NMS": False,
                    "NMS_TYPE": "nms_gpu",
                    "NMS_THRESH": 0.01,
                    "NMS_PRE_MAXSIZE": 256,
                    "NMS_POST_MAXSIZE": 32,
                },
            },
        }
    )


class TestCoder:
    def test_encode_decode_roundtrip(self, rng):
        anchors = np.zeros((50, 7), np.float32)
        anchors[:, 0:3] = rng.uniform(-10, 10, (50, 3))
        anchors[:, 3:6] = rng.uniform(1, 4, (50, 3))
        anchors[:, 6] = rng.choice([0, 1.57], 50)
        boxes = anchors + rng.normal(0, 0.3, (50, 7)).astype(np.float32)
        boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
        enc = encode_boxes(jnp.asarray(boxes), jnp.asarray(anchors))
        dec = np.asarray(decode_boxes(enc, jnp.asarray(anchors)))
        assert np.allclose(dec, boxes, atol=1e-4)


class TestAnchorGenerator:
    def test_shapes_and_values(self):
        cfgs = [
            {
                "class_name": "Car",
                "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "align_center": False,
                "feature_map_stride": 2,
            }
        ]
        anchors, counts = generate_anchors(cfgs, (64, 64, 1), [0, -6.4, -3, 6.4, 6.4, 1])
        a = anchors[0]
        assert a.shape == (1, 32, 32, 1, 2, 7)
        assert counts == [2]
        # z center = bottom + h/2
        assert np.allclose(a[..., 2], -1.78 + 1.56 / 2)
        assert np.allclose(a[0, 0, 0, 0, :, 6], [0, 1.57])
        # first/last x centers span the range (align_center=False)
        assert abs(a[0, 0, 0, 0, 0, 0] - 0.0) < 1e-5
        assert abs(a[0, 0, -1, 0, 0, 0] - 6.4) < 1e-5


class TestPointPillar:
    @pytest.fixture(scope="class")
    def model_and_state(self):
        model = build_network(pp_model_cfg(), CLASSES, tiny_grid())
        batch = make_batch(np.random.RandomState(4))
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, train=False,
            method=lambda m, b, train: m._features(b, train),
        )
        return model, variables, batch

    def test_loss_and_gradients(self, model_and_state):
        model, variables, batch = model_and_state
        (loss, tb), _ = model.apply(variables, batch, train=True,
                                    mutable=["batch_stats"])
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert "rpn_loss_dir" in tb

        def loss_fn(params):
            (l, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"],
            )
            return l

        grads = jax.grad(loss_fn)(variables["params"])
        assert all(
            np.all(np.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
        )

    def test_predict_masked_output(self, model_and_state):
        model, variables, batch = model_and_state
        boxes, scores, labels, keep = model.apply(
            variables, batch, method=lambda m, b: m.predict(b)
        )
        assert boxes.shape[0] == batch.points.shape[0]
        assert boxes.shape[2] == 7
        k = np.asarray(keep)
        assert np.all(np.asarray(scores)[~k] == 0)

    def test_perfect_anchor_gets_positive_label(self):
        """A gt box exactly on an anchor must be a positive with ~zero target."""
        model = build_network(pp_model_cfg(), CLASSES, tiny_grid())
        batch = make_batch(np.random.RandomState(0), b=1, m=4)
        anchors = model._per_class_anchors if hasattr(model, "_per_class_anchors") else None
        # place a Car gt exactly on a Car anchor location
        from dfu3d_tpu.models.anchor_head import generate_anchors as gen

        cfgs = pp_model_cfg().DENSE_HEAD.ANCHOR_GENERATOR_CONFIG
        a, _ = gen(
            [dict(c) for c in cfgs], tiny_grid().grid_size,
            tiny_grid().point_cloud_range,
        )
        car_anchor = a[0][0, 16, 8, 0, 0]  # (7,)
        gt = np.zeros((1, 4, 8), np.float32)
        gt[0, 0, :7] = car_anchor
        gt[0, 0, 7] = 1  # Car
        gt_valid = np.zeros((1, 4), bool)
        gt_valid[0, 0] = True
        targets = jax.jit(
            lambda g, v: model.bind(
                model.init(
                    {"params": jax.random.PRNGKey(0)}, batch, train=False,
                    method=lambda m, b, train: m._features(b, train),
                )
            ).assign_targets(g, v)
        )(jnp.asarray(gt), jnp.asarray(gt_valid))
        labels = np.asarray(targets.box_cls_labels)[0]
        assert (labels == 1).sum() >= 1  # at least the exact-match anchor
        assert (labels == 0).sum() > 0   # plenty of background
        pos = labels == 1
        tgt = np.asarray(targets.box_reg_targets)[0][pos]
        # the exactly-matching anchor has a ~zero residual target
        assert np.min(np.abs(tgt).sum(axis=1)) < 1e-3


def second_model_cfg():
    cfg = pp_model_cfg()
    cfg["NAME"] = "SECONDNet"
    cfg["VFE"] = {"NAME": "MeanVFE"}
    cfg["BACKBONE_3D"] = {"NAME": "VoxelBackBone8x"}
    cfg["MAP_TO_BEV"] = {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256}
    cfg["BACKBONE_2D"] = {
        "NAME": "BaseBEVBackbone",
        "LAYER_NUMS": [2, 2],
        "LAYER_STRIDES": [1, 2],
        "NUM_FILTERS": [32, 64],
        "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [32, 32],
    }
    # anchors live on the stride-8 feature map
    for c in cfg["DENSE_HEAD"]["ANCHOR_GENERATOR_CONFIG"]:
        c["feature_map_stride"] = 8
    return cfg


def second_grid():
    # 3D voxel grid with real z resolution (nz = 16)
    return VoxelGrid.create([0, -6.4, -3, 6.4, 6.4, 1], [0.2, 0.2, 0.25])


class TestSECOND:
    def test_loss_gradients_predict(self):
        model = build_network(second_model_cfg(), CLASSES, second_grid())
        batch = make_batch(np.random.RandomState(9), b=2, n=512)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, train=False,
            method=lambda m, b, train: m._features(b, train),
        )
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
        # sparse backbone kernels actually receive gradient
        total = sum(float(np.abs(g).sum()) for g in leaves)
        assert total > 0

        boxes, scores, labels, keep = model.apply(
            variables, batch, method=lambda m, b: m.predict(b)
        )
        assert boxes.shape[-1] == 7
        assert np.all(np.isfinite(np.asarray(boxes)))


class TestSparseOps:
    def test_submanifold_neighbors(self):
        from dfu3d_tpu.core.voxel.sparse_ops import (
            SparseGrid, build_lookup, find_neighbors, kernel_offsets,
        )

        grid = SparseGrid(8, 8, 4)
        coords = np.array(
            [[1, 1, 1], [2, 1, 1], [5, 5, 3], [0, 0, 0]], np.int32
        )
        coords = np.pad(coords, ((0, 4), (0, 0)))
        valid = np.array([True] * 4 + [False] * 4)
        sorted_lin, order = build_lookup(grid, jnp.asarray(coords), jnp.asarray(valid))
        offsets = kernel_offsets(3, 3, 3)
        nbr = np.asarray(
            find_neighbors(grid, jnp.asarray(coords), jnp.asarray(valid),
                           sorted_lin, order, offsets)
        )
        v = len(coords)
        center_k = 13  # offset (0,0,0)
        # each voxel finds itself at the center offset
        for i in range(4):
            assert nbr[i, center_k] == i
        # (1,1,1) finds (2,1,1) at offset (+1,0,0)
        kx = [tuple(o) for o in offsets].index((1, 0, 0))
        assert nbr[0, kx] == 1
        # isolated voxel has only itself
        assert (np.asarray(nbr[2]) != v).sum() == 1
        # invalid queries resolve to the sentinel everywhere
        assert (nbr[4:] == v).all()

    def test_downsample_unique_parents(self):
        from dfu3d_tpu.core.voxel.sparse_ops import SparseGrid, downsample_coords

        grid_down = SparseGrid(4, 4, 2)
        coords = np.array(
            [[0, 0, 0], [1, 1, 1], [2, 2, 2], [3, 3, 3], [7, 7, 3]], np.int32
        )
        coords = np.pad(coords, ((0, 3), (0, 0)))
        valid = np.array([True] * 5 + [False] * 3)
        out_c, out_v, slot = downsample_coords(
            grid_down, jnp.asarray(coords), jnp.asarray(valid), 8
        )
        out_c, out_v = np.asarray(out_c), np.asarray(out_v)
        got = {tuple(c) for c, v in zip(out_c, out_v) if v}
        # parents: (0,0,0)x2, (1,1,1)x2, (3,3,1)
        assert got == {(0, 0, 0), (1, 1, 1), (3, 3, 1)}


class TestSECONDIoU:
    def test_iou_head_loss_and_iou_scored_predict(self):
        # reference second_iou.yaml ROI_HEAD (SECONDHead) at test scale
        cfg = second_model_cfg()
        cfg["NAME"] = "SECONDNetIoU"
        cfg["ROI_HEAD"] = {
            "NAME": "SECONDHead", "CLASS_AGNOSTIC": True,
            "SHARED_FC": [32, 32], "IOU_FC": [16], "DP_RATIO": 0.3,
            "NMS_CONFIG": {
                "TRAIN": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 32,
                          "NMS_THRESH": 0.8},
                "TEST": {"NMS_PRE_MAXSIZE": 128, "NMS_POST_MAXSIZE": 8,
                         "NMS_THRESH": 0.7},
            },
            "ROI_GRID_POOL": {"GRID_SIZE": 7, "DOWNSAMPLE_RATIO": 8},
            "TARGET_CONFIG": {
                "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
                "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
                "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
                "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
                "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
            },
            "LOSS_CONFIG": {"IOU_LOSS": "BinaryCrossEntropy",
                            "LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0}},
        }
        model = build_network(cfg, CLASSES, second_grid())
        batch = make_batch(np.random.RandomState(2), b=2, n=512)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=False)
        (loss, tb), _ = model.apply(variables, batch, train=True,
                                    mutable=["batch_stats"])
        assert "iou_loss" in tb and np.isfinite(float(tb["iou_loss"]))

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
        assert np.all(np.isfinite(np.asarray(scores)))
        assert np.all((np.asarray(scores) >= 0) & (np.asarray(scores) <= 1))

    def test_bev_roi_align_axis_aligned(self):
        from dfu3d_tpu.models.second_iou import bev_roi_align

        # a 1-channel ramp feature map: f[y, x] = x + 10*y; an axis-aligned
        # roi samples the lattice exactly (bilinear of a linear field)
        h = w = 16
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        feats = (xx + 10.0 * yy).astype(np.float32)[..., None]
        pcr = np.zeros(3, np.float32)
        vs = np.ones(3, np.float32)
        # world box centered at (8, 8), dx=4, dy=8, no rotation, stride 1
        roi = np.array([[8.0, 8.0, 0.0, 4.0, 8.0, 1.0, 0.0]], np.float32)
        g = 3
        out = np.asarray(bev_roi_align(
            jnp.asarray(feats), jnp.asarray(roi), g, jnp.asarray(pcr),
            jnp.asarray(vs), 1.0,
        ))[0, ..., 0]
        # px = 8 + 2u ∈ {6, 8, 10}; py = 8 + 4v ∈ {4, 8, 12}
        want = np.array([[px + 10.0 * py for px in (6, 8, 10)]
                         for py in (4, 8, 12)], np.float32)
        np.testing.assert_allclose(out, want, rtol=1e-5)
