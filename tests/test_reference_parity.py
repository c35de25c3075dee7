"""Logits-level parity against the REFERENCE'S OWN torch modules.

Unlike test_torch_convert.py (which checks the converter against locally
rebuilt torch mirrors), this file imports the reference tree itself from
/root/reference — DynamicPillarVFE (dynamic_pillar_vfe.py:49),
PointPillarScatter (pointpillar_scatter.py:5), BaseBEVBackbone
(base_bev_backbone.py:6) and CenterHead (center_head.py:49) — random-inits
them with the flagship config (centerpoint_nuscenes2kitti.yaml), converts
their state_dict through train/torch_convert, and asserts the full forward
path (points → pillar BEV → 2D backbone → all 6 CenterHead towers) produces
equal logits from our JAX model. With no datasets in this container this is
the strongest available proxy for the AP-within-0.5 baseline target: any
box-AP difference on converted released checkpoints must then come from the
decode/NMS/eval stages, each of which has its own oracle or golden test.

The reverse direction (our checkpoint → reference eval) follows from the
same mapping: every flagship parameter is covered bidirectionally
(TestFlagshipMappingCoverage) and the transforms are invertible layout
permutations.
"""
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not Path("/root/reference/pcdet").is_dir():  # pragma: no cover
    pytest.skip("reference tree not present", allow_module_level=True)

import jax
import jax.numpy as jnp

from reference_stubs import EDict, install_reference_stubs, no_cuda

from dfu3d_tpu.train import torch_convert as tc


@pytest.fixture(scope="module")
def ref_modules():
    install_reference_stubs()
    from pcdet.models.backbones_2d.base_bev_backbone import BaseBEVBackbone
    from pcdet.models.backbones_2d.map_to_bev.pointpillar_scatter import (
        PointPillarScatter,
    )
    from pcdet.models.backbones_3d.vfe.dynamic_pillar_vfe import (
        DynamicPillarVFE,
    )
    from pcdet.models.dense_heads.center_head import CenterHead

    return dict(
        DynamicPillarVFE=DynamicPillarVFE,
        PointPillarScatter=PointPillarScatter,
        BaseBEVBackbone=BaseBEVBackbone,
        CenterHead=CenterHead,
    )


CLASS_NAMES = [
    "Car", "Truck", "Construction_vehicle", "Bus", "Trailer",
    "Barrier", "Motorcycle", "Bicycle", "Pedestrian", "Traffic_cone",
]
CLASS_NAMES_EACH_HEAD = [
    ["Car"],
    ["Truck", "Construction_vehicle"],
    ["Bus", "Trailer"],
    ["Barrier"],
    ["Motorcycle", "Bicycle"],
    ["Pedestrian", "Traffic_cone"],
]
# tiny flagship geometry (__graft_entry__._flagship(tiny=True))
PCR = [0.0, -12.8, -5.0, 12.8, 12.8, 3.0]
VOXEL = [0.2, 0.2, 8.0]
GRID = [64, 128, 1]  # nx, ny, nz (x: 0→12.8 / 0.2 = 64; y: ±12.8 / 0.2 = 128)


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.weight.copy_(torch.randn_like(m.weight) * 0.2 + 1.0)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.5)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)


def _build_reference_flagship(ref_modules, pcr=None, voxel=None, grid=None):
    """The reference's actual flagship module stack, randomly initialised,
    with the state-dict key prefixes the converter expects (the prefixes the
    reference's Detector3DTemplate topology produces)."""
    pcr = PCR if pcr is None else pcr
    voxel = VOXEL if voxel is None else voxel
    grid = GRID if grid is None else grid
    vfe_cfg = EDict(dict(
        USE_NORM=True, WITH_DISTANCE=False, USE_ABSLOTE_XYZ=True,
        NUM_FILTERS=[64, 64],
    ))
    bb_cfg = EDict(dict(
        LAYER_NUMS=[3, 5, 5], LAYER_STRIDES=[2, 2, 2],
        NUM_FILTERS=[64, 128, 256], UPSAMPLE_STRIDES=[0.5, 1, 2],
        NUM_UPSAMPLE_FILTERS=[128, 128, 128],
    ))
    dh_cfg = EDict(dict(
        CLASS_NAMES_EACH_HEAD=CLASS_NAMES_EACH_HEAD,
        SHARED_CONV_CHANNEL=64, USE_BIAS_BEFORE_NORM=True, NUM_HM_CONV=2,
        SEPARATE_HEAD_CFG=dict(
            HEAD_ORDER=["center", "center_z", "dim", "rot"],
            HEAD_DICT={
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            },
        ),
        TARGET_ASSIGNER_CONFIG=dict(FEATURE_MAP_STRIDE=4),
    ))

    torch.manual_seed(0)
    container = torch.nn.Module()
    with no_cuda():
        container.vfe = ref_modules["DynamicPillarVFE"](
            vfe_cfg, num_point_features=4, voxel_size=voxel,
            grid_size=np.array(grid), point_cloud_range=np.array(pcr),
        )
        container.map_to_bev = ref_modules["PointPillarScatter"](
            EDict(dict(NUM_BEV_FEATURES=64)), grid_size=grid,
        )
        container.backbone_2d = ref_modules["BaseBEVBackbone"](
            bb_cfg, input_channels=64,
        )
        container.dense_head = ref_modules["CenterHead"](
            dh_cfg, input_channels=384, num_class=len(CLASS_NAMES),
            class_names=CLASS_NAMES, grid_size=np.array(grid),
            point_cloud_range=np.array(pcr), voxel_size=voxel,
            predict_boxes_when_training=False,
        )
    _randomize_bn(container)
    container.eval()
    return container


def _ours_flagship():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _flagship, _synthetic_batch

    cfg, grid, model = _flagship(dtype=jnp.float32, tiny=True)
    batch = _synthetic_batch(2, 4096, 16, 12.0)
    return model, batch


def _torch_points(batch):
    b, n, c = batch.points.shape
    bidx = np.repeat(np.arange(b, dtype=np.float32), n)[:, None]
    return torch.tensor(
        np.concatenate([bidx, batch.points.reshape(b * n, c)], axis=1)
    )


class TestAnchorHeadParity:
    """Logits + decoded-box parity for the SECOND/PointPillar head family:
    the reference's own AnchorHeadSingle (anchor_head_single.py:10-74,
    anchor_head_template.generate_predicted_boxes:225-268) vs ours, through
    train/torch_convert.anchor_head_mapping. Covers the anchor grid, the
    residual box coder and the direction-bin correction in one assertion:
    any mismatch in anchor ordering, decode math, or conv layout breaks the
    decoded boxes."""

    PCR2 = [0.0, -12.8, -3.0, 12.8, 12.8, 1.0]
    GRID2 = [32, 32, 1]
    AGC = [
        dict(class_name="Car", anchor_sizes=[[3.9, 1.6, 1.56]],
             anchor_rotations=[0, 1.57], anchor_bottom_heights=[-1.78],
             align_center=False, feature_map_stride=8,
             matched_threshold=0.6, unmatched_threshold=0.45),
        dict(class_name="Pedestrian", anchor_sizes=[[0.8, 0.6, 1.73]],
             anchor_rotations=[0, 1.57], anchor_bottom_heights=[-0.6],
             align_center=False, feature_map_stride=8,
             matched_threshold=0.5, unmatched_threshold=0.35),
        dict(class_name="Cyclist", anchor_sizes=[[1.76, 0.6, 1.73]],
             anchor_rotations=[0, 1.57], anchor_bottom_heights=[-0.6],
             align_center=False, feature_map_stride=8,
             matched_threshold=0.5, unmatched_threshold=0.35),
    ]

    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        from pcdet.models.dense_heads.anchor_head_single import (
            AnchorHeadSingle as RefAnchorHeadSingle,
        )

        model_cfg = EDict(dict(
            ANCHOR_GENERATOR_CONFIG=[EDict(c) for c in self.AGC],
            TARGET_ASSIGNER_CONFIG=EDict(dict(
                NAME="AxisAlignedTargetAssigner", POS_FRACTION=-1.0,
                SAMPLE_SIZE=512, NORM_BY_NUM_EXAMPLES=False,
                MATCH_HEIGHT=False, BOX_CODER="ResidualCoder",
            )),
            LOSS_CONFIG=EDict(dict(LOSS_WEIGHTS={
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7,
            })),
            USE_DIRECTION_CLASSIFIER=True, DIR_OFFSET=0.78539,
            DIR_LIMIT_OFFSET=0.0, NUM_DIR_BINS=2,
        ))
        torch.manual_seed(1)
        container = torch.nn.Module()
        with no_cuda():
            container.dense_head = RefAnchorHeadSingle(
                model_cfg, input_channels=32, num_class=3,
                class_names=["Car", "Pedestrian", "Cyclist"],
                grid_size=np.array(self.GRID2),
                point_cloud_range=np.array(self.PCR2),
                predict_boxes_when_training=False,
            )
        with torch.no_grad():
            for p in container.parameters():
                p.normal_(0.0, 0.1)
        container.eval()

        feats = torch.randn(2, 32, 4, 4)  # (B, C, H=ny/8, W=nx/8)
        with torch.no_grad():
            bd = container.dense_head(
                {"spatial_features_2d": feats, "batch_size": 2}
            )
        return container, feats, bd

    def _ours(self, container, feats):
        from dfu3d_tpu.models.anchor_head import (
            AnchorHeadSingle, generate_anchors,
        )

        head = AnchorHeadSingle(num_class=3, num_anchors_per_location=6)
        x = jnp.asarray(feats.numpy().transpose(0, 2, 3, 1))
        variables = head.init({"params": jax.random.PRNGKey(0)}, x)
        state = {k: v.numpy() for k, v in container.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.anchor_head_mapping(ours_prefix=())
        )
        assert not report["missing_in_torch"], report["missing_in_torch"]
        assert not report["unmatched_ours"], report["unmatched_ours"]
        preds = head.apply(new_vars, x)
        anchors, _ = generate_anchors(self.AGC, self.GRID2, self.PCR2)
        anchors_flat = np.concatenate(
            [a.reshape(a.shape[0], a.shape[1], a.shape[2], -1, 7)
             for a in anchors], axis=3,
        ).reshape(-1, 7)
        return preds, anchors_flat

    def test_anchor_grid_equality(self, setup):
        """Our flattened anchor grid == the reference's
        cat(self.anchors, dim=-3).view(-1, 7)."""
        container, feats, _ = setup
        _, anchors_flat = self._ours(container, feats)
        ref_flat = (
            torch.cat(container.dense_head.anchors, dim=-3)
            .reshape(-1, 7).numpy()
        )
        np.testing.assert_allclose(anchors_flat, ref_flat, atol=1e-5)

    def test_logits_and_decoded_boxes_equality(self, setup):
        from dfu3d_tpu.models.anchor_head import decode_anchor_predictions

        container, feats, bd = setup
        preds, anchors_flat = self._ours(container, feats)
        rd = container.dense_head.forward_ret_dict
        for name in ("cls_preds", "box_preds", "dir_cls_preds"):
            np.testing.assert_allclose(
                np.asarray(preds[name]), rd[name].numpy(),
                rtol=1e-4, atol=1e-5, err_msg=name,
            )
        boxes, scores = decode_anchor_predictions(
            preds, jnp.asarray(anchors_flat), num_class=3
        )
        np.testing.assert_allclose(
            np.asarray(boxes), bd["batch_box_preds"].numpy(),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(scores),
            torch.sigmoid(bd["batch_cls_preds"]).numpy(),
            rtol=1e-4, atol=1e-5,
        )


class TestPointHeadBoxParity:
    """Logits + decoded-box parity for the PointRCNN stage-1 head: the
    reference's own PointHeadBox (point_head_box.py:13-115) and
    PointResidualCoder (box_coder_utils.py:144-222) vs ours, through
    train/torch_convert.point_head_box_mapping."""

    MEAN_SIZE = [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]

    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        from pcdet.models.dense_heads.point_head_box import (
            PointHeadBox as RefPointHeadBox,
        )

        model_cfg = EDict(dict(
            CLS_FC=[64, 64], REG_FC=[64, 64],
            CLASS_AGNOSTIC=False, USE_POINT_FEATURES_BEFORE_FUSION=False,
            TARGET_CONFIG=EDict(dict(
                GT_EXTRA_WIDTH=[0.2, 0.2, 0.2],
                BOX_CODER="PointResidualCoder",
                BOX_CODER_CONFIG=EDict(dict(
                    use_mean_size=True, mean_size=self.MEAN_SIZE,
                )),
            )),
            LOSS_CONFIG=EDict(dict(
                LOSS_REG="WeightedSmoothL1Loss",
                LOSS_WEIGHTS={"point_cls_weight": 1.0,
                              "point_box_weight": 1.0,
                              "code_weights": [1.0] * 8},
            )),
        ))
        torch.manual_seed(2)
        container = torch.nn.Module()
        with no_cuda():
            container.point_head = RefPointHeadBox(
                num_class=3, input_channels=32, model_cfg=model_cfg,
                predict_boxes_when_training=False,
            )
        with torch.no_grad():
            for p in container.parameters():
                p.normal_(0.0, 0.1)
        _randomize_bn(container)
        container.eval()

        n = 128
        coords = torch.cat(
            [torch.zeros(n, 1), torch.rand(n, 3) * 20.0 - 10.0], dim=1
        )
        feats = torch.randn(n, 32)
        with torch.no_grad():
            bd = container.point_head({
                "point_features": feats, "point_coords": coords,
                "batch_size": 1,
            })
        return container, feats, coords, bd

    def test_logits_and_decoded_boxes_equality(self, setup):
        from dfu3d_tpu.models.pointrcnn import PointHeadBox, point_decode

        container, feats, coords, bd = setup
        head = PointHeadBox(num_class=3, cls_fc=(64, 64), reg_fc=(64, 64))
        x = jnp.asarray(feats.numpy())[None]             # (1, N, C)
        valid = jnp.ones(x.shape[:2], bool)
        variables = head.init(
            {"params": jax.random.PRNGKey(0)}, x, valid, False
        )
        state = {k: v.numpy() for k, v in container.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.point_head_box_mapping(
                cls_fc=(64, 64), reg_fc=(64, 64), ours_prefix=())
        )
        assert not report["missing_in_torch"], report["missing_in_torch"]
        assert not report["unmatched_ours"], report["unmatched_ours"]
        cls_logits, box_codes = head.apply(new_vars, x, valid, False)

        rd = container.point_head.forward_ret_dict
        np.testing.assert_allclose(
            np.asarray(cls_logits[0]), rd["point_cls_preds"].numpy(),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(box_codes[0]), rd["point_box_preds"].numpy(),
            rtol=1e-4, atol=1e-5,
        )
        pred_classes = jnp.argmax(cls_logits[0], axis=-1) + 1
        boxes = point_decode(
            box_codes[0], jnp.asarray(coords.numpy()[:, 1:4]),
            pred_classes, self.MEAN_SIZE,
        )
        np.testing.assert_allclose(
            np.asarray(boxes), bd["batch_box_preds"].numpy(),
            rtol=1e-4, atol=1e-4,
        )


class TestTransFusionHeadParity:
    """Logits + decoded-box parity for the query-based TransFusion head: the
    reference's own TransFusionHead (transfusion_head.py:53-218, predict) and
    TransformerDecoderLayer/PositionEmbeddingLearned (transfusion_utils.py)
    vs ours, through train/torch_convert.transfusion_head_mapping. Covers
    the heatmap local-max NMS (incl. the nuScenes small-class kernel-1
    override), the (class, cell) top-Q query init, the packed-qkv
    nn.MultiheadAttention → flax per-projection conversion, the learned
    position embeddings (added to q/k/v including the cross-attn VALUE), the
    SeparateHead_Transfusion stacks and the sigmoid×query_heatmap×one_hot
    decode. Square 32×32 BEV so the reference's x-major bev_pos + flip
    equals our direct (x+0.5, y+0.5) layout (see module docstring)."""

    NUM_CLASS = 10
    HIDDEN = 64
    HEADS = 4
    Q = 200
    PCR3 = [-6.4, -6.4, -5.0, 6.4, 6.4, 3.0]
    VOXEL3 = [0.4, 0.4, 8.0]
    GRID3 = [32, 32, 1]

    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        from pcdet.models.dense_heads.transfusion_head import (
            TransFusionHead as RefTransFusionHead,
        )

        model_cfg = EDict(dict(
            USE_BIAS_BEFORE_NORM=False,
            NUM_PROPOSALS=self.Q, HIDDEN_CHANNEL=self.HIDDEN,
            NUM_HEADS=self.HEADS, NMS_KERNEL_SIZE=3, FFN_CHANNEL=128,
            DROPOUT=0.0, BN_MOMENTUM=0.1, ACTIVATION="relu",
            NUM_HM_CONV=2,
            SEPARATE_HEAD_CFG=EDict(dict(
                HEAD_ORDER=["center", "height", "dim", "rot", "vel"],
                HEAD_DICT={
                    "center": {"out_channels": 2, "num_conv": 2},
                    "height": {"out_channels": 1, "num_conv": 2},
                    "dim": {"out_channels": 3, "num_conv": 2},
                    "rot": {"out_channels": 2, "num_conv": 2},
                    "vel": {"out_channels": 2, "num_conv": 2},
                },
            )),
            TARGET_ASSIGNER_CONFIG=EDict(dict(
                FEATURE_MAP_STRIDE=1, DATASET="nuScenes",
                GAUSSIAN_OVERLAP=0.1, MIN_RADIUS=2,
                HUNGARIAN_ASSIGNER=dict(
                    cls_cost={"gamma": 2.0, "alpha": 0.25, "weight": 0.15},
                    reg_cost={"weight": 0.25},
                    iou_cost={"weight": 0.25},
                ),
            )),
            LOSS_CONFIG=EDict(dict(
                LOSS_WEIGHTS={"cls_weight": 1.0, "bbox_weight": 0.25,
                              "hm_weight": 1.0, "code_weights": [1.0] * 8},
                LOSS_CLS=EDict(dict(use_sigmoid=True, gamma=2.0, alpha=0.25)),
            )),
            POST_PROCESSING=EDict(dict(
                SCORE_THRESH=0.0,
                POST_CENTER_RANGE=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            )),
        ))
        torch.manual_seed(3)
        container = torch.nn.Module()
        with no_cuda():
            container.dense_head = RefTransFusionHead(
                model_cfg, input_channels=96, num_class=self.NUM_CLASS,
                class_names=CLASS_NAMES,
                grid_size=np.array(self.GRID3),
                point_cloud_range=np.array(self.PCR3),
                voxel_size=self.VOXEL3,
                predict_boxes_when_training=False,
            )
        with torch.no_grad():
            for p in container.parameters():
                p.normal_(0.0, 0.05)
        _randomize_bn(container)
        container.eval()

        feats = torch.randn(2, 96, 32, 32)
        with torch.no_grad(), no_cuda():
            res = container.dense_head.predict(feats)
            # get_bboxes up to (but excluding) the post-center-range filter
            score = torch.sigmoid(res["heatmap"])
            one_hot = torch.nn.functional.one_hot(
                container.dense_head.query_labels,
                num_classes=self.NUM_CLASS,
            ).permute(0, 2, 1)
            score = score * res["query_heatmap_score"] * one_hot
            ref_dec = container.dense_head.decode_bbox(
                score, res["rot"].clone(), res["dim"].clone(),
                res["center"].clone(), res["height"].clone(),
                res["vel"].clone(),
            )
            # reconstruct the cells predict() selected (it only stores the
            # class labels) by replaying its query init on dense_heatmap
            hm = torch.sigmoid(res["dense_heatmap"].detach())
            local_max = torch.zeros_like(hm)
            local_max[:, :, 1:-1, 1:-1] = torch.nn.functional.max_pool2d(
                hm, 3, stride=1, padding=0)
            local_max[:, 8] = hm[:, 8]
            local_max[:, 9] = hm[:, 9]
            hm = hm * (hm == local_max)
            top = hm.view(2, -1).argsort(dim=-1, descending=True)[:, :self.Q]
            ref_cells = (top % (hm.shape[2] * hm.shape[3])).numpy()
        return container, feats, res, ref_dec, ref_cells

    def _ours(self, container, feats):
        from dfu3d_tpu.models.transfusion_head import TransFusionHead

        head = TransFusionHead(
            num_class=self.NUM_CLASS, num_proposals=self.Q,
            hidden=self.HIDDEN, num_heads=self.HEADS, ffn_channel=128,
            use_vel=True,
            point_cloud_range=self.PCR3, voxel_size=self.VOXEL3,
            feature_map_stride=1,
        )
        x = jnp.asarray(feats.numpy().transpose(0, 2, 3, 1))
        variables = head.init({"params": jax.random.PRNGKey(0)}, x, False)
        state = {k: v.numpy() for k, v in container.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.transfusion_head_mapping(
                num_heads=self.HEADS, use_vel=True, ours_prefix=())
        )
        assert not report["missing_in_torch"], report["missing_in_torch"]
        assert not report["unmatched_ours"], report["unmatched_ours"]
        preds = head.apply(new_vars, x, False)
        return head, preds

    def _perm(self, container, preds, ref_cells):
        """Ours-order → ref-order query permutation per batch row.

        Both sides pick the same top-Q (class, cell) set; near-tied heatmap
        values (fp32 diffs ~1e-7) can swap adjacent RANKS between torch
        argsort and jax top_k. Attention is permutation-equivariant over the
        query set, so aligning by query identity is an exact comparison."""
        hw = self.GRID3[0] * self.GRID3[1]
        # reconstruct ours cell from q_pos = (x+0.5, y+0.5); cell = y·W + x
        pos = np.asarray(preds["q_pos"])
        cell = (pos[..., 1] - 0.5).astype(np.int64) * self.GRID3[0] + (
            pos[..., 0] - 0.5).astype(np.int64)
        ours_key = np.asarray(preds["q_cls"]).astype(np.int64) * hw + cell
        ref_key = (
            container.dense_head.query_labels.numpy().astype(np.int64) * hw
            + ref_cells
        )
        perms = []
        for b in range(ours_key.shape[0]):
            np.testing.assert_array_equal(
                np.sort(ours_key[b]), np.sort(ref_key[b]),
                err_msg="top-Q query sets differ",
            )
            o = {k: i for i, k in enumerate(ours_key[b])}
            perms.append(np.array([o[k] for k in ref_key[b]]))
        return np.stack(perms)  # ours[perm] == ref order

    @staticmethod
    def _take(arr, perm):
        return np.stack([np.asarray(arr)[b][perm[b]]
                         for b in range(perm.shape[0])])

    def test_logits_equality(self, setup):
        container, feats, res, _, ref_cells = setup
        _, preds = self._ours(container, feats)
        np.testing.assert_allclose(
            np.asarray(preds["dense_heatmap"]),
            res["dense_heatmap"].numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5,
        )
        perm = self._perm(container, preds, ref_cells)
        np.testing.assert_array_equal(
            self._take(preds["q_cls"], perm),
            container.dense_head.query_labels.numpy(),
        )
        for name in ("center", "height", "dim", "rot", "vel", "heatmap",
                     "query_heatmap_score"):
            np.testing.assert_allclose(
                self._take(preds[name], perm),
                res[name].numpy().transpose(0, 2, 1),
                rtol=1e-4, atol=2e-5, err_msg=name,
            )

    def test_decoded_boxes_equality(self, setup):
        container, feats, _, ref_dec, ref_cells = setup
        head, preds = self._ours(container, feats)
        perm = self._perm(container, preds, ref_cells)
        boxes, scores, labels = head.decode(preds)
        ref_boxes = np.stack([d["pred_boxes"].numpy() for d in ref_dec])
        ref_scores = np.stack([d["pred_scores"].numpy() for d in ref_dec])
        ref_labels = np.stack([d["pred_labels"].numpy() for d in ref_dec])
        np.testing.assert_allclose(
            self._take(boxes, perm), ref_boxes, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            self._take(scores, perm), ref_scores, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(
            self._take(labels, perm), ref_labels + 1)


class TestSwinParity:
    """Feature-map parity for the camera backbone: the reference's own
    SwinTransformer (backbones_image/swin.py — the mmdet port, pure torch)
    vs models/image/swin.py through train/torch_convert.swin_mapping.
    Covers the relative-position-bias indexing, cyclic-shift attention
    masks, patch merging (input-ordering permutation _patchmerge_perm) and
    per-stage output norms on a 2-stage tiny config."""

    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        from pcdet.models.backbones_image.swin import (
            SwinTransformer as RefSwin,
        )

        cfg = EDict(dict(
            EMBED_DIMS=8, DEPTHS=[2, 2], NUM_HEADS=[2, 2], WINDOW_SIZE=4,
            PATCH_SIZE=4, MLP_RATIO=4, DROP_RATE=0.0, ATTN_DROP_RATE=0.0,
            DROP_PATH_RATE=0.0, OUT_INDICES=[0, 1], PATCH_NORM=True,
        ))
        torch.manual_seed(4)
        container = torch.nn.Module()
        with no_cuda():
            container.image_backbone = RefSwin(cfg)
        with torch.no_grad():
            for p in container.parameters():
                p.normal_(0.0, 0.05)
        container.eval()
        imgs = torch.randn(1, 1, 3, 64, 64)
        with torch.no_grad():
            bd = container.image_backbone({"camera_imgs": imgs})
        return container, imgs, bd["image_features"]

    def test_stage_features_equality(self, setup):
        from dfu3d_tpu.models.image.swin import SwinTransformer

        container, imgs, ref_outs = setup
        model = SwinTransformer(embed_dim=8, depths=(2, 2), num_heads=(2, 2),
                                window_size=4, patch_size=4,
                                out_indices=(0, 1))
        x = jnp.asarray(imgs.numpy()[0].transpose(0, 2, 3, 1))  # (N, H, W, 3)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        state = {k: v.numpy() for k, v in container.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.swin_mapping(
                depths=(2, 2), out_indices=(0, 1),
                prefix="image_backbone", ours_prefix=())
        )
        assert not report["missing_in_torch"], report["missing_in_torch"]
        assert not report["unmatched_ours"], report["unmatched_ours"]
        outs = model.apply(new_vars, x)
        assert len(outs) == len(ref_outs) == 2
        for i, (ours, ref) in enumerate(zip(outs, ref_outs)):
            np.testing.assert_allclose(
                np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                rtol=1e-4, atol=1e-5, err_msg=f"stage {i}",
            )


class TestLSSFPNParity:
    """Feature parity for the camera neck: the reference's own
    GeneralizedLSSFPN (img_neck/generalized_lss.py — raw coarsest level
    concatenated at the top, processed levels cascaded below, n−1 outputs)
    vs models/image/fpn.py through train/torch_convert.lss_fpn_mapping."""

    def test_fpn_outputs_equality(self, ref_modules):
        from pcdet.models.backbones_image.img_neck.generalized_lss import (
            GeneralizedLSSFPN as RefFPN,
        )

        from dfu3d_tpu.models.image.fpn import GeneralizedLSSFPN

        cfg = EDict(dict(IN_CHANNELS=[8, 16, 32], OUT_CHANNELS=16,
                         NUM_OUTS=2, START_LEVEL=0, END_LEVEL=-1))
        torch.manual_seed(5)
        container = torch.nn.Module()
        with no_cuda():
            container.image_neck = RefFPN(cfg)
        with torch.no_grad():
            for p in container.parameters():
                p.normal_(0.0, 0.1)
        _randomize_bn(container)
        container.eval()

        feats_t = [torch.randn(2, c, s, s) for c, s in
                   zip([8, 16, 32], [16, 8, 4])]
        with torch.no_grad():
            bd = container.image_neck({"image_features": list(feats_t)})
        ref_outs = bd["image_fpn"]

        model = GeneralizedLSSFPN(in_channels=(8, 16, 32), out_channels=16,
                                  num_outs=2)
        feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1))
                 for f in feats_t]
        variables = model.init({"params": jax.random.PRNGKey(0)}, feats)
        state = {k: v.numpy() for k, v in container.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.lss_fpn_mapping(num_levels=3,
                                                 ours_prefix=())
        )
        assert not report["missing_in_torch"], report["missing_in_torch"]
        assert not report["unmatched_ours"], report["unmatched_ours"]
        outs = model.apply(new_vars, feats)
        assert len(outs) == len(ref_outs) == 2
        for i, (ours, ref) in enumerate(zip(outs, ref_outs)):
            np.testing.assert_allclose(
                np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
                rtol=1e-4, atol=1e-5, err_msg=f"level {i}",
            )


class TestBEVBackboneVariantsParity:
    """Feature parity for the 2D backbone variants against the reference's
    own modules: BaseBEVResBackbone (BasicBlock residuals with forced
    conv+BN shortcuts on level-leading blocks) and BaseBEVBackboneV1 (the
    PillarNet/DSVT neck whose blocks[0] refines the deblock CONCAT,
    base_bev_backbone.py:182-204), through bev_res_backbone_mapping /
    bev_v1_backbone_mapping."""

    def test_res_backbone_equality(self, ref_modules):
        from pcdet.models.backbones_2d.base_bev_backbone import (
            BaseBEVResBackbone as RefRes,
        )

        from dfu3d_tpu.models.backbone_2d import BaseBEVResBackbone

        cfg = EDict(dict(LAYER_NUMS=[1, 2], LAYER_STRIDES=[1, 2],
                         NUM_FILTERS=[16, 32], UPSAMPLE_STRIDES=[1, 2],
                         NUM_UPSAMPLE_FILTERS=[16, 16]))
        torch.manual_seed(6)
        container = torch.nn.Module()
        with no_cuda():
            container.backbone_2d = RefRes(cfg, input_channels=16)
        with torch.no_grad():
            for p in container.parameters():
                p.normal_(0.0, 0.1)
        _randomize_bn(container)
        container.eval()
        feats = torch.randn(2, 16, 16, 16)
        with torch.no_grad():
            bd = container.backbone_2d(
                {"spatial_features": feats, "batch_size": 2})

        model = BaseBEVResBackbone(
            layer_nums=(1, 2), layer_strides=(1, 2), num_filters=(16, 32),
            upsample_strides=(1, 2), num_upsample_filters=(16, 16))
        x = jnp.asarray(feats.numpy().transpose(0, 2, 3, 1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
        state = {k: v.numpy() for k, v in container.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.bev_res_backbone_mapping(
                layer_nums=(1, 2), ours_prefix=())
        )
        assert not report["missing_in_torch"], report["missing_in_torch"]
        assert not report["unmatched_ours"], report["unmatched_ours"]
        out = model.apply(new_vars, x, False)
        np.testing.assert_allclose(
            np.asarray(out),
            bd["spatial_features_2d"].numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )

    def test_v1_backbone_equality(self, ref_modules):
        from pcdet.models.backbones_2d.base_bev_backbone import (
            BaseBEVBackboneV1 as RefV1,
        )

        from dfu3d_tpu.models.backbone_2d import BaseBEVBackboneV1

        cfg = EDict(dict(LAYER_NUMS=[5, 5], NUM_FILTERS=[16, 8],
                         UPSAMPLE_STRIDES=[1, 2],
                         NUM_UPSAMPLE_FILTERS=[8, 8]))
        torch.manual_seed(7)
        container = torch.nn.Module()
        with no_cuda():
            container.backbone_2d = RefV1(cfg)
        with torch.no_grad():
            for p in container.parameters():
                p.normal_(0.0, 0.1)
        _randomize_bn(container)
        container.eval()
        x4 = torch.randn(2, 16, 16, 16)
        x5 = torch.randn(2, 8, 8, 8)
        with torch.no_grad():
            bd = container.backbone_2d({"multi_scale_2d_features": {
                "x_conv4": x4, "x_conv5": x5}})

        model = BaseBEVBackboneV1(
            layer_nums=(5, 5), num_filters=(16, 8), upsample_strides=(1, 2),
            num_upsample_filters=(8, 8))
        feats = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
                 for t in (x4, x5)]
        variables = model.init({"params": jax.random.PRNGKey(0)}, feats,
                               False)
        state = {k: v.numpy() for k, v in container.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.bev_v1_backbone_mapping(
                layer_nums=(5, 5), ours_prefix=())
        )
        assert not report["missing_in_torch"], report["missing_in_torch"]
        assert not report["unmatched_ours"], report["unmatched_ours"]
        out = model.apply(new_vars, feats, False)
        np.testing.assert_allclose(
            np.asarray(out),
            bd["spatial_features_2d"].numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )


class TestENetParity:
    """Depth-map parity for the pseudo-label factory's depth-completion
    backbone: the reference's own PENet ENet (tools/PENet/model.py:3-234,
    pure torch) vs models/penet_ref.ENetRef through
    train/torch_convert.enet_mapping. Covers the geo-conditioned
    BasicBlockGeo concat orders ((x, g1) then (g2, out)), the sparse
    nearest-depth downsampling pyramid, the hardcoded 352×1216 geometry
    unprojection, both encoder/decoder ladders and the confidence-softmax
    fusion."""

    @pytest.fixture(scope="class")
    def setup(self):
        import sys
        import types

        sys.path.insert(0, "/root/reference/tools/PENet")
        from model import ENet as RefENet

        args = types.SimpleNamespace(
            convolutional_layer_encoding="xyz", network_model="e",
            dilation_rate=1,
        )
        torch.manual_seed(8)
        with no_cuda():
            ref = RefENet(args)
        with torch.no_grad():
            for p in ref.parameters():
                p.normal_(0.0, 0.02)
        _randomize_bn(ref)
        ref.eval()

        rng = np.random.RandomState(9)
        rgb = rng.rand(1, 3, 64, 64).astype(np.float32)
        d = rng.rand(1, 1, 64, 64).astype(np.float32) * 20.0
        d[rng.rand(*d.shape) > 0.06] = 0.0  # sparse lidar projection
        u, v = np.meshgrid(np.linspace(-1, 1, 64), np.linspace(-1, 1, 64))
        position = np.stack([u, v])[None].astype(np.float32)
        K = np.array([[[721.0, 0, 609.0], [0, 721.0, 172.0],
                       [0, 0, 1.0]]], np.float32)
        with torch.no_grad(), no_cuda():
            rgb_depth, d_depth, output = ref({
                "rgb": torch.tensor(rgb), "d": torch.tensor(d),
                "position": torch.tensor(position), "K": torch.tensor(K),
            })
        return ref, (rgb, d, position, K), (rgb_depth, d_depth, output)

    def test_depth_outputs_equality(self, setup):
        from dfu3d_tpu.models.penet_ref import ENetRef

        ref, (rgb, d, position, K), ref_out = setup
        model = ENetRef()
        args = (
            jnp.asarray(rgb.transpose(0, 2, 3, 1)),
            jnp.asarray(d.transpose(0, 2, 3, 1)),
            jnp.asarray(position.transpose(0, 2, 3, 1)),
            jnp.asarray(K),
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, *args)
        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.enet_mapping()
        )
        assert not report["missing_in_torch"], report["missing_in_torch"][:6]
        assert not report["unmatched_ours"], report["unmatched_ours"][:6]
        out = model.apply(new_vars, *args)
        for name, ref_t in zip(("rgb_depth", "d_depth", "output"), ref_out):
            np.testing.assert_allclose(
                np.asarray(out[name]),
                ref_t.numpy().transpose(0, 2, 3, 1),
                rtol=1e-3, atol=1e-4, err_msg=name,
            )


class TestReferenceLogitsParity:
    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        ref = _build_reference_flagship(ref_modules)
        model, batch = _ours_flagship()
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, train=False,
            method=lambda m, b, train: m._features(b, train),
        )
        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.centerpoint_pillar_mapping()
        )
        assert not report["missing_in_torch"], report["missing_in_torch"][:6]
        converted = {
            "params": new_vars["params"],
            "batch_stats": new_vars["batch_stats"],
        }
        # run the reference's own forward on the same points
        bd = {"points": _torch_points(batch), "batch_size": 2}
        with torch.no_grad():
            bd = ref.vfe(bd)
            bd = ref.map_to_bev(bd)
            bd = ref.backbone_2d(bd)
            x = ref.dense_head.shared_conv(bd["spatial_features_2d"])
            ref_preds = [
                {k: v.numpy().transpose(0, 2, 3, 1) for k, v in h(x).items()}
                for h in ref.dense_head.heads_list
            ]
        return ref, model, batch, converted, bd, ref_preds

    def test_vfe_dense_bev_equality(self, setup):
        """Reference DynamicPillarVFE+PointPillarScatter vs our fused
        DynPillarVFE on identical raw points (both voxelize internally)."""
        ref, model, batch, converted, bd, _ = setup
        ours = model.apply(
            converted, batch.points, batch.points_valid,
            method=lambda m, p, v: m.vfe(p, v, False),
        )
        want = bd["spatial_features"].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-4, atol=1e-4)

    def test_full_path_logits_equality(self, setup):
        """points → BEV → BaseBEVBackbone → all 6 CenterHead towers: every
        branch (hm/center/center_z/dim/rot) equal within 1e-4."""
        ref, model, batch, converted, _, ref_preds = setup
        preds = model.apply(
            converted, batch, train=False,
            method=lambda m, b, train: m._features(b, train),
        )
        assert len(preds) == len(ref_preds) == 6
        for k, (ours_d, ref_d) in enumerate(zip(preds, ref_preds)):
            assert set(ours_d) == set(ref_d)
            for name in ref_d:
                np.testing.assert_allclose(
                    np.asarray(ours_d[name]), ref_d[name],
                    rtol=1e-4, atol=1e-4,
                    err_msg=f"head {k} branch {name}",
                )


class TestDynVoxelVFEParity:
    """Our DynVoxelVFE vs the reference's own DynamicVoxelVFE
    (dynamic_voxel_vfe.py:15-106) on identical raw points: both voxelize a
    3D grid internally and run the learned PFN stack; per-voxel outputs are
    matched by (b, ix, iy, iz) coordinate key (the two sides order their
    compacted voxel lists differently)."""

    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        install_reference_stubs()
        from pcdet.models.backbones_3d.vfe.dynamic_voxel_vfe import (
            DynamicVoxelVFE,
        )

        from dfu3d_tpu.core.voxel import VoxelGrid
        from dfu3d_tpu.models.vfe import DynVoxelVFE

        pcr = [0.0, -3.2, -2.0, 6.4, 3.2, 2.0]
        voxel = [0.4, 0.4, 0.5]
        grid3 = [16, 16, 8]

        torch.manual_seed(7)
        with no_cuda():
            ref = DynamicVoxelVFE(
                EDict(dict(USE_NORM=True, WITH_DISTANCE=False,
                           USE_ABSLOTE_XYZ=True, NUM_FILTERS=[32, 32])),
                num_point_features=4, voxel_size=voxel,
                grid_size=np.array(grid3), point_cloud_range=np.array(pcr),
            )
        _randomize_bn(ref)
        ref.eval()

        grid = VoxelGrid.create(pcr, voxel)
        ours = DynVoxelVFE(num_filters=(32, 32), grid=grid, max_voxels=512)

        rng = np.random.RandomState(3)
        b, n = 2, 400
        lo = np.array(pcr[:3]) + 0.05
        hi = np.array(pcr[3:]) - 0.05
        xyz = rng.rand(b, n, 3).astype(np.float32) * (hi - lo) + lo
        inten = rng.rand(b, n, 1).astype(np.float32)
        points = np.concatenate([xyz, inten], -1).astype(np.float32)
        valid = np.ones((b, n), bool)
        valid[:, 390:] = False

        variables = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(points), jnp.asarray(valid),
            False,
        )
        state = {f"vfe.{k}": v.numpy() for k, v in ref.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.pfn_mapping(2, ours_prefix=()))
        assert not report["missing_in_torch"], report["missing_in_torch"]
        return ref, ours, new_vars, points, valid

    def test_voxel_features_equal(self, setup):
        ref, ours, new_vars, points, valid = setup
        b, n, _ = points.shape
        # reference forward: flat (batch_idx, x, y, z, i) over valid points
        rows = []
        for bi in range(b):
            p = points[bi][valid[bi]]
            rows.append(np.concatenate(
                [np.full((len(p), 1), bi, np.float32), p], -1))
        flat = torch.from_numpy(np.concatenate(rows, 0))
        with torch.no_grad():
            bd = ref({"points": flat, "batch_size": b})
        ref_feats = bd["voxel_features"].numpy()
        ref_coords = bd["voxel_coords"].numpy()  # (M, 4) = (b, iz, iy, ix)

        feats, coords, vvalid = ours.apply(
            new_vars, jnp.asarray(points), jnp.asarray(valid), False)
        feats, coords, vvalid = map(np.asarray, (feats, coords, vvalid))

        ref_map = {
            (int(c[0]), int(c[3]), int(c[2]), int(c[1])): f
            for c, f in zip(ref_coords, ref_feats)
        }
        count = 0
        for bi in range(b):
            for v in range(coords.shape[1]):
                if not vvalid[bi, v]:
                    continue
                key = (bi, int(coords[bi, v, 0]), int(coords[bi, v, 1]),
                       int(coords[bi, v, 2]))
                assert key in ref_map, key
                np.testing.assert_allclose(
                    feats[bi, v], ref_map[key], rtol=1e-4, atol=1e-4,
                    err_msg=str(key))
                count += 1
        assert count == len(ref_map), (count, len(ref_map))


class TestDSVTParity:
    """Our DSVTBackbone vs the reference's own DSVT blocks (dsvt.py:10-278)
    on a fully-occupied grid where every window's voxel count is an exact
    multiple of set_size — then the reference's Eq.3 balanced set partition
    degenerates to contiguous rank chunks (provably equal to ours) with no
    padding or duplication, and the whole 2-block forward (y/x rotated-set
    attention, hybrid shifted windows, pos-embed MLPs incl. the reference's
    layer-indexed pos geometry, all residual norms) must match numerically.

    The set partition itself is rebuilt in numpy from the reference's sort
    keys (get_set_single_shift, dsvt.py:514-570) because its inner-index op
    is CUDA-only; with unique keys the argsort grouping is the contract."""

    DIM, HEADS, BLOCKS, SS = 16, 2, 2, 4
    GRID2 = (8, 8)
    WIN = (4, 4)

    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        install_reference_stubs()
        from pcdet.models.backbones_3d.dsvt import DSVT

        from dfu3d_tpu.models.dsvt import DSVTBackbone

        nx, ny = self.GRID2
        cfg = EDict(dict(
            INPUT_LAYER=dict(
                sparse_shape=[nx, ny, 1], downsample_stride=[],
                d_model=[self.DIM], set_info=[[self.SS, self.BLOCKS]],
                window_shape=[[self.WIN[0], self.WIN[1], 1]],
                hybrid_factor=[2, 2, 1],
                shifts_list=[[[0, 0, 0],
                              [self.WIN[0] // 2, self.WIN[1] // 2, 0]]],
                normalize_pos=False,
            ),
            block_name=["DSVTBlock"], set_info=[[self.SS, self.BLOCKS]],
            d_model=[self.DIM], nhead=[self.HEADS], dim_feedforward=[32],
            dropout=0.0, activation="gelu", output_shape=[nx, ny],
            conv_out_channel=self.DIM,
        ))
        torch.manual_seed(11)
        with no_cuda():
            ref = DSVT(cfg)
        _randomize_bn(ref)
        ref.eval()

        ours = DSVTBackbone(
            dim=self.DIM, num_heads=self.HEADS, num_blocks=self.BLOCKS,
            window_shape=self.WIN, set_size=self.SS, max_sets=64,
            grid_size=self.GRID2, hybrid_factor=(2, 2), dim_ff=32,
        )
        return ref, ours

    def _ref_sets(self, ix, iy, wshape, shift):
        """Reference set partition (get_window_coors + get_set_single_shift)
        via numpy argsort over the unique (win, inner) keys."""
        wx, wy = wshape
        nx, ny = self.GRID2
        sx, sy = ix + shift[0], iy + shift[1]
        winx, winy = sx // wx, sy // wy
        n_win_y = -(-ny // wy) + 1
        win = winx * n_win_y + winy
        inx, iny = sx % wx, sy % wy
        key_y = win * (wx * wy) + iny * wx + inx
        key_x = win * (wx * wy) + inx * wy + iny
        sets_y = np.argsort(key_y).reshape(-1, self.SS)
        sets_x = np.argsort(key_x).reshape(-1, self.SS)
        return np.stack([sets_y, sets_x])

    def test_full_forward_equality(self, setup):
        ref, ours = setup
        nx, ny = self.GRID2
        iy, ix = np.mgrid[0:ny, 0:nx]
        ix, iy = ix.reshape(-1), iy.reshape(-1)
        n = nx * ny
        rng = np.random.RandomState(21)
        feats = rng.randn(n, self.DIM).astype(np.float32)

        wx, wy = self.WIN
        geoms = [((wx, wy), (0, 0)), ((2 * wx, 2 * wy), (wx // 2, wy // 2))]
        set_inds, set_masks, coors_in_win = [], [], []
        for wshape, shift in geoms:
            s = self._ref_sets(ix, iy, wshape, shift)
            set_inds.append(torch.from_numpy(s).long())
            set_masks.append(torch.zeros(s.shape, dtype=torch.bool))
            inz = np.zeros_like(ix)
            cw = np.stack([inz, (iy + shift[1]) % wshape[1],
                           (ix + shift[0]) % wshape[0]], axis=-1)
            coors_in_win.append(torch.from_numpy(cw).float())

        with torch.no_grad():
            out = torch.from_numpy(feats)
            for blk in range(self.BLOCKS):
                pos = [ref.input_layer.get_pos_embed(coors_in_win[i], 0, blk, i)
                       for i in range(2)]
                residual = out.clone()
                out = ref.stage_0[blk](out, set_inds, set_masks, pos,
                                       block_id=blk)
                out = ref.residual_norm_stage_0[blk](out + residual)
            want = out.numpy()

        coords = np.stack([ix, iy], -1)[None].astype(np.int32)
        variables = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(feats[None]),
            jnp.asarray(coords), jnp.ones((1, n), bool), False)
        state = {f"backbone_3d.{k}": v.numpy()
                 for k, v in ref.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state,
            tc.dsvt_mapping(num_blocks=self.BLOCKS, num_heads=self.HEADS,
                            ours_prefix=()))
        assert not report["missing_in_torch"], report["missing_in_torch"]
        got = ours.apply(new_vars, jnp.asarray(feats[None]),
                         jnp.asarray(coords), jnp.ones((1, n), bool), False)
        np.testing.assert_allclose(np.asarray(got)[0], want,
                                   rtol=2e-4, atol=2e-4)


class TestDSVTVoxelParity:
    """Multi-stage 3D DSVT vs the reference's own blocks + attention
    pooling (dsvt.py:10-330) on a fully-occupied 4×4×4 grid where every
    window (base and hybrid-shifted) holds an exact multiple of set_size —
    the balanced set partition then equals contiguous rank chunks with no
    padding/duplication. Stage 0 runs two blocks (base + shifted windows),
    the attention reduction pools z 4→1, stage 1 runs one block whose
    GLOBAL block id (2) selects the base window — pinning the reference's
    cross-stage block_id counter (dsvt.py:117-130). Output rows matched by
    pooled BEV coordinate."""

    DIM, HEADS, SS = 16, 2, 4
    GRID3 = (4, 4, 4)

    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        install_reference_stubs()
        from pcdet.models.backbones_3d.dsvt import DSVT

        from dfu3d_tpu.models.dsvt import DSVTVoxelBackbone

        nx, ny, nz = self.GRID3
        cfg = EDict(dict(
            INPUT_LAYER=dict(
                sparse_shape=[nx, ny, nz], downsample_stride=[[1, 1, 4]],
                d_model=[self.DIM, self.DIM],
                set_info=[[self.SS, 2], [self.SS, 1]],
                window_shape=[[2, 2, 4], [2, 2, 1]],
                hybrid_factor=[2, 2, 1],
                shifts_list=[[[0, 0, 0], [1, 1, 0]],
                             [[0, 0, 0], [1, 1, 0]]],
                normalize_pos=False,
            ),
            block_name=["DSVTBlock", "DSVTBlock"],
            set_info=[[self.SS, 2], [self.SS, 1]],
            d_model=[self.DIM, self.DIM], nhead=[self.HEADS, self.HEADS],
            dim_feedforward=[32, 32], dropout=0.0, activation="gelu",
            reduction_type="attention", output_shape=[nx, ny],
            conv_out_channel=self.DIM,
        ))
        torch.manual_seed(13)
        with no_cuda():
            ref = DSVT(cfg)
        _randomize_bn(ref)
        ref.eval()

        ours = DSVTVoxelBackbone(
            dim=self.DIM, num_heads=self.HEADS,
            set_info=((self.SS, 2), (self.SS, 1)),
            window_shape=((2, 2, 4), (2, 2, 1)),
            downsample_stride=((1, 1, 4),),
            sparse_shape=self.GRID3, hybrid_factor=(2, 2, 1),
            max_sets=64, dim_ff=32,
        )
        return ref, ours

    def _sets3d(self, ix, iy, iz, wshape, shift, grid):
        """Reference 3D set partition via numpy argsort (exact-multiple
        windows only): returns (2, nsets, SS) [y-major, x-major]."""
        wx, wy, wz = wshape
        nx, ny, nz = grid
        sx, sy, sz = ix + shift[0], iy + shift[1], iz + shift[2]
        n_wy = -(-ny // wy) + 1
        n_wz = -(-nz // wz) + 1
        win = ((sx // wx) * n_wy + sy // wy) * n_wz + sz // wz
        inx, iny, inz = sx % wx, sy % wy, sz % wz
        vol = wx * wy * wz
        key_y = win * vol + (iny * wx + inx) * wz + inz
        key_x = win * vol + (inx * wy + iny) * wz + inz
        return np.stack([np.argsort(key_y).reshape(-1, self.SS),
                         np.argsort(key_x).reshape(-1, self.SS)])

    def _coors_in_win(self, ix, iy, iz, wshape, shift):
        cw = np.stack([(iz + shift[2]) % wshape[2],
                       (iy + shift[1]) % wshape[1],
                       (ix + shift[0]) % wshape[0]], axis=-1)
        return torch.from_numpy(cw).float()

    def test_full_forward_equality(self, setup):
        ref, ours = setup
        nx, ny, nz = self.GRID3
        iz, iy, ix = np.mgrid[0:nz, 0:ny, 0:nx]
        ix, iy, iz = ix.reshape(-1), iy.reshape(-1), iz.reshape(-1)
        n = nx * ny * nz
        rng = np.random.RandomState(33)
        feats = rng.randn(n, self.DIM).astype(np.float32)

        # ---- reference forward, driven manually (the input layer's set op
        # is CUDA-only; everything else is pure torch) ----
        g0 = self.GRID3
        geoms0 = [((2, 2, 4), (0, 0, 0)), ((4, 4, 4), (1, 1, 0))]
        set_inds0 = [torch.from_numpy(
            self._sets3d(ix, iy, iz, w, s, g0)).long() for w, s in geoms0]
        masks0 = [torch.zeros(s.shape, dtype=torch.bool) for s in set_inds0]
        cw0 = [self._coors_in_win(ix, iy, iz, w, s) for w, s in geoms0]

        with torch.no_grad():
            out = torch.from_numpy(feats)
            for blk in range(2):
                pos = [ref.input_layer.get_pos_embed(cw0[i], 0, blk, i)
                       for i in range(2)]
                residual = out.clone()
                out = ref.stage_0[blk](out, set_inds0, masks0, pos,
                                       block_id=blk)
                out = ref.residual_norm_stage_0[blk](out + residual)

            # subm pooling (dsvt.py:131-149 + subm_pooling)
            coors_t = torch.from_numpy(np.stack(
                [np.zeros_like(ix), iz, iy, ix], -1)).long()
            vinfo = {"voxel_coors_stage0": coors_t,
                     "voxel_feats_stage0": torch.from_numpy(feats)}
            vinfo = ref.input_layer.subm_pooling(vinfo, 0)
            prepool = vinfo["pooling_preholder_feats_stage1"].clone()
            prepool[vinfo["pooling_mapping_index_stage1"],
                    vinfo["pooling_index_in_pool_stage1"]] = out
            np_pool, pv = prepool.shape[0], prepool.shape[1]
            prepool = prepool.view(np_pool, pv, -1).permute(0, 2, 1)
            kpm = torch.zeros((np_pool, pv), dtype=torch.bool)
            out = ref.stage_0_reduction(prepool, kpm)
            pool_coors = vinfo["voxel_coors_stage1"].numpy()  # (M, 4) bzyx

            # stage 1, one block with GLOBAL block_id 2 → base window
            px = pool_coors[:, 3]
            py = pool_coors[:, 2]
            pz = pool_coors[:, 1]
            g1 = (nx, ny, 1)
            geoms1 = [((2, 2, 1), (0, 0, 0)), ((4, 4, 1), (1, 1, 0))]
            set_inds1 = [torch.from_numpy(
                self._sets3d(px, py, pz, w, s, g1)).long()
                for w, s in geoms1]
            masks1 = [torch.zeros(s.shape, dtype=torch.bool)
                      for s in set_inds1]
            cw1 = [self._coors_in_win(px, py, pz, w, s) for w, s in geoms1]
            pos = [ref.input_layer.get_pos_embed(cw1[i], 1, 0, i)
                   for i in range(2)]
            residual = out.clone()
            out = ref.stage_1[0](out, set_inds1, masks1, pos, block_id=2)
            out = ref.residual_norm_stage_1[0](out + residual)
            want = out.numpy()

        # ---- ours, through the converter ----
        coords = np.stack([ix, iy, iz], -1)[None].astype(np.int32)
        valid = np.ones((1, n), bool)
        variables = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(feats[None]),
            jnp.asarray(coords), jnp.asarray(valid), False)
        state = {f"backbone_3d.{k}": v.numpy()
                 for k, v in ref.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state,
            tc.dsvt_voxel_mapping(set_info=((self.SS, 2), (self.SS, 1)),
                                  num_heads=self.HEADS, ours_prefix=()))
        assert not report["missing_in_torch"], report["missing_in_torch"]
        got, bev_xy, bidx, ovalid = ours.apply(
            new_vars, jnp.asarray(feats[None]), jnp.asarray(coords),
            jnp.asarray(valid), False)
        got, bev_xy, ovalid = map(np.asarray, (got, bev_xy, ovalid))

        ref_map = {(int(px[i]), int(py[i])): want[i]
                   for i in range(len(px))}
        count = 0
        for i in range(got.shape[0]):
            if not ovalid[i]:
                continue
            key = (int(bev_xy[i, 0]), int(bev_xy[i, 1]))
            assert key in ref_map, key
            np.testing.assert_allclose(got[i], ref_map[key],
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=str(key))
            count += 1
        assert count == len(ref_map), (count, len(ref_map))


def _oracle_rotated_nms(boxes_np, scores_np, thresh, pre_max, post_max):
    """Shared CPU rotated-BEV NMS oracle (greedy, descending score) built on
    data/np_geometry.pairwise_iou_bev — the evaluator geometry pinned by the
    reference-executed KITTI golden. Substituted for the reference's CUDA
    `iou3d_nms_utils.nms_gpu` AND for our in-graph nms_bev so the decode
    comparison isolates everything EXCEPT the NMS kernel itself
    (VERDICT r3 item 3)."""
    from dfu3d_tpu.data.np_geometry import pairwise_iou_bev

    order = np.argsort(-scores_np, kind="stable")[:pre_max]
    if order.size == 0:
        return np.zeros((0,), np.int64)
    iou = pairwise_iou_bev(boxes_np[order, :7], boxes_np[order, :7])
    keep = []
    alive = np.ones(order.size, bool)
    for i in range(order.size):
        if not alive[i]:
            continue
        keep.append(order[i])
        if len(keep) >= post_max:
            break
        alive &= ~(iou[i] > thresh)
        alive[i] = False
    return np.asarray(keep, np.int64)


def _xy_cls_order(boxes, cls):
    """Deterministic row ordering for set comparison: lexsort by (x, y, cls).
    Distinct cells decode ≥ a cell apart in x or y (>> fp noise); identical
    decoded boxes from two classes of one head tie-break on cls."""
    return np.lexsort((np.asarray(cls), boxes[:, 1], boxes[:, 0]))


def _match_rows_and_compare(got_b, got_s, got_c, want_b, want_s, want_c,
                            min_frac=0.85, boundary_band=2e-4):
    """Box-for-box comparison robust to top-K boundary churn.

    Random-init heatmap scores are locally dense (boundary gaps ~5e-5, under
    torch-vs-JAX fp noise), so the K-th pick can legitimately differ. Each
    row is greedily matched to the other side by (label, box) proximity;
    ≥ min_frac must match exactly (boxes rtol 1e-3, scores 1e-4), and every
    UNMATCHED row must be boundary churn — its score within `boundary_band`
    of the lowest selected score. A selection or decode bug fails one of the
    three assertions."""
    n = len(want_s)
    assert len(got_s) == n
    if n == 0:
        return
    used = np.zeros(n, bool)
    unmatched = []
    matched = 0
    for i in range(n):
        d = np.max(np.abs(want_b - got_b[i]), axis=1)
        d = d + 1e9 * (want_c != got_c[i]) + 1e9 * used
        j = int(np.argmin(d))
        if d[j] < 5e-3:
            used[j] = True
            matched += 1
            np.testing.assert_allclose(got_b[i], want_b[j],
                                       rtol=1e-3, atol=2e-3)
            np.testing.assert_allclose(got_s[i], want_s[j],
                                       rtol=2e-4, atol=2e-5)
        else:
            unmatched.append(i)
    assert matched >= min_frac * n, (matched, n)
    smin = min(got_s.min(), want_s.min())
    for i in unmatched:
        assert got_s[i] <= smin + boundary_band, (got_s[i], smin)
    for j in np.where(~used)[0]:
        assert want_s[j] <= smin + boundary_band, (want_s[j], smin)


class TestReferenceDecodeParity:
    """FINAL-box parity for the flagship: the reference's own
    CenterHead.generate_predicted_boxes (center_head.py:297-364) +
    centernet_utils.decode_bbox_from_heatmap (:173-235) run on CPU on the
    converted model, with one shared CPU rotated-NMS oracle replacing the
    CUDA class_agnostic_nms on both sides. Closes the last unpinned stage
    between 'logits equal' and 'AP equal' for the model the paper ships."""

    POST = dict(
        SCORE_THRESH=0.1,
        POST_CENTER_LIMIT_RANGE=[0.0, -61.2, -10.0, 61.2, 61.2, 10.0],
        MAX_OBJ_PER_SAMPLE=64,  # < C·H·W per head so the top-K boundary has
        # a clear score gap (random logits spaced ~2e-3 vs fp noise ~1e-5)
        NMS_CONFIG=dict(NMS_TYPE="nms_gpu", NMS_THRESH=0.6,
                        NMS_PRE_MAXSIZE=1000, NMS_POST_MAXSIZE=16),
    )

    @pytest.fixture(scope="class")
    def setup(self, ref_modules):
        import sys as _sys

        _sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from __graft_entry__ import _synthetic_batch

        ref = _build_reference_flagship(ref_modules)
        # random-init hm logits cluster within ~1e-2, so top-K boundary gaps
        # sit at fp-noise level; widening the final hm conv's weights spreads
        # the scores (the CONVERTED weights are shared, so both sides see the
        # same spread — this tests selection, not robustness to ties)
        with torch.no_grad():
            for h in ref.dense_head.heads_list:
                convs = [m for m in h.hm.modules()
                         if isinstance(m, torch.nn.Conv2d)]
                convs[-1].weight.mul_(12.0)
        model, _ = _ours_flagship()
        # dense coverage of the whole tiny range (~2 points/pillar): sparse
        # batches leave empty BEV patches whose identical all-zero receptive
        # fields produce EXACT score ties, making the top-K boundary pick
        # arbitrary cells on each side
        batch = _synthetic_batch(2, 16384, 16, 12.8)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, batch, train=False,
            method=lambda m, b, train: m._features(b, train),
        )
        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        new_vars, report = tc.apply_mapping(
            variables, state, tc.centerpoint_pillar_mapping()
        )
        assert not report["missing_in_torch"]
        converted = {
            "params": new_vars["params"],
            "batch_stats": new_vars["batch_stats"],
        }
        bd = {"points": _torch_points(batch), "batch_size": 2}
        with torch.no_grad():
            bd = ref.vfe(bd)
            bd = ref.map_to_bev(bd)
            bd = ref.backbone_2d(bd)
            x = ref.dense_head.shared_conv(bd["spatial_features_2d"])
            ref_preds = [
                {k: v for k, v in h(x).items()}
                for h in ref.dense_head.heads_list
            ]
        ref.dense_head.model_cfg["POST_PROCESSING"] = EDict(self.POST)
        return ref, model, batch, converted, ref_preds

    def _ref_final(self, ref, ref_preds):
        """Run the reference's own generate_predicted_boxes end-to-end with
        the oracle patched over the CUDA nms_gpu."""
        from pcdet.ops.iou3d_nms import iou3d_nms_utils

        nms_cfg = self.POST["NMS_CONFIG"]

        def fake_nms_gpu(boxes, scores, thresh, **kw):
            keep = _oracle_rotated_nms(
                boxes.numpy(), scores.numpy(), thresh,
                pre_max=len(scores), post_max=nms_cfg["NMS_POST_MAXSIZE"])
            return torch.as_tensor(keep), None

        orig = getattr(iou3d_nms_utils, "nms_gpu", None)
        iou3d_nms_utils.nms_gpu = fake_nms_gpu
        try:
            with no_cuda(), torch.no_grad():
                ret = ref.dense_head.generate_predicted_boxes(2, ref_preds)
        finally:
            iou3d_nms_utils.nms_gpu = orig
        return ret

    def _ours_pre_nms(self, model, batch, converted):
        from dfu3d_tpu.utils.config import CfgDict

        post = CfgDict(self.POST)
        per_head = model.apply(
            converted, batch, train=False,
            method=lambda m, b, train: m.dense_head.decode_topk(
                m._features(b, train), post),
        )
        return [tuple(np.asarray(t) for t in head) for head in per_head]

    def test_pre_nms_decode_matches_reference(self, setup):
        """Top-K peak selection + box decode math equal box-for-box (the
        reference's _topk two-stage selection == our flat top-K)."""
        ref, model, batch, converted, ref_preds = setup
        from pcdet.models.model_utils import centernet_utils

        ours = self._ours_pre_nms(model, batch, converted)
        post = self.POST
        lim = torch.tensor(post["POST_CENTER_LIMIT_RANGE"]).float()
        for hi, pred in enumerate(ref_preds):
            with torch.no_grad():
                ref_dicts = centernet_utils.decode_bbox_from_heatmap(
                    heatmap=pred["hm"].sigmoid(),
                    rot_cos=pred["rot"][:, 0].unsqueeze(1),
                    rot_sin=pred["rot"][:, 1].unsqueeze(1),
                    center=pred["center"], center_z=pred["center_z"],
                    dim=pred["dim"].exp(),
                    point_cloud_range=np.array(PCR), voxel_size=VOXEL,
                    feature_map_stride=4, K=post["MAX_OBJ_PER_SAMPLE"],
                    score_thresh=post["SCORE_THRESH"],
                    post_center_limit_range=lim,
                )
            boxes, scores, cls, valid = ours[hi]
            for b in range(2):
                want_b = ref_dicts[b]["pred_boxes"].numpy()
                want_s = ref_dicts[b]["pred_scores"].numpy()
                want_c = ref_dicts[b]["pred_labels"].numpy()
                got_b = boxes[b][valid[b]]
                got_s = scores[b][valid[b]]
                got_c = cls[b][valid[b]]
                assert got_b.shape[0] == want_b.shape[0], (hi, b)
                _match_rows_and_compare(got_b, got_s, got_c,
                                        want_b, want_s, want_c)

    def test_final_boxes_match_reference(self, setup):
        """End-to-end eval decode: our final (boxes, scores, labels) equal
        the reference's ret_dict box-for-box under the shared NMS oracle."""
        ref, model, batch, converted, ref_preds = setup
        ret = self._ref_final(ref, ref_preds)
        ours = self._ours_pre_nms(model, batch, converted)
        nms_cfg = self.POST["NMS_CONFIG"]
        # 1-based global labels per head-local class id (what both decoders
        # emit: ref center_head.py:328 + the trailing +1 at :361)
        mapping = [np.asarray([CLASS_NAMES.index(n) + 1 for n in head])
                   for head in CLASS_NAMES_EACH_HEAD]
        for b in range(2):
            got_boxes, got_scores, got_labels = [], [], []
            for hi, (boxes, scores, cls, valid) in enumerate(ours):
                bx, sc, cl = (boxes[b][valid[b]], scores[b][valid[b]],
                              cls[b][valid[b]])
                keep = _oracle_rotated_nms(
                    bx, sc, nms_cfg["NMS_THRESH"],
                    pre_max=nms_cfg["NMS_PRE_MAXSIZE"],
                    post_max=nms_cfg["NMS_POST_MAXSIZE"])
                got_boxes.append(bx[keep])
                got_scores.append(sc[keep])
                got_labels.append(mapping[hi][cl[keep]])
            got_boxes = np.concatenate(got_boxes)
            got_scores = np.concatenate(got_scores)
            got_labels = np.concatenate(got_labels)
            want_boxes = ret[b]["pred_boxes"].numpy()
            want_scores = ret[b]["pred_scores"].numpy()
            want_labels = ret[b]["pred_labels"].numpy()
            assert got_boxes.shape == want_boxes.shape
            _match_rows_and_compare(got_boxes, got_scores, got_labels,
                                    want_boxes, want_scores, want_labels,
                                    min_frac=0.8)
