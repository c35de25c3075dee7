"""Parity of the shared RoI head template against the reference's own torch
code (roi_head_template.py + proposal_target_layer.py + loss_utils.py).

The pure-torch parts of the reference template — canonical transform with
heading flip, cls/reg/corner losses, canonical box decode, the dense RoI grid
— run on CPU torch unmodified; the CUDA-only part (boxes_iou3d_gpu inside
sample_rois_for_rcnn) is bypassed by monkeypatching the proposal target layer
with fixed sampled rois, which is exactly the seam the reference exposes.
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

from dfu3d_tpu.models import roi_head as rh


@pytest.fixture(scope="module")
def ref_template():
    install_reference_stubs()
    from pcdet.models.roi_heads.roi_head_template import RoIHeadTemplate

    model_cfg = EDict({
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder",
            "ROI_PER_IMAGE": 128,
            "FG_RATIO": 0.5,
            "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "roi_iou",
            "CLS_FG_THRESH": 0.75,
            "CLS_BG_THRESH": 0.25,
            "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8,
            "REG_FG_THRESH": 0.55,
        },
        "LOSS_CONFIG": {
            "CLS_LOSS": "BinaryCrossEntropy",
            "REG_LOSS": "smooth-l1",
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {
                "rcnn_cls_weight": 1.0,
                "rcnn_reg_weight": 1.0,
                "rcnn_corner_weight": 1.0,
                "code_weights": [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
            },
        },
    })
    with no_cuda():
        return RoIHeadTemplate(num_class=1, model_cfg=model_cfg)


LOSS_CFG = {
    "CLS_LOSS": "BinaryCrossEntropy",
    "REG_LOSS": "smooth-l1",
    "CORNER_LOSS_REGULARIZATION": True,
    "LOSS_WEIGHTS": {
        "rcnn_cls_weight": 1.0,
        "rcnn_reg_weight": 1.0,
        "rcnn_corner_weight": 1.0,
        "code_weights": [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    },
}


def _random_boxes(rng, shape):
    out = np.zeros(shape + (7,), dtype=np.float32)
    out[..., 0:3] = rng.uniform(-20, 20, shape + (3,))
    out[..., 3:6] = rng.uniform(0.5, 4.0, shape + (3,))
    out[..., 6] = rng.uniform(-2 * np.pi, 2 * np.pi, shape)
    return out


class TestCanonicalTransform:
    def test_gt_of_rois_parity(self, ref_template):
        rng = np.random.RandomState(0)
        b, m = 2, 24
        rois = _random_boxes(rng, (b, m))
        gt = _random_boxes(rng, (b, m))
        gt8 = np.concatenate(
            [gt, rng.randint(1, 4, (b, m, 1)).astype(np.float32)], axis=-1
        )

        fixed = {
            "rois": torch.from_numpy(rois.copy()),
            "gt_of_rois": torch.from_numpy(gt8.copy()),
        }
        ref_template.proposal_target_layer.forward = lambda bd: {
            k: v.clone() for k, v in fixed.items()
        }
        ref_out = ref_template.assign_targets({"batch_size": b})

        ours = rh.canonicalize_gt_of_rois(jnp.asarray(rois), jnp.asarray(gt8))
        np.testing.assert_allclose(
            np.asarray(ours), ref_out["gt_of_rois"].numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours)[..., 7], gt8[..., 7], atol=0
        )


class TestLossParity:
    @pytest.fixture()
    def fixed_targets(self, ref_template):
        rng = np.random.RandomState(1)
        b, m = 2, 32
        rois = _random_boxes(rng, (b, m))
        gt = _random_boxes(rng, (b, m))
        # gt near rois so corner loss is on plausible fg pairs
        gt[..., 0:3] = rois[..., 0:3] + rng.uniform(-0.5, 0.5, (b, m, 3))
        gt[..., 6] = rois[..., 6] + rng.uniform(-0.3, 0.3, (b, m))
        gt8 = np.concatenate([gt, np.ones((b, m, 1), np.float32)], axis=-1)

        fixed = {
            "rois": torch.from_numpy(rois.copy()),
            "gt_of_rois": torch.from_numpy(gt8.copy()),
        }
        ref_template.proposal_target_layer.forward = lambda bd: {
            k: v.clone() for k, v in fixed.items()
        }
        tgt = ref_template.assign_targets({"batch_size": b})

        reg_valid = rng.randint(0, 2, (b, m)).astype(np.int64)
        # soft roi_iou labels are always in [0,1]; torch's BCE rejects the
        # -1 ignore value (that path pairs with CrossEntropy in the reference)
        cls_labels = rng.uniform(0, 1, (b, m)).astype(np.float32)
        rcnn_cls = rng.randn(b * m, 1).astype(np.float32)
        rcnn_reg = (rng.randn(b * m, 7) * 0.1).astype(np.float32)

        fr = {
            "rois": tgt["rois"],
            "gt_of_rois": tgt["gt_of_rois"],
            "gt_of_rois_src": tgt["gt_of_rois_src"],
            "reg_valid_mask": torch.from_numpy(reg_valid),
            "rcnn_cls_labels": torch.from_numpy(cls_labels),
            "rcnn_cls": torch.from_numpy(rcnn_cls.copy()),
            "rcnn_reg": torch.from_numpy(rcnn_reg.copy()),
        }
        ours = {
            "rois": jnp.asarray(rois),
            "gt_of_rois": jnp.asarray(tgt["gt_of_rois"].numpy()),
            "gt_of_rois_src": jnp.asarray(gt8),
            "reg_valid_mask": jnp.asarray(reg_valid),
            "rcnn_cls_labels": jnp.asarray(cls_labels),
        }
        return fr, ours, rcnn_cls, rcnn_reg

    def test_cls_loss_parity(self, ref_template, fixed_targets):
        fr, ours, rcnn_cls, _ = fixed_targets
        ref_loss, _ = ref_template.get_box_cls_layer_loss(fr)
        our_loss = rh.roi_cls_loss(
            jnp.asarray(rcnn_cls), ours["rcnn_cls_labels"], LOSS_CFG
        )
        np.testing.assert_allclose(
            float(our_loss), float(ref_loss), rtol=1e-5, atol=1e-6
        )

    def test_reg_and_corner_loss_parity(self, ref_template, fixed_targets):
        fr, ours, _, rcnn_reg = fixed_targets
        ref_loss, ref_tb = ref_template.get_box_reg_layer_loss(fr)
        our_loss, our_tb = rh.roi_reg_loss(jnp.asarray(rcnn_reg), ours, LOSS_CFG)
        np.testing.assert_allclose(
            float(our_tb["rcnn_loss_reg"]), ref_tb["rcnn_loss_reg"],
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            float(our_tb["rcnn_loss_corner"]), ref_tb["rcnn_loss_corner"],
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            float(our_loss), float(ref_loss), rtol=1e-4, atol=1e-5
        )


class TestDecodeParity:
    def test_generate_predicted_boxes(self, ref_template):
        rng = np.random.RandomState(2)
        b, n = 2, 16
        rois = _random_boxes(rng, (b, n))
        cls = rng.randn(b * n, 1).astype(np.float32)
        reg = (rng.randn(b * n, 7) * 0.1).astype(np.float32)

        _, ref_boxes = ref_template.generate_predicted_boxes(
            batch_size=b,
            rois=torch.from_numpy(rois.copy()),
            cls_preds=torch.from_numpy(cls.copy()),
            box_preds=torch.from_numpy(reg.copy()),
        )
        ours = rh.generate_predicted_boxes(
            jnp.asarray(rois), jnp.asarray(reg.reshape(b, n, 7))
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref_boxes.numpy(), rtol=1e-4, atol=1e-4
        )


class TestDenseGridPoints:
    def test_reference_order(self):
        install_reference_stubs()
        from pcdet.models.roi_heads.pvrcnn_head import PVRCNNHead

        rng = np.random.RandomState(3)
        rois = _random_boxes(rng, (5,))
        ref = PVRCNNHead.get_dense_grid_points(
            torch.from_numpy(rois), 5, 6
        ).numpy()
        ours = np.asarray(rh.dense_grid_points(jnp.asarray(rois), 6))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_global_grid_points(self):
        install_reference_stubs()
        from pcdet.models.roi_heads.pvrcnn_head import PVRCNNHead
        from pcdet.utils import common_utils

        rng = np.random.RandomState(4)
        rois = _random_boxes(rng, (5,))
        t = torch.from_numpy(rois)
        local = PVRCNNHead.get_dense_grid_points(t, 5, 6)
        ref = common_utils.rotate_points_along_z(
            local.clone(), t[:, 6]
        ) + t[:, None, 0:3]
        ours = np.asarray(rh.global_grid_points(jnp.asarray(rois), 6))
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


class TestSubsampler:
    TCFG = {
        "ROI_PER_IMAGE": 128, "FG_RATIO": 0.5,
        "SAMPLE_ROI_BY_EACH_CLASS": True, "CLS_SCORE_TYPE": "roi_iou",
        "CLS_FG_THRESH": 0.75, "CLS_BG_THRESH": 0.25,
        "CLS_BG_THRESH_LO": 0.1, "HARD_BG_RATIO": 0.8,
        "REG_FG_THRESH": 0.55,
    }

    def test_composition(self):
        rng = np.random.RandomState(5)
        n = 512
        ious = np.concatenate([
            rng.uniform(0.6, 1.0, 100),   # fg
            rng.uniform(0.1, 0.55, 200),  # hard bg
            rng.uniform(0.0, 0.1, 212),   # easy bg
        ]).astype(np.float32)
        idx = np.asarray(
            rh._subsample_rois(jax.random.PRNGKey(0), jnp.asarray(ious),
                               self.TCFG)
        )
        assert idx.shape == (128,)
        assert len(np.unique(idx)) == 128  # without replacement here
        sampled = ious[idx]
        # 64 fg sampled (100 available), bg fills the rest at ~0.8 hard
        assert (sampled >= 0.55).sum() == 64
        hard = ((sampled >= 0.1) & (sampled < 0.55)).sum()
        assert 40 <= hard <= 60

    def test_fg_starved(self):
        ious = np.concatenate([
            np.full(10, 0.9), np.full(502, 0.05)
        ]).astype(np.float32)
        idx = np.asarray(
            rh._subsample_rois(jax.random.PRNGKey(1), jnp.asarray(ious),
                               self.TCFG)
        )
        assert (ious[idx] >= 0.55).sum() == 10

    def test_assign_targets_contract(self):
        rng = np.random.RandomState(6)
        b, p, g = 2, 64, 8
        rois = _random_boxes(rng, (b, p))
        roi_labels = rng.randint(1, 4, (b, p))
        roi_scores = rng.uniform(0, 1, (b, p)).astype(np.float32)
        gt = _random_boxes(rng, (b, g))
        gt8 = np.concatenate(
            [gt, rng.randint(1, 4, (b, g, 1)).astype(np.float32)], axis=-1
        )
        gt_valid = np.ones((b, g), bool)
        tcfg = dict(self.TCFG, ROI_PER_IMAGE=32)
        out = rh.assign_roi_targets(
            jax.random.PRNGKey(2), jnp.asarray(rois),
            jnp.asarray(roi_labels), jnp.asarray(roi_scores),
            jnp.asarray(gt8), jnp.asarray(gt_valid), tcfg,
        )
        assert out["rois"].shape == (b, 32, 7)
        assert out["gt_of_rois"].shape == (b, 32, 8)
        assert out["rcnn_cls_labels"].shape == (b, 32)
        labels = np.asarray(out["rcnn_cls_labels"])
        assert ((labels >= 0) & (labels <= 1)).all()
        # canonical heading within [-pi/2, pi/2]
        h = np.asarray(out["gt_of_rois"])[..., 6]
        assert (np.abs(h) <= np.pi / 2 + 1e-5).all()


# ---------------------------------------------------------------------------
# Checkpoint-converter parity: the reference's own VoxelRCNNHead / PVRCNNHead
# torch modules, random-initialised, converted through train/torch_convert,
# must match our head stacks bit-close in eval mode.
# ---------------------------------------------------------------------------

import flax.linen as nn

from dfu3d_tpu.models.roi_head import NeighborVoxelSA, make_fc_stack, shared_fc_stack
from dfu3d_tpu.train import torch_convert as tc

_POOL_LAYER = {
    "MLPS": [[16, 16]], "QUERY_RANGES": [[4, 4, 4]],
    "POOL_RADIUS": [0.4], "NSAMPLE": [8], "POOL_METHOD": "max_pool",
}


def _randomize_bn_stats(module, seed=3):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


class _VoxFC(nn.Module):
    """Our VoxelRCNN FC tower namespace (models/voxelrcnn.py setup)."""

    @nn.compact
    def __call__(self, flat, train=False):
        h = shared_fc_stack((32, 32), 0.3, name="shared_fc")(flat, train)
        cls = nn.Dense(1, name="cls_pred")(
            shared_fc_stack((32,), 0.3, name="cls_fc")(h, train))
        reg = nn.Dense(7, name="reg_pred")(
            shared_fc_stack((32,), 0.3, name="reg_fc")(h, train))
        return cls, reg


class TestVoxelRCNNHeadConvert:
    @pytest.fixture(scope="class")
    def ref_head(self):
        install_reference_stubs()
        from pcdet.models.roi_heads.voxelrcnn_head import VoxelRCNNHead

        cfg = EDict({
            "CLASS_AGNOSTIC": True,
            # CLS_FC[-1] must equal SHARED_FC[-1]: the reference head reuses
            # pre_channel from the cls stack when building the reg stack
            "SHARED_FC": [32, 32], "CLS_FC": [32], "REG_FC": [32],
            "DP_RATIO": 0.3,
            "ROI_GRID_POOL": {
                "GRID_SIZE": 4,
                "FEATURES_SOURCE": ["x_conv2", "x_conv3"],
                "POOL_LAYERS": EDict({
                    "x_conv2": dict(_POOL_LAYER),
                    "x_conv3": dict(_POOL_LAYER),
                }),
            },
            "TARGET_CONFIG": {"BOX_CODER": "ResidualCoder"},
            "LOSS_CONFIG": LOSS_CFG,
        })
        with no_cuda():
            torch.manual_seed(11)
            head = VoxelRCNNHead(
                backbone_channels={"x_conv2": 8, "x_conv3": 8},
                model_cfg=cfg, point_cloud_range=[0, -1, -1, 1, 1, 1],
                voxel_size=[0.1, 0.1, 0.1], num_class=1,
            )
        head.eval()
        _randomize_bn_stats(head)
        return head

    def _state(self, ref_head):
        return {f"roi_head.{k}": v.detach().numpy()
                for k, v in ref_head.state_dict().items()}

    def test_fc_tower_parity(self, ref_head):
        n, d = 6, 4 ** 3 * 32  # g³ · ΣC
        rng = np.random.RandomState(7)
        x = rng.randn(n, d).astype(np.float32)

        model = _VoxFC()
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        mapping = tc.voxelrcnn_head_mapping(
            shared_fc=(32, 32), cls_fc=(32,), reg_fc=(32,), pool_sources=())
        new_vars, report = tc.apply_mapping(
            variables, self._state(ref_head), mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"]

        ours_cls, ours_reg = model.apply(new_vars, jnp.asarray(x))
        with torch.no_grad():
            tx = torch.from_numpy(x)
            shared = ref_head.shared_fc_layer(tx)
            ref_cls = ref_head.cls_pred_layer(ref_head.cls_fc_layers(shared))
            ref_reg = ref_head.reg_pred_layer(ref_head.reg_fc_layers(shared))
        np.testing.assert_allclose(np.asarray(ours_cls), ref_cls.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_reg), ref_reg.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_neighbor_pool_parity(self, ref_head):
        """One grid point grouping ALL voxels: our NeighborVoxelSA with
        converted weights vs the reference mlps_in/pos/out math
        (voxel_pool_modules.py forward:71-126)."""
        v, c = 24, 8
        rng = np.random.RandomState(5)
        vox_xyz = rng.uniform(-1, 1, (1, v, 3)).astype(np.float32)
        feats = rng.randn(1, v, c).astype(np.float32)
        grid = np.zeros((1, 1, 3), np.float32)

        sa = NeighborVoxelSA(mlp_spec=(16, 16), radius=10.0, nsample=v)
        variables = sa.init(
            jax.random.PRNGKey(0), jnp.asarray(grid), jnp.ones((1, 1), bool),
            jnp.asarray(vox_xyz), jnp.asarray(feats), jnp.ones((1, v), bool),
            False,
        )
        full = tc.voxelrcnn_head_mapping(pool_sources=("x_conv2",))
        mapping = {(k[0],) + k[2:]: val for k, val in full.items()
                   if len(k) > 2 and k[1] == "pool_x_conv2"}
        new_vars, report = tc.apply_mapping(
            variables, self._state(ref_head), mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"]

        ours = sa.apply(
            new_vars, jnp.asarray(grid), jnp.ones((1, 1), bool),
            jnp.asarray(vox_xyz), jnp.asarray(feats), jnp.ones((1, v), bool),
            False,
        )
        pl = ref_head.roi_grid_pool_layers[0]
        with torch.no_grad():
            fin = pl.mlps_in[0](torch.from_numpy(feats[0]).T[None])  # (1,16,V)
            rel = torch.from_numpy(vox_xyz[0]).T[None, :, None, :]   # (1,3,1,V)
            pos = pl.mlps_pos[0](rel)                                # (1,16,1,V)
            h = torch.relu(fin[:, :, None, :] + pos)
            pooled = h.max(dim=-1).values                            # (1,16,1)
            out = pl.mlps_out[0](pooled)                             # (1,16,1)
        np.testing.assert_allclose(
            np.asarray(ours)[0, 0], out[0, :, 0].numpy(),
            rtol=1e-4, atol=1e-4,
        )


class _PVFC(nn.Module):
    """Our PVRCNN FC tower namespace (models/pvrcnn.py _setup_roi_fc)."""

    @nn.compact
    def __call__(self, flat, train=False):
        h = shared_fc_stack((32, 32), 0.3, name="shared_fc")(flat, train)
        cls = make_fc_stack((16,), 1, 0.3, name="cls_fc")(h, train)
        reg = make_fc_stack((16,), 7, 0.3, name="reg_fc")(h, train)
        return cls, reg


class TestPVRCNNHeadConvert:
    @pytest.fixture(scope="class")
    def ref_head(self):
        install_reference_stubs()
        from pcdet.models.roi_heads.pvrcnn_head import PVRCNNHead

        cfg = EDict({
            "CLASS_AGNOSTIC": True,
            "SHARED_FC": [32, 32], "CLS_FC": [16], "REG_FC": [16],
            "DP_RATIO": 0.3,
            "ROI_GRID_POOL": {
                "GRID_SIZE": 4, "MLPS": [[16, 16], [16, 16]],
                "POOL_RADIUS": [0.8, 1.6], "NSAMPLE": [8, 8],
                "POOL_METHOD": "max_pool",
            },
            "TARGET_CONFIG": {"BOX_CODER": "ResidualCoder"},
            "LOSS_CONFIG": LOSS_CFG,
        })
        with no_cuda():
            torch.manual_seed(13)
            head = PVRCNNHead(input_channels=8, model_cfg=cfg, num_class=1)
        head.eval()
        _randomize_bn_stats(head, seed=4)
        return head

    def test_fc_tower_parity(self, ref_head):
        """Includes the channel-major flatten: pooled (N, g³, C) →
        permute(0, 2, 1).view(N, -1, 1) on the torch side, swapaxes+reshape
        on ours (pvrcnn_head.py forward:154-158)."""
        n, g3, c = 6, 4 ** 3, 32
        rng = np.random.RandomState(9)
        pooled = rng.randn(n, g3, c).astype(np.float32)

        ours_flat = jnp.swapaxes(jnp.asarray(pooled), 1, 2).reshape(n, -1)
        model = _PVFC()
        variables = model.init(jax.random.PRNGKey(0), ours_flat)
        state = {f"roi_head.{k}": v.detach().numpy()
                 for k, v in ref_head.state_dict().items()}
        mapping = tc.pvrcnn_head_mapping(
            shared_fc=(32, 32), cls_fc=(16,), reg_fc=(16,),
            num_pool_groups=0)
        new_vars, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"]

        ours_cls, ours_reg = model.apply(new_vars, ours_flat)
        with torch.no_grad():
            tx = (torch.from_numpy(pooled).permute(0, 2, 1).contiguous()
                  .view(n, -1, 1))
            shared = ref_head.shared_fc_layer(tx)
            ref_cls = ref_head.cls_layers(shared).squeeze(-1)
            ref_reg = ref_head.reg_layers(shared).squeeze(-1)
        np.testing.assert_allclose(np.asarray(ours_cls), ref_cls.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_reg), ref_reg.numpy(),
                                   rtol=1e-4, atol=1e-4)


class _SECONDFC(nn.Module):
    """Our SECONDNetIoU FC tower namespace (models/second_iou.py setup)."""

    @nn.compact
    def __call__(self, flat, train=False):
        h = shared_fc_stack((32, 32), 0.3, name="shared_fc")(flat, train)
        return make_fc_stack((16,), 1, 0.3, name="iou_fc")(h, train)


class TestSECONDHeadConvert:
    def test_fc_tower_parity(self):
        install_reference_stubs()
        from pcdet.models.roi_heads.second_head import SECONDHead

        cfg = EDict({
            "CLASS_AGNOSTIC": True,
            "SHARED_FC": [32, 32], "IOU_FC": [16], "DP_RATIO": 0.3,
            "ROI_GRID_POOL": {"GRID_SIZE": 4, "IN_CHANNEL": 8,
                              "DOWNSAMPLE_RATIO": 8},
            "TARGET_CONFIG": {"BOX_CODER": "ResidualCoder"},
            "LOSS_CONFIG": LOSS_CFG,
        })
        with no_cuda():
            torch.manual_seed(17)
            head = SECONDHead(input_channels=8, model_cfg=cfg, num_class=1)
        head.eval()
        _randomize_bn_stats(head, seed=6)

        n, d = 6, 4 * 4 * 8  # g² · C
        rng = np.random.RandomState(21)
        x = rng.randn(n, d).astype(np.float32)
        model = _SECONDFC()
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        state = {f"roi_head.{k}": v.detach().numpy()
                 for k, v in head.state_dict().items()}
        mapping = tc.second_head_mapping(shared_fc=(32, 32), iou_fc=(16,))
        new_vars, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"]

        ours = model.apply(new_vars, jnp.asarray(x))
        with torch.no_grad():
            shared = head.shared_fc_layer(torch.from_numpy(x)[..., None])
            ref = head.iou_layers(shared).squeeze(-1)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                   rtol=1e-4, atol=1e-4)


class TestPointRCNNHeadConvert:
    @pytest.fixture(scope="class")
    def ref_head(self):
        install_reference_stubs()
        from pcdet.models.roi_heads.pointrcnn_head import PointRCNNHead

        cfg = EDict({
            "CLASS_AGNOSTIC": True,
            "ROI_POINT_POOL": {"POOL_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                               "NUM_SAMPLED_POINTS": 32,
                               "DEPTH_NORMALIZER": 70.0},
            "XYZ_UP_LAYER": [16, 16],
            "CLS_FC": [16], "REG_FC": [16],
            "DP_RATIO": 0.0, "USE_BN": False,
            "SA_CONFIG": {
                "NPOINTS": [16, -1], "RADIUS": [0.2, 100],
                "NSAMPLE": [8, 8], "MLPS": [[16, 16], [16, 32]],
            },
            "TARGET_CONFIG": {"BOX_CODER": "ResidualCoder"},
            "LOSS_CONFIG": LOSS_CFG,
        })
        with no_cuda():
            torch.manual_seed(23)
            head = PointRCNNHead(input_channels=16, model_cfg=cfg,
                                 num_class=1)
        head.eval()
        _randomize_bn_stats(head, seed=8)
        return head

    def test_stacks_parity(self, ref_head):
        """xyz_up + merge_down (biased Conv2d k=1, USE_BN=False), one SA MLP
        on a grouped tensor, and the cls/reg make_fc_layers stacks — all
        through pointrcnn_head_mapping on the reference's own module."""
        from dfu3d_tpu.models.pointrcnn import PointRCNNRoIHead

        rng = np.random.RandomState(31)
        m_, s_ = 4, 12
        local = rng.randn(m_, s_, 3).astype(np.float32)
        prefix = rng.rand(m_, s_, 2).astype(np.float32)
        feats = rng.randn(m_, s_, 16).astype(np.float32)
        valid = np.ones((m_, s_), bool)

        ours = PointRCNNRoIHead(
            num_samples=s_, xyz_up=(16, 16), sa_npoints=(16, -1),
            sa_radii=(0.2, 100.0), sa_nsamples=(8, 8),
            sa_mlps=((16, 16), (16, 32)), cls_fc=(16,), reg_fc=(16,),
            dp_ratio=0.0, use_bn=False,
        )
        variables = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(local), jnp.asarray(prefix),
            jnp.asarray(feats), jnp.asarray(valid), False,
        )
        state = {f"roi_head.{k}": v.detach().numpy()
                 for k, v in ref_head.state_dict().items()}
        mapping = tc.pointrcnn_head_mapping(
            xyz_up=(16, 16), sa_mlps=((16, 16), (16, 32)),
            cls_fc=(16,), reg_fc=(16,), use_bn=False, ours_prefix=())
        new_vars, report = tc.apply_mapping(variables, state, mapping)
        assert not report["missing_in_torch"], report["missing_in_torch"]

        # xyz_up + merge_down equality on the full-prefix path
        xin = np.concatenate([local, prefix], -1)
        with torch.no_grad():
            tx = torch.from_numpy(xin).permute(0, 2, 1)[..., None]  # (M,5,S,1)
            t_xyz = ref_head.xyz_up_layer(tx)
            t_merged = ref_head.merge_down_layer(torch.cat(
                [t_xyz, torch.from_numpy(feats).permute(0, 2, 1)[..., None]],
                dim=1))
            t_merged = t_merged[..., 0].permute(0, 2, 1).numpy()  # (M,S,16)

        def ours_merge(mdl):
            xf = mdl._mlp(jnp.asarray(xin), jnp.asarray(valid), (16, 16),
                          "xyz_up", False)
            merged = jnp.concatenate([xf, jnp.asarray(feats)], -1)
            return mdl._mlp(merged, jnp.asarray(valid), (16,), "merge_down",
                            False)

        got = ours.apply(new_vars, method=ours_merge)
        np.testing.assert_allclose(np.asarray(got), t_merged,
                                   rtol=1e-4, atol=1e-4)

        # SA level-0 MLP on a grouped tensor (Conv2d+BN2d, always-on BN)
        grouped = rng.randn(m_, 6, 8, 19).astype(np.float32)  # 3+16 channels
        with torch.no_grad():
            tg = torch.from_numpy(grouped).permute(0, 3, 1, 2)
            t_sa = ref_head.SA_modules[0].mlps[0](tg).permute(0, 2, 3, 1)

        def ours_sa(mdl):
            mask = jnp.ones(grouped.shape[:-1], bool)
            return mdl._mlp(jnp.asarray(grouped), mask, (16, 16), "sa0",
                            False, bn=True)

        got_sa = ours.apply(new_vars, method=ours_sa)
        np.testing.assert_allclose(np.asarray(got_sa), t_sa.numpy(),
                                   rtol=1e-4, atol=1e-4)

        # cls/reg stacks on the pooled vector
        pooled = rng.randn(m_, 32).astype(np.float32)
        with torch.no_grad():
            t_cls = ref_head.cls_layers(
                torch.from_numpy(pooled)[..., None]).squeeze(-1)
            t_reg = ref_head.reg_layers(
                torch.from_numpy(pooled)[..., None]).squeeze(-1)

        def ours_heads(mdl):
            h = jnp.asarray(pooled)
            return mdl.cls_stack(h, False), mdl.reg_stack(h, False)

        got_cls, got_reg = ours.apply(new_vars, method=ours_heads)
        np.testing.assert_allclose(np.asarray(got_cls), t_cls.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_reg), t_reg.numpy(),
                                   rtol=1e-4, atol=1e-4)
