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
