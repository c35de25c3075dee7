"""PointRCNN: two-stage point-based detector.

Reference: pcdet/models/detectors/pointrcnn.py — PointNet2MSG backbone →
PointHeadBox (per-point fg segmentation + box regression with
PointResidualCoder) → PointRCNNHead (proposal NMS, RoI point pooling with
canonical transform, refinement).

TPU-first redesign notes (documented deviations):
* ProposalTargetLayer's random fg/bg RoI subsampling (128 rois, fg ratio 0.5,
  proposal_target_layer.py) is replaced by masked loss weighting over ALL
  fixed-size rois — same objective, no dynamic shapes.
* RoI feature extraction pools up to ROI_POINT_SAMPLES raw points per RoI via
  masked rank-compaction (replacing the roipoint_pool3d CUDA op, SURVEY N3)
  followed by a canonical-frame PointNet encoder.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry.boxes import points_in_boxes, rotate_points_along_z
from ..core.geometry.iou import pairwise_iou3d
from ..core.geometry.nms import nms_bev
from ..core.voxel import VoxelGrid
from . import losses
from .pointnet2_backbone import PointNet2MSG, SharedMLP


# ---------------------------------------------------------------------------
# PointResidualCoder (reference box_coder_utils.py:144-222)
# ---------------------------------------------------------------------------

def point_encode(gt_boxes, points, gt_classes, mean_sizes):
    """(…, 7) gt, (…, 3) points, (…,) 1-based classes → (…, 8) residuals."""
    ms = jnp.asarray(mean_sizes, jnp.float32)
    anchor = ms[jnp.clip(gt_classes - 1, 0, ms.shape[0] - 1)]
    dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
    diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
    return jnp.stack(
        [
            (gt_boxes[..., 0] - points[..., 0]) / diagonal,
            (gt_boxes[..., 1] - points[..., 1]) / diagonal,
            (gt_boxes[..., 2] - points[..., 2]) / dza,
            jnp.log(jnp.maximum(gt_boxes[..., 3], 1e-5) / dxa),
            jnp.log(jnp.maximum(gt_boxes[..., 4], 1e-5) / dya),
            jnp.log(jnp.maximum(gt_boxes[..., 5], 1e-5) / dza),
            jnp.cos(gt_boxes[..., 6]),
            jnp.sin(gt_boxes[..., 6]),
        ],
        axis=-1,
    )


def point_decode(encodings, points, pred_classes, mean_sizes):
    ms = jnp.asarray(mean_sizes, jnp.float32)
    anchor = ms[jnp.clip(pred_classes - 1, 0, ms.shape[0] - 1)]
    dxa, dya, dza = anchor[..., 0], anchor[..., 1], anchor[..., 2]
    diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
    rg = jnp.arctan2(encodings[..., 7], encodings[..., 6])
    return jnp.stack(
        [
            encodings[..., 0] * diagonal + points[..., 0],
            encodings[..., 1] * diagonal + points[..., 1],
            encodings[..., 2] * dza + points[..., 2],
            jnp.exp(encodings[..., 3]) * dxa,
            jnp.exp(encodings[..., 4]) * dya,
            jnp.exp(encodings[..., 5]) * dza,
            rg,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# PointHeadBox target assignment (reference point_head_box.py + template)
# ---------------------------------------------------------------------------

def assign_point_targets(points_xyz, points_valid, gt_boxes, gt_valid,
                         extra_width=(0.2, 0.2, 0.2)):
    """Per-point class labels + matched gt box.

    labels: 0 = bg, -1 = ignore (inside enlarged box but outside box),
    c >= 1 = fg of class c. Returns (labels, matched_gt (N, 8)).
    """
    inside = points_in_boxes(points_xyz, gt_boxes[:, :7])  # (N, M)
    enlarged = gt_boxes[:, :7] + jnp.concatenate(
        [jnp.zeros(3), jnp.asarray(extra_width, jnp.float32), jnp.zeros(1)]
    )
    inside_ext = points_in_boxes(points_xyz, enlarged)
    inside = inside & gt_valid[None, :]
    inside_ext = inside_ext & gt_valid[None, :]

    box_idx = jnp.argmax(inside, axis=1)
    any_in = jnp.any(inside, axis=1)
    any_ext = jnp.any(inside_ext, axis=1)
    matched = gt_boxes[box_idx]
    labels = jnp.where(any_in, matched[:, -1].astype(jnp.int32), 0)
    labels = jnp.where(any_ext & ~any_in, -1, labels)
    labels = jnp.where(points_valid, labels, -1)
    return labels, matched


class PointHeadBox(nn.Module):
    """Per-point fg cls + box regression (reference PointHeadBox)."""

    num_class: int
    cls_fc: Sequence[int]
    reg_fc: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_features, valid, train: bool):
        cls = SharedMLP(self.cls_fc, dtype=self.dtype, name="cls_fc")(
            point_features, valid[..., None], train
        )
        cls_logits = nn.Dense(self.num_class, param_dtype=jnp.float32,
                              name="cls_out")(cls).astype(jnp.float32)
        reg = SharedMLP(self.reg_fc, dtype=self.dtype, name="reg_fc")(
            point_features, valid[..., None], train
        )
        box_codes = nn.Dense(8, param_dtype=jnp.float32, name="reg_out")(
            reg
        ).astype(jnp.float32)
        return cls_logits, box_codes


# ---------------------------------------------------------------------------
# RoI head (simplified PointRCNNHead, reference roi_heads/pointrcnn_head.py)
# ---------------------------------------------------------------------------

def pool_roi_points(points_xyz, point_feats, points_valid, rois, roi_valid,
                    num_samples: int, extra: float = 1.0):
    """Gather up to num_samples points inside each (enlarged) RoI; canonical
    transform into the RoI frame (replaces roipoint_pool3d, SURVEY N3)."""
    enlarged = rois.at[:, 3:6].add(extra)
    inside = points_in_boxes(points_xyz, enlarged[:, :7])  # (N, R)
    inside = inside & points_valid[:, None] & roi_valid[None, :]
    rank = jnp.cumsum(inside.astype(jnp.int32), axis=0)
    take = inside & (rank <= num_samples)
    slot = jnp.where(take, rank - 1, num_samples)  # (N, R); out-of-range drops
    n = points_xyz.shape[0]
    r = rois.shape[0]
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], inside.shape)
    idx = (
        jnp.zeros((r, num_samples), jnp.int32)
        .at[jnp.arange(r)[:, None], slot.T]
        .set(src.T, mode="drop")
    )
    counts = rank[-1]  # (R,)
    sample_valid = jnp.arange(num_samples)[None, :] < counts[:, None]

    xyz = jnp.take(points_xyz, idx, axis=0)          # (R, S, 3)
    feats = jnp.take(point_feats, idx, axis=0)       # (R, S, C)
    # canonical transform: translate to roi center, rotate by -heading
    local = xyz - rois[:, None, 0:3]
    local = rotate_points_along_z(local, -rois[:, 6])
    return local, feats, sample_valid


class PointRCNNRoIHead(nn.Module):
    """Canonical-frame PointNet encoder + cls/reg FCs."""

    num_samples: int = 128
    mlp: Sequence[int] = (128, 128)
    fc: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, local_xyz, feats, sample_valid, train: bool):
        x = jnp.concatenate([local_xyz, feats], axis=-1)
        x = SharedMLP(self.mlp, dtype=self.dtype, name="enc")(
            x.astype(self.dtype), sample_valid[..., None], train
        )
        x = jnp.where(sample_valid[..., None], x, -jnp.inf)
        pooled = jnp.max(x, axis=-2)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        h = SharedMLP(self.fc, dtype=self.dtype, name="fc")(
            pooled, jnp.ones(pooled.shape[:-1], bool)[..., None], train
        )
        cls = nn.Dense(1, param_dtype=jnp.float32, name="cls_out")(h)[..., 0]
        reg = nn.Dense(7, param_dtype=jnp.float32, name="reg_out")(h)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class PointRCNN(nn.Module):
    """Two-stage point-based detector (reference detectors/pointrcnn.py)."""

    model_cfg: Any
    class_names: Sequence[str]
    grid: VoxelGrid
    dtype: jnp.dtype = jnp.float32

    @property
    def cfg(self):
        from ..utils.config import thaw_cfg

        return thaw_cfg(self.model_cfg)

    def setup(self):
        cfg = self.cfg
        sa = cfg.BACKBONE_3D.SA_CONFIG
        self.backbone = PointNet2MSG(
            npoints=tuple(sa.NPOINTS),
            radii=tuple(tuple(r) for r in sa.RADIUS),
            nsamples=tuple(tuple(s) for s in sa.NSAMPLE),
            mlps=tuple(tuple(tuple(m) for m in lvl) for lvl in sa.MLPS),
            fp_mlps=tuple(tuple(m) for m in cfg.BACKBONE_3D.FP_MLPS),
            dtype=self.dtype,
        )
        ph = cfg.POINT_HEAD
        self.point_head = PointHeadBox(
            num_class=len(self.class_names),
            cls_fc=tuple(ph.CLS_FC),
            reg_fc=tuple(ph.REG_FC),
            dtype=self.dtype,
        )
        self.mean_sizes = tuple(
            tuple(m) for m in ph.TARGET_CONFIG.BOX_CODER_CONFIG.get(
                "mean_size", [[3.9, 1.6, 1.56]] * len(self.class_names)
            )
        )
        rh = cfg.ROI_HEAD
        self.num_rois = int(rh.get("NMS_POST_MAXSIZE", 128))
        self.roi_head = PointRCNNRoIHead(
            num_samples=int(rh.get("ROI_POINT_SAMPLES", 128)),
            dtype=self.dtype,
        )
        self.roi_pre_max = int(rh.get("NMS_PRE_MAXSIZE", 1024))
        self.roi_nms_thresh = float(rh.get("NMS_THRESH", 0.8))

    def _stage1(self, batch, train: bool):
        feats = self.backbone(batch.points, batch.points_valid, train)
        cls_logits, box_codes = self.point_head(feats, batch.points_valid, train)
        return feats, cls_logits, box_codes

    def _proposals(self, batch, cls_logits, box_codes):
        """Per-frame NMS over decoded point boxes → fixed-size RoIs."""
        scores = jnp.max(jax.nn.sigmoid(cls_logits), axis=-1)
        pred_cls = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32) + 1
        boxes = point_decode(
            box_codes, batch.points[..., :3], pred_cls, self.mean_sizes
        )

        def one(bx, sc, valid, lb):
            sel, keep = nms_bev(
                bx, sc, self.roi_nms_thresh,
                pre_max=self.roi_pre_max, post_max=self.num_rois, valid=valid,
            )
            return bx[sel], jnp.where(keep, sc[sel], 0.0), keep, lb[sel]

        return jax.vmap(one)(boxes, scores, batch.points_valid, pred_cls)

    def __call__(self, batch, train: bool = True):
        cfg = self.cfg
        feats, cls_logits, box_codes = self._stage1(batch, train)

        # stage-1 losses (PointHeadBox: focal cls + smooth-l1 reg on fg)
        def targets_one(pts, pv, gt, gv):
            return assign_point_targets(pts[..., :3], pv, gt, gv)

        labels, matched = jax.vmap(targets_one)(
            batch.points, batch.points_valid, batch.gt_boxes, batch.gt_valid
        )
        cared = labels >= 0
        pos = labels > 0
        cls_weights = cared.astype(jnp.float32)
        cls_weights = cls_weights / jnp.maximum(
            jnp.sum(pos, axis=1, keepdims=True), 1.0
        )
        one_hot = jax.nn.one_hot(
            jnp.where(cared, labels, 0), len(self.class_names) + 1
        )[..., 1:]
        cls_loss = jnp.sum(
            losses.sigmoid_focal_loss(cls_logits, one_hot, cls_weights)
        ) / batch.points.shape[0]

        reg_targets = point_encode(
            matched[..., :7], batch.points[..., :3],
            matched[..., -1].astype(jnp.int32), self.mean_sizes,
        )
        reg_weights = pos.astype(jnp.float32)
        reg_weights = reg_weights / jnp.maximum(
            jnp.sum(reg_weights, axis=1, keepdims=True), 1.0
        )
        reg_loss = jnp.sum(
            losses.weighted_smooth_l1(box_codes, reg_targets, reg_weights)
        ) / batch.points.shape[0]

        # stage 2: RoI refinement
        rois, roi_scores, roi_valid, roi_labels = self._proposals(
            batch, jax.lax.stop_gradient(cls_logits),
            jax.lax.stop_gradient(box_codes),
        )

        def pool_one(pts, pf, pv, r, rv):
            return pool_roi_points(
                pts[..., :3], pf, pv, r, rv, self.roi_head.num_samples
            )

        local_xyz, roi_feats, sample_valid = jax.vmap(pool_one)(
            batch.points, feats, batch.points_valid, rois, roi_valid
        )
        rcnn_cls, rcnn_reg = self.roi_head(local_xyz, roi_feats, sample_valid, train)

        # RoI targets: IoU3D vs gt (proposal_target_layer semantics, masked
        # weighting instead of subsampling)
        def roi_iou_one(r, rv, gt, gv):
            iou = pairwise_iou3d(r[:, :7], gt[:, :7])
            iou = jnp.where(gv[None, :], iou, -1.0)
            best = jnp.argmax(iou, axis=1)
            return jnp.max(iou, axis=1), gt[best]

        roi_iou, roi_gt = jax.vmap(roi_iou_one)(
            rois, roi_valid, batch.gt_boxes, batch.gt_valid
        )
        rcfg = cfg.ROI_HEAD.get("TARGET_CONFIG", {})
        fg_thresh = float(rcfg.get("CLS_FG_THRESH", 0.6))
        bg_thresh = float(rcfg.get("CLS_BG_THRESH", 0.45))
        reg_fg = float(rcfg.get("REG_FG_THRESH", 0.55))

        cls_tgt = jnp.where(roi_iou > fg_thresh, 1.0, 0.0)
        cls_cared = (roi_iou > fg_thresh) | (roi_iou < bg_thresh)
        cls_cared = cls_cared & roi_valid
        bce = jnp.clip(rcnn_cls, 0) - rcnn_cls * cls_tgt + jnp.log1p(
            jnp.exp(-jnp.abs(rcnn_cls))
        )
        rcnn_cls_loss = jnp.sum(bce * cls_cared) / jnp.maximum(
            jnp.sum(cls_cared), 1.0
        )

        # canonical-frame residual encode of matched gt vs roi
        from .anchor_head import encode_boxes

        reg_mask = (roi_iou > reg_fg) & roi_valid
        roi_reg_tgt = encode_boxes(roi_gt[..., :7], rois[..., :7])
        rw = reg_mask.astype(jnp.float32)
        rw = rw / jnp.maximum(jnp.sum(rw, axis=1, keepdims=True), 1.0)
        rcnn_reg_loss = jnp.sum(
            losses.weighted_smooth_l1(rcnn_reg, roi_reg_tgt, rw)
        ) / batch.points.shape[0]

        total = cls_loss + reg_loss + rcnn_cls_loss + rcnn_reg_loss
        tb = {
            "point_cls_loss": cls_loss,
            "point_reg_loss": reg_loss,
            "rcnn_cls_loss": rcnn_cls_loss,
            "rcnn_reg_loss": rcnn_reg_loss,
            "rpn_loss": total,
        }
        return total, tb

    def predict(self, batch):
        feats, cls_logits, box_codes = self._stage1(batch, train=False)
        rois, roi_scores, roi_valid, roi_labels = self._proposals(
            batch, cls_logits, box_codes
        )

        def pool_one(pts, pf, pv, r, rv):
            return pool_roi_points(
                pts[..., :3], pf, pv, r, rv, self.roi_head.num_samples
            )

        local_xyz, roi_feats, sample_valid = jax.vmap(pool_one)(
            batch.points, feats, batch.points_valid, rois, roi_valid
        )
        rcnn_cls, rcnn_reg = self.roi_head(
            local_xyz, roi_feats, sample_valid, train=False
        )
        from .anchor_head import decode_boxes

        refined = decode_boxes(rcnn_reg, rois[..., :7])
        scores = jax.nn.sigmoid(rcnn_cls) * roi_scores
        scores = jnp.where(roi_valid, scores, 0.0)
        return refined, scores, roi_labels, roi_valid
