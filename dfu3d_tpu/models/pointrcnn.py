"""PointRCNN: two-stage point-based detector.

Reference: pcdet/models/detectors/pointrcnn.py — PointNet2MSG backbone →
PointHeadBox (per-point fg segmentation + box regression with
PointResidualCoder) → PointRCNNHead (proposal NMS, RoI point pooling with
canonical transform, refinement).

TPU-first redesign notes:
* RoI feature extraction pools up to NUM_SAMPLED_POINTS points per RoI via
  masked rank-compaction (replacing the roipoint_pool3d CUDA op, SURVEY N3).
* The RoI head is the reference-exact PointRCNNHead: xyz_up_layer over the
  5 prefix channels (canonical xyz + detached point score + normalized
  depth), merge_down fusion, the 3-level single-scale SA chain (FPS + ball
  query + shared MLP + maxpool, npoint -1 = group-all) and CLS_FC/REG_FC
  stacks; proposal NMS / ProposalTargetLayer subsampling / canonical losses
  and decode come from models/roi_head.py (parity-tested vs the reference's
  own torch template).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry.boxes import points_in_boxes, rotate_points_along_z
from ..core.voxel import VoxelGrid
from . import losses, roi_head
from .pointnet2_backbone import PointNet2MSG, SharedMLP
from .roi_head import make_fc_stack, roi_head_loss_cfg, roi_head_target_cfg


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
    """Reference-exact PointRCNNHead encoder (pointrcnn_head.py:10-65,
    131-168): xyz_up_layer over the 5 prefix channels, merge_down fusion of
    [xyz_feats ‖ point_feats], the single-scale SA chain (FPS + ball query +
    shared MLP + masked maxpool; npoint -1 groups all points into one
    vector), then CLS_FC/REG_FC make_fc_layers. USE_BN=False (the shipped
    config) uses biased Dense + ReLU, exactly the torch Conv2d(k=1) stacks.
    """

    num_samples: int = 512
    xyz_up: Sequence[int] = (128, 128)
    sa_npoints: Sequence[int] = (128, 32, -1)
    sa_radii: Sequence[float] = (0.2, 0.4, 100.0)
    sa_nsamples: Sequence[int] = (16, 16, 16)
    sa_mlps: Sequence[Sequence[int]] = (
        (128, 128, 128), (128, 128, 256), (256, 256, 512)
    )
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    dp_ratio: float = 0.0
    use_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    def _make_stack(self, widths, name, bn):
        from .vfe import MaskedBatchNorm

        denses = tuple(
            nn.Dense(int(w), use_bias=not bn, dtype=self.dtype,
                     param_dtype=jnp.float32, name=f"{name}_d{i}")
            for i, w in enumerate(widths)
        )
        bns = tuple(
            MaskedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            name=f"{name}_bn{i}")
            for i in range(len(widths))
        ) if bn else ()
        return denses, bns

    def setup(self):
        """All stacks are declared here (not in a compact __call__) so parity
        tests can drive sub-stages via apply(method=...) — mirroring the
        torch module's __init__-declared layers (pointrcnn_head.py:19-65)."""
        self.xyz_up_dense, self.xyz_up_bn = self._make_stack(
            self.xyz_up, "xyz_up", self.use_bn)
        self.merge_dense, self.merge_bn = self._make_stack(
            (self.xyz_up[-1],), "merge_down", self.use_bn)
        sa = tuple(self._make_stack(tuple(m), f"sa{li}", True)
                   for li, m in enumerate(self.sa_mlps))
        self.sa_dense = tuple(d for d, _ in sa)
        self.sa_bn = tuple(b for _, b in sa)
        self.cls_stack = make_fc_stack(tuple(self.cls_fc), 1, self.dp_ratio,
                                       dtype=self.dtype, name="cls_fc")
        self.reg_stack = make_fc_stack(tuple(self.reg_fc), 7, self.dp_ratio,
                                       dtype=self.dtype, name="reg_fc")

    def _mlp(self, x, mask, widths, name, train, bn=None):
        """bn=None honors USE_BN (xyz_up/merge_down, pointrcnn_head.py:
        19-32); the SA stacks pass bn=True — the reference's batch
        PointnetSAModuleMSG always builds Conv2d(bias=False)+BN2d+ReLU
        regardless of the flag (pointnet2_batch/pointnet2_modules.py:90-97).
        """
        if name == "xyz_up":
            denses, bns = self.xyz_up_dense, self.xyz_up_bn
        elif name == "merge_down":
            denses, bns = self.merge_dense, self.merge_bn
        else:
            li = int(name[2:])
            denses, bns = self.sa_dense[li], self.sa_bn[li]
        x = x.astype(self.dtype)
        for i, dense in enumerate(denses):
            x = dense(x)
            if bns:
                c = x.shape[-1]
                fm = jnp.broadcast_to(mask, x.shape[:-1]).reshape(-1)
                x = bns[i](x.reshape(-1, c), fm, train).reshape(x.shape)
            x = nn.relu(x)
        return x

    def __call__(self, local_xyz, prefix, feats, sample_valid, train: bool):
        """local_xyz (M, S, 3) canonical coords, prefix (M, S, 2)
        [detached score, normalized depth], feats (M, S, C), valid (M, S)."""
        from ..core import pointnet2 as P

        xyz_in = jnp.concatenate([local_xyz, prefix], -1).astype(self.dtype)
        xyz_f = self._mlp(xyz_in, sample_valid, self.xyz_up, "xyz_up", train)
        merged = jnp.concatenate([xyz_f, feats.astype(self.dtype)], -1)
        h = self._mlp(merged, sample_valid, (self.xyz_up[-1],),
                      "merge_down", train)

        xyz, v = local_xyz, sample_valid
        for li, (np_, rad, ns, mlp) in enumerate(zip(
                self.sa_npoints, self.sa_radii, self.sa_nsamples,
                self.sa_mlps)):
            if int(np_) > 0:
                def fps_one(x, vv, k=int(np_)):
                    idx = P.farthest_point_sample(x, vv, k)
                    return idx, vv[idx]

                idx, qv = jax.vmap(fps_one)(xyz, v)
                q = jnp.take_along_axis(xyz, idx[..., None], axis=1)

                def query_one(sx, sv, kp, kv, r=float(rad), n=int(ns)):
                    return P.ball_query(r, n, sx, sv, kp, kv)

                gi, has = jax.vmap(query_one)(xyz, v, q, qv)
                gx = jax.vmap(lambda x_, i_: jnp.take(x_, i_, axis=0))(
                    xyz, gi) - q[:, :, None, :]
                gf = jax.vmap(lambda f_, i_: jnp.take(f_, i_, axis=0))(h, gi)
                g = jnp.concatenate([gx, gf], -1)  # use_xyz=True
                m = has & qv
                g = self._mlp(g, m[..., None], tuple(mlp), f"sa{li}", train,
                              bn=True)
                g = jnp.where(m[..., None, None], g, -jnp.inf)
                h = jnp.max(g, axis=2)
                h = jnp.where(jnp.isfinite(h), h, 0.0)
                xyz, v = q, qv
            else:  # group_all
                g = jnp.concatenate([xyz, h], -1)
                g = self._mlp(g, v, tuple(mlp), f"sa{li}", train, bn=True)
                g = jnp.where(v[..., None], g, -jnp.inf)
                h = jnp.max(g, axis=1)
                h = jnp.where(jnp.isfinite(h), h, 0.0)

        cls = self.cls_stack(h, train)
        reg = self.reg_stack(h, train)
        return (cls[..., 0].astype(jnp.float32), reg.astype(jnp.float32))


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
        pool_cfg = rh.get("ROI_POINT_POOL", {})
        self.depth_normalizer = float(pool_cfg.get("DEPTH_NORMALIZER", 70.0))
        extra = pool_cfg.get("POOL_EXTRA_WIDTH", (0.0, 0.0, 0.0))
        # enlarge_box3d adds extra_width on each side (box_utils.py)
        self.pool_extra = 2.0 * float(max(extra))
        num_samples = int(pool_cfg.get(
            "NUM_SAMPLED_POINTS", rh.get("ROI_POINT_SAMPLES", 512)))
        sa = rh.get("SA_CONFIG", {})
        self.roi_head = PointRCNNRoIHead(
            num_samples=num_samples,
            xyz_up=tuple(rh.get("XYZ_UP_LAYER", (128, 128))),
            sa_npoints=tuple(sa.get("NPOINTS", (128, 32, -1))),
            sa_radii=tuple(sa.get("RADIUS", (0.2, 0.4, 100.0))),
            sa_nsamples=tuple(sa.get("NSAMPLE", (16, 16, 16))),
            sa_mlps=tuple(tuple(m) for m in sa.get(
                "MLPS", ((128, 128, 128), (128, 128, 256), (256, 256, 512)))),
            cls_fc=tuple(rh.get("CLS_FC", (256, 256))),
            reg_fc=tuple(rh.get("REG_FC", (256, 256))),
            dp_ratio=float(rh.get("DP_RATIO", 0.0)),
            use_bn=bool(rh.get("USE_BN", False)),
            dtype=self.dtype,
        )

    def _stage1(self, batch, train: bool):
        feats = self.backbone(batch.points, batch.points_valid, train)
        cls_logits, box_codes = self.point_head(feats, batch.points_valid, train)
        return feats, cls_logits, box_codes

    def _proposals(self, batch, cls_logits, box_codes, train: bool):
        """proposal_layer over decoded point boxes (roi_head_template.py:
        45-102; the detector's batch_box_preds/batch_cls_preds contract)."""
        pred_cls = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32) + 1
        boxes = point_decode(
            box_codes, batch.points[..., :3], pred_cls, self.mean_sizes
        )
        cls_scores = jnp.where(
            batch.points_valid[..., None], jax.nn.sigmoid(cls_logits), 0.0
        )
        nms_cfg = roi_head.resolve_nms_cfg(self.cfg.ROI_HEAD, train)
        return roi_head.proposal_layer(boxes, cls_scores, nms_cfg)

    def _pool_rois(self, batch, feats, cls_logits, rois, roi_valid):
        """roipool3d (pointrcnn_head.py:88-129): pooled features =
        [detached max cls score, depth/DEPTH_NORMALIZER - 0.5, backbone
        features], canonical-frame xyz."""
        score = jax.lax.stop_gradient(
            jnp.max(jax.nn.sigmoid(cls_logits), axis=-1)
        )
        depth = (jnp.linalg.norm(batch.points[..., :3], axis=-1)
                 / self.depth_normalizer - 0.5)
        pf = jnp.concatenate(
            [score[..., None], depth[..., None], feats], axis=-1
        )

        def pool_one(pts, f, pv, r, rv):
            return pool_roi_points(
                pts[..., :3], f, pv, r, rv, self.roi_head.num_samples,
                extra=self.pool_extra,
            )

        local_xyz, pooled, sample_valid = jax.vmap(pool_one)(
            batch.points, pf, batch.points_valid, rois, roi_valid
        )
        b, r = rois.shape[0], rois.shape[1]
        s = self.roi_head.num_samples
        return (local_xyz.reshape(b * r, s, 3),
                pooled[..., :2].reshape(b * r, s, 2),
                pooled[..., 2:].reshape(b * r, s, -1),
                sample_valid.reshape(b * r, s))

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

        # stage 2: proposal layer → ProposalTargetLayer → PointRCNNHead
        rois, roi_scores, roi_labels, _ = self._proposals(
            batch, jax.lax.stop_gradient(cls_logits),
            jax.lax.stop_gradient(box_codes), True,
        )
        rh_cfg = cfg.ROI_HEAD
        key = (self.make_rng("sampler") if self.has_rng("sampler")
               else jax.random.PRNGKey(0))
        tgt = roi_head.assign_roi_targets(
            key, rois, roi_labels, roi_scores, batch.gt_boxes,
            batch.gt_valid, roi_head_target_cfg(rh_cfg),
        )
        m = tgt["rois"].shape[1]
        roi_valid = jnp.ones((rois.shape[0], m), bool)
        b = rois.shape[0]
        local_xyz, prefix, roi_feats, sample_valid = self._pool_rois(
            batch, feats, cls_logits, tgt["rois"], roi_valid
        )
        rcnn_cls, rcnn_reg = self.roi_head(
            local_xyz, prefix, roi_feats, sample_valid, train
        )
        rcnn_loss, rtb = roi_head.roi_head_loss(
            rcnn_cls.reshape(b, m), rcnn_reg.reshape(b, m, 7), tgt,
            roi_head_loss_cfg(rh_cfg),
        )

        total = cls_loss + reg_loss + rcnn_loss
        tb = {
            "point_cls_loss": cls_loss,
            "point_reg_loss": reg_loss,
            "rcnn_cls_loss": rtb["rcnn_loss_cls"],
            "rcnn_reg_loss": rtb["rcnn_loss_reg_total"],
            "rpn_loss": total,
        }
        return total, tb

    def predict(self, batch):
        feats, cls_logits, box_codes = self._stage1(batch, train=False)
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            batch, cls_logits, box_codes, False
        )
        b, r = rois.shape[0], rois.shape[1]
        local_xyz, prefix, roi_feats, sample_valid = self._pool_rois(
            batch, feats, cls_logits, rois, roi_valid
        )
        rcnn_cls, rcnn_reg = self.roi_head(
            local_xyz, prefix, roi_feats, sample_valid, train=False
        )
        refined = roi_head.generate_predicted_boxes(
            rois[..., :7], rcnn_reg.reshape(b, r, 7)
        )
        scores = jnp.where(roi_valid, jax.nn.sigmoid(rcnn_cls.reshape(b, r)),
                           0.0)
        return roi_head.final_nms(
            refined, scores, roi_labels, roi_valid,
            self.cfg.get("POST_PROCESSING", {
                "SCORE_THRESH": 0.1,
                "NMS_CONFIG": {"NMS_PRE_MAXSIZE": 1024,
                               "NMS_POST_MAXSIZE": rois.shape[1],
                               "NMS_THRESH": 0.1},
            }),
        )
