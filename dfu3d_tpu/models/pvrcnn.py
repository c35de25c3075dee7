"""PV-RCNN: point-voxel two-stage detector.

Reference: pcdet/models/detectors/pv_rcnn.py + pfe/voxel_set_abstraction.py
(VSA, 411 LoC) + dense_heads/point_head_simple.py + roi_heads/pvrcnn_head.py.

Capability re-design on this repo's primitives:

* **VoxelSetAbstraction**: FPS keypoints from raw points; per-source set
  abstraction — raw points, each sparse encoder stage's voxel centers (SURVEY
  N5's voxel_query expressed as ball query over active-voxel centers), and
  bilinear BEV interpolation — concatenated and fused by an MLP (the VSA
  fusion layer).
* **Predicted Keypoint Weighting**: PointHeadSimple foreground segmentation on
  keypoints; predicted fg scores gate keypoint features (pv_rcnn.py PKW).
* **PVRCNNHead**: RoI 6³ grid points aggregated from keypoints by ball query
  + shared MLP + maxpool, FC cls/reg refinement. RoI subsampling is replaced
  by masked loss weighting (static shapes), as in the other RoI heads here.
* RPN: anchor head over height-compressed encoder BEV features (shared
  AnchorDetectorBase machinery).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core import pointnet2 as P
from ..core.geometry.boxes import points_in_boxes, rotate_points_along_z
from ..core.geometry.iou import pairwise_iou3d
from ..core.geometry.nms import nms_bev
from ..core.voxel import VoxelGrid, dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from . import losses
from .anchor_head import decode_anchor_predictions, decode_boxes, encode_boxes
from .pointnet2_backbone import SharedMLP
from .pointpillar import AnchorDetectorBase
from .sparse_backbone import (
    SparseEncoder,
    SparseTensor,
    height_compression,
    voxel_centers_of,
)


class SAFromSource(nn.Module):
    """Ball-query set abstraction of keypoints from an arbitrary point source."""

    radius: float
    nsample: int
    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, keypoints, kp_valid, src_xyz, src_feats, src_valid,
                 train: bool):
        """keypoints (B, K, 3); src_xyz (B, N, 3); src_feats (B, N, C)|None."""

        def query_one(sx, sv, kp, kv):
            return P.ball_query(self.radius, self.nsample, sx, sv, kp, kv)

        idx, has = jax.vmap(query_one)(src_xyz, src_valid, keypoints, kp_valid)
        grouped_xyz = jax.vmap(lambda x, i: jnp.take(x, i, axis=0))(src_xyz, idx)
        grouped_xyz = grouped_xyz - keypoints[:, :, None, :]
        if src_feats is not None:
            grouped_f = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(src_feats, idx)
            grouped = jnp.concatenate([grouped_xyz, grouped_f], axis=-1)
        else:
            grouped = grouped_xyz
        m = has & kp_valid
        g = SharedMLP(self.mlp, dtype=self.dtype)(
            grouped.astype(self.dtype), m[..., None, None], train
        )
        g = jnp.where(m[..., None, None], g, -jnp.inf)
        pooled = jnp.max(g, axis=2)
        return jnp.where(jnp.isfinite(pooled), pooled, 0.0)


class PVRCNN(AnchorDetectorBase):
    max_voxels: int = 16000
    num_keypoints: int = 2048

    def setup(self):
        cfg = self.cfg
        nx, ny, nz = self.grid.grid_size
        bb3d = cfg.get("BACKBONE_3D", {})
        self.encoder = SparseEncoder(
            grid=SparseGrid(nx, ny, nz),
            voxel_cap=self.max_voxels,
            channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
            out_channels=bb3d.get("OUT_CHANNELS", 128),
            dtype=self.dtype,
        )
        pfe = cfg.get("PFE", {})
        self.kp = int(pfe.get("NUM_KEYPOINTS", self.num_keypoints))
        mlp = tuple(pfe.get("SA_MLP", (16, 16)))
        self.sa_raw = SAFromSource(
            radius=float(pfe.get("RAW_RADIUS", 0.8)),
            nsample=int(pfe.get("NSAMPLE", 16)), mlp=mlp, dtype=self.dtype,
            name="sa_raw",
        )
        self.sa_stages = [
            SAFromSource(
                radius=float(r), nsample=int(pfe.get("NSAMPLE", 16)), mlp=mlp,
                dtype=self.dtype, name=f"sa_stage{i}",
            )
            for i, r in enumerate(pfe.get("STAGE_RADII", (0.4, 0.8, 1.6, 3.2)))
        ]
        self.vsa_fusion = SharedMLP(
            tuple(pfe.get("FUSION_MLP", (128,))), dtype=self.dtype,
            name="vsa_fusion",
        )
        self.seg_out = nn.Dense(1, param_dtype=jnp.float32, name="kp_seg")
        rh = cfg.get("ROI_HEAD", {})
        self.num_rois = int(rh.get("NMS_POST_MAXSIZE", 64))
        self.roi_pre_max = int(rh.get("NMS_PRE_MAXSIZE", 1024))
        self.roi_nms_thresh = float(rh.get("NMS_THRESH", 0.8))
        self.roi_grid = int(rh.get("GRID_SIZE", 6))
        self.grid_sa = SAFromSource(
            radius=float(rh.get("GRID_RADIUS", 0.8)),
            nsample=int(rh.get("GRID_NSAMPLE", 16)),
            mlp=tuple(rh.get("GRID_MLP", (64, 64))), dtype=self.dtype,
            name="grid_sa",
        )
        self.roi_fc = SharedMLP(tuple(rh.get("FC", (128, 128))),
                                dtype=self.dtype, name="roi_fc")
        self.roi_cls = nn.Dense(1, param_dtype=jnp.float32, name="roi_cls")
        self.roi_reg = nn.Dense(7, param_dtype=jnp.float32, name="roi_reg")
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

    # --- forward pieces ---

    def _backbone(self, batch, train: bool):
        def voxelize_one(points, valid):
            vox = dynamic_voxelize(self.grid, points, valid, self.max_voxels)
            sums = jax.ops.segment_sum(
                jnp.where(valid[:, None], points, 0.0),
                vox.point_to_voxel, num_segments=self.max_voxels,
            )
            counts = jax.ops.segment_sum(
                valid.astype(jnp.float32), vox.point_to_voxel,
                num_segments=self.max_voxels,
            )
            return sums / jnp.maximum(counts, 1.0)[:, None], vox.voxel_coords, vox.voxel_valid

        feats, coords, valid = jax.vmap(voxelize_one)(
            batch.points, batch.points_valid
        )
        bev_st, stages = self.encoder(feats, coords, valid, train)
        bev = height_compression(bev_st).astype(self.dtype)
        spatial = self.backbone_2d(bev, train)
        rpn_preds = self.dense_head(spatial)
        return rpn_preds, bev, stages

    def _features(self, batch, train: bool):
        return self._backbone(batch, train)[0]

    def _keypoint_features(self, batch, bev, stages, train: bool):
        """VSA: keypoints + fused multi-source features + fg logits."""
        xyz = batch.points[..., :3]

        def fps_one(x, v):
            idx = P.farthest_point_sample(x, v, self.kp)
            return idx, v[idx]

        kp_idx, kp_valid = jax.vmap(fps_one)(xyz, batch.points_valid)
        keypoints = jnp.take_along_axis(xyz, kp_idx[..., None], axis=1)

        parts = [
            self.sa_raw(
                keypoints, kp_valid, xyz,
                batch.points[..., 3:] if batch.points.shape[-1] > 3 else None,
                batch.points_valid, train,
            )
        ]
        for i, (sa, st) in enumerate(zip(self.sa_stages, stages)):
            stride = [1, 2, 4, 8][i]
            centers = voxel_centers_of(
                st, self.grid.grid_size, self.grid.point_cloud_range,
                self.grid.voxel_size, stride,
            )
            parts.append(
                sa(keypoints, kp_valid, centers,
                   st.features.astype(jnp.float32), st.valid, train)
            )
        # bilinear BEV interpolation at keypoint xy (stride-8 BEV grid)
        pcr = jnp.asarray(self.grid.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.grid.voxel_size, jnp.float32) * 8.0
        u = (keypoints[..., 0] - pcr[0]) / vs[0] - 0.5
        v = (keypoints[..., 1] - pcr[1]) / vs[1] - 0.5
        h, w = bev.shape[1], bev.shape[2]
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
        du = jnp.clip(u - u0, 0.0, 1.0)[..., None]
        dv = jnp.clip(v - v0, 0.0, 1.0)[..., None]

        def bil_one(img, vv0, uu0, dvv, duu):
            f00 = img[vv0, uu0]
            f01 = img[vv0, uu0 + 1]
            f10 = img[vv0 + 1, uu0]
            f11 = img[vv0 + 1, uu0 + 1]
            return (
                f00 * (1 - dvv) * (1 - duu) + f01 * (1 - dvv) * duu
                + f10 * dvv * (1 - duu) + f11 * dvv * duu
            )

        parts.append(
            jax.vmap(bil_one)(bev.astype(jnp.float32), v0, u0, dv, du)
        )
        fused = self.vsa_fusion(
            jnp.concatenate(parts, axis=-1).astype(self.dtype),
            kp_valid[..., None], train,
        )
        seg_logits = self.seg_out(fused)[..., 0].astype(jnp.float32)
        # Predicted Keypoint Weighting
        weighted = fused * jax.nn.sigmoid(seg_logits)[..., None]
        return keypoints, kp_valid, weighted, seg_logits

    def _roi_grid_pool(self, rois, roi_valid, keypoints, kp_valid, kp_feats,
                       train: bool):
        """6³ grid points per RoI aggregated from keypoints (pvrcnn_head)."""
        g = self.roi_grid
        lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
        gz, gy, gx = jnp.meshgrid(lin, lin, lin, indexing="ij")
        unit = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (g³, 3)

        def grid_one(r):
            local = unit[None, :, :] * r[:, None, 3:6]  # (R, g³, 3)
            rot = rotate_points_along_z(local, r[:, 6])
            return rot + r[:, None, 0:3]

        grid_pts = jax.vmap(grid_one)(rois)  # (B, R, g³, 3)
        b, r = grid_pts.shape[0], grid_pts.shape[1]
        flat_pts = grid_pts.reshape(b, r * g ** 3, 3)
        flat_valid = jnp.repeat(roi_valid, g ** 3, axis=1)
        pooled = self.grid_sa(
            flat_pts, flat_valid, keypoints, kp_feats, kp_valid, train
        )  # (B, R*g³, C)
        pooled = pooled.reshape(b, r, g ** 3 * pooled.shape[-1])
        h = self.roi_fc(pooled, roi_valid[..., None], train)
        cls = self.roi_cls(h)[..., 0].astype(jnp.float32)
        reg = self.roi_reg(h).astype(jnp.float32)
        return cls, reg

    def _proposals(self, rpn_preds):
        boxes, cls_scores = decode_anchor_predictions(
            rpn_preds, jnp.asarray(self._anchors_flat), len(self.class_names)
        )
        scores = jnp.max(cls_scores, axis=-1)

        def one(bx, sc):
            sel, keep = nms_bev(
                bx, sc, self.roi_nms_thresh,
                pre_max=min(self.roi_pre_max, bx.shape[0]),
                post_max=self.num_rois,
            )
            return bx[sel], jnp.where(keep, sc[sel], 0.0), keep

        return jax.vmap(one)(jax.lax.stop_gradient(boxes),
                             jax.lax.stop_gradient(scores))

    def __call__(self, batch, train: bool = True):
        from .anchor_head import anchor_head_loss

        rpn_preds, bev, stages = self._backbone(batch, train)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        lw = self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        total, tb = anchor_head_loss(
            rpn_preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {"cls_weight": lw["cls_weight"], "loc_weight": lw["loc_weight"],
             "dir_weight": lw.get("dir_weight", 0.2),
             "code_weights": lw.get("code_weights", None)},
        )

        keypoints, kp_valid, kp_feats, seg_logits = self._keypoint_features(
            batch, bev, stages, train
        )
        # keypoint segmentation loss (PointHeadSimple)
        def seg_tgt_one(kp, kv, gt, gv):
            inside = points_in_boxes(kp, gt[:, :7]) & gv[None, :]
            return jnp.any(inside, axis=1) & kv

        fg = jax.vmap(seg_tgt_one)(
            keypoints, kp_valid, batch.gt_boxes, batch.gt_valid
        )
        w = kp_valid.astype(jnp.float32)
        w = w / jnp.maximum(jnp.sum(w), 1.0)
        seg_t = fg.astype(jnp.float32)
        bce = jnp.clip(seg_logits, 0) - seg_logits * seg_t + jnp.log1p(
            jnp.exp(-jnp.abs(seg_logits))
        )
        seg_loss = jnp.sum(bce * w)

        rois, roi_scores, roi_valid = self._proposals(rpn_preds)
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            rois, roi_valid, keypoints, kp_valid, kp_feats, train
        )

        def roi_iou_one(rr, rv, gt, gv):
            iou = pairwise_iou3d(rr[:, :7], gt[:, :7])
            iou = jnp.where(gv[None, :], iou, -1.0)
            return jnp.max(iou, axis=1), gt[jnp.argmax(iou, axis=1)]

        roi_iou, roi_gt = jax.vmap(roi_iou_one)(
            rois, roi_valid, batch.gt_boxes, batch.gt_valid
        )
        cls_t = jnp.where(roi_iou > 0.6, 1.0, 0.0)
        cls_cared = ((roi_iou > 0.6) | (roi_iou < 0.45)) & roi_valid
        rbce = jnp.clip(rcnn_cls, 0) - rcnn_cls * cls_t + jnp.log1p(
            jnp.exp(-jnp.abs(rcnn_cls))
        )
        rcnn_cls_loss = jnp.sum(rbce * cls_cared) / jnp.maximum(
            jnp.sum(cls_cared), 1.0
        )
        reg_mask = (roi_iou > 0.55) & roi_valid
        reg_t = encode_boxes(roi_gt[..., :7], rois[..., :7])
        rw = reg_mask.astype(jnp.float32)
        rw = rw / jnp.maximum(jnp.sum(rw, axis=1, keepdims=True), 1.0)
        rcnn_reg_loss = jnp.sum(
            losses.weighted_smooth_l1(rcnn_reg, reg_t, rw)
        ) / batch.points.shape[0]

        total = total + seg_loss + rcnn_cls_loss + rcnn_reg_loss
        tb.update(
            {"kp_seg_loss": seg_loss, "rcnn_cls_loss": rcnn_cls_loss,
             "rcnn_reg_loss": rcnn_reg_loss, "rpn_loss": total}
        )
        return total, tb

    def predict(self, batch):
        rpn_preds, bev, stages = self._backbone(batch, train=False)
        keypoints, kp_valid, kp_feats, _ = self._keypoint_features(
            batch, bev, stages, train=False
        )
        rois, roi_scores, roi_valid = self._proposals(rpn_preds)
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            rois, roi_valid, keypoints, kp_valid, kp_feats, train=False
        )
        refined = decode_boxes(rcnn_reg, rois[..., :7])
        scores = jax.nn.sigmoid(rcnn_cls) * roi_scores
        scores = jnp.where(roi_valid, scores, 0.0)
        labels = jnp.ones_like(scores, dtype=jnp.int32)
        return refined, scores, labels, roi_valid


class VPFromSource(nn.Module):
    """VectorPool aggregation of query points from an arbitrary point source
    (PV-RCNN++'s replacement for ball-query SA; reference
    pointnet2_stack/voxel_pool_modules.py VectorPoolAggregationModule)."""

    radius: float
    nsample: int
    bins: Sequence[int] = (3, 3, 3)
    mlp: Sequence[int] = (32,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, q_valid, src_xyz, src_feats, src_valid, train):
        def one(q, qv, sx, sv, sf):
            return P.vector_pool(
                q, qv, sx, sv, sf, self.radius, self.nsample, tuple(self.bins)
            )

        if src_feats is None:
            pooled, has = jax.vmap(lambda q, qv, sx, sv: one(q, qv, sx, sv, None))(
                queries, q_valid, src_xyz, src_valid
            )
        else:
            pooled, has = jax.vmap(one)(
                queries, q_valid, src_xyz, src_valid, src_feats
            )
        m = has & q_valid
        out = SharedMLP(self.mlp, dtype=self.dtype)(
            pooled.astype(self.dtype), m[..., None], train
        )
        return jnp.where(m[..., None], out, 0.0)


class PVRCNNPlusPlus(PVRCNN):
    """PV-RCNN++ (reference pv_rcnn_plusplus.py): proposal-centric keypoint
    sampling + VectorPool aggregation in both the VSA and the RoI grid head.

    Deviations (documented): sectorized FPS is expressed as plain FPS over
    the proposal-neighborhood mask (the sector split is a GPU load-balancing
    device, not a semantic one); vector pools use avg-per-bin aggregation.
    """

    def setup(self):
        cfg = self.cfg
        nx, ny, nz = self.grid.grid_size
        bb3d = cfg.get("BACKBONE_3D", {})
        self.encoder = SparseEncoder(
            grid=SparseGrid(nx, ny, nz),
            voxel_cap=self.max_voxels,
            channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
            out_channels=bb3d.get("OUT_CHANNELS", 128),
            dtype=self.dtype,
        )
        pfe = cfg.get("PFE", {})
        self.kp = int(pfe.get("NUM_KEYPOINTS", self.num_keypoints))
        self.kp_roi_radius = float(pfe.get("SPC_RADIUS", 2.4))
        bins = tuple(pfe.get("VP_BINS", (3, 3, 3)))
        mlp = tuple(pfe.get("SA_MLP", (16, 16)))
        ns = int(pfe.get("NSAMPLE", 16))
        self.sa_raw = VPFromSource(
            radius=float(pfe.get("RAW_RADIUS", 0.8)), nsample=ns, bins=bins,
            mlp=mlp, dtype=self.dtype, name="vp_raw",
        )
        self.sa_stages = [
            VPFromSource(radius=float(r), nsample=ns, bins=bins, mlp=mlp,
                         dtype=self.dtype, name=f"vp_stage{i}")
            for i, r in enumerate(pfe.get("STAGE_RADII", (0.4, 0.8, 1.6, 3.2)))
        ]
        self.vsa_fusion = SharedMLP(
            tuple(pfe.get("FUSION_MLP", (128,))), dtype=self.dtype,
            name="vsa_fusion",
        )
        self.seg_out = nn.Dense(1, param_dtype=jnp.float32, name="kp_seg")
        rh = cfg.get("ROI_HEAD", {})
        self.num_rois = int(rh.get("NMS_POST_MAXSIZE", 64))
        self.roi_pre_max = int(rh.get("NMS_PRE_MAXSIZE", 1024))
        self.roi_nms_thresh = float(rh.get("NMS_THRESH", 0.8))
        self.roi_grid = int(rh.get("GRID_SIZE", 6))
        self.grid_sa = VPFromSource(
            radius=float(rh.get("GRID_RADIUS", 0.8)),
            nsample=int(rh.get("GRID_NSAMPLE", 16)),
            bins=tuple(rh.get("VP_BINS", (2, 2, 2))),
            mlp=tuple(rh.get("GRID_MLP", (64, 64))), dtype=self.dtype,
            name="grid_vp",
        )
        self.roi_fc = SharedMLP(tuple(rh.get("FC", (128, 128))),
                                dtype=self.dtype, name="roi_fc")
        self.roi_cls = nn.Dense(1, param_dtype=jnp.float32, name="roi_cls")
        self.roi_reg = nn.Dense(7, param_dtype=jnp.float32, name="roi_reg")
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

    def _keypoint_features(self, batch, bev, stages, train: bool, rois=None,
                           roi_valid=None):
        """Proposal-centric sampling: FPS restricted to points within
        SPC_RADIUS of a proposal center (pv_rcnn_plusplus.py
        sample_points_with_roi), then the standard VSA fusion."""
        xyz = batch.points[..., :3]
        pv = batch.points_valid
        if rois is not None:
            def near_one(x, v, rr, rv):
                d2 = jnp.sum((x[:, None, :] - rr[None, :, 0:3]) ** 2, axis=-1)
                d2 = jnp.where(rv[None, :], d2, jnp.inf)
                near = jnp.min(d2, axis=1) < self.kp_roi_radius**2
                # fall back to all points when no proposal survives
                return v & jnp.where(jnp.any(rv), near, True)

            pv = jax.vmap(near_one)(xyz, pv, rois, roi_valid)

        def fps_one(x, v):
            idx = P.farthest_point_sample(x, v, self.kp)
            return idx, v[idx]

        kp_idx, kp_valid = jax.vmap(fps_one)(xyz, pv)
        keypoints = jnp.take_along_axis(xyz, kp_idx[..., None], axis=1)
        return self._fuse_keypoints(batch, keypoints, kp_valid, bev, stages,
                                    train)

    def _fuse_keypoints(self, batch, keypoints, kp_valid, bev, stages, train):
        xyz = batch.points[..., :3]
        parts = [
            self.sa_raw(
                keypoints, kp_valid, xyz,
                batch.points[..., 3:] if batch.points.shape[-1] > 3 else None,
                batch.points_valid, train,
            )
        ]
        for i, (sa, st) in enumerate(zip(self.sa_stages, stages)):
            stride = [1, 2, 4, 8][i]
            centers = voxel_centers_of(
                st, self.grid.grid_size, self.grid.point_cloud_range,
                self.grid.voxel_size, stride,
            )
            parts.append(
                sa(keypoints, kp_valid, centers,
                   st.features.astype(jnp.float32), st.valid, train)
            )
        pcr = jnp.asarray(self.grid.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.grid.voxel_size, jnp.float32) * 8.0
        u = (keypoints[..., 0] - pcr[0]) / vs[0] - 0.5
        v = (keypoints[..., 1] - pcr[1]) / vs[1] - 0.5
        h, w = bev.shape[1], bev.shape[2]
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
        du = jnp.clip(u - u0, 0.0, 1.0)[..., None]
        dv = jnp.clip(v - v0, 0.0, 1.0)[..., None]

        def bil_one(img, vv0, uu0, dvv, duu):
            f00 = img[vv0, uu0]
            f01 = img[vv0, uu0 + 1]
            f10 = img[vv0 + 1, uu0]
            f11 = img[vv0 + 1, uu0 + 1]
            return (
                f00 * (1 - dvv) * (1 - duu) + f01 * (1 - dvv) * duu
                + f10 * dvv * (1 - duu) + f11 * dvv * duu
            )

        parts.append(jax.vmap(bil_one)(bev.astype(jnp.float32), v0, u0, dv, du))
        fused = self.vsa_fusion(
            jnp.concatenate(parts, axis=-1).astype(self.dtype),
            kp_valid[..., None], train,
        )
        seg_logits = self.seg_out(fused)[..., 0].astype(jnp.float32)
        weighted = fused * jax.nn.sigmoid(seg_logits)[..., None]
        return keypoints, kp_valid, weighted, seg_logits

    def __call__(self, batch, train: bool = True):
        from .anchor_head import anchor_head_loss

        rpn_preds, bev, stages = self._backbone(batch, train)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        lw = self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        total, tb = anchor_head_loss(
            rpn_preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {"cls_weight": lw["cls_weight"], "loc_weight": lw["loc_weight"],
             "dir_weight": lw.get("dir_weight", 0.2),
             "code_weights": lw.get("code_weights", None)},
        )
        # proposals FIRST (keypoints are proposal-centric in ++)
        rois, roi_scores, roi_valid = self._proposals(rpn_preds)
        keypoints, kp_valid, kp_feats, seg_logits = self._keypoint_features(
            batch, bev, stages, train, rois=rois, roi_valid=roi_valid
        )

        def seg_tgt_one(kp, kv, gt, gv):
            inside = points_in_boxes(kp, gt[:, :7]) & gv[None, :]
            return jnp.any(inside, axis=1) & kv

        fg = jax.vmap(seg_tgt_one)(
            keypoints, kp_valid, batch.gt_boxes, batch.gt_valid
        )
        w = kp_valid.astype(jnp.float32)
        w = w / jnp.maximum(jnp.sum(w), 1.0)
        seg_t = fg.astype(jnp.float32)
        bce = jnp.clip(seg_logits, 0) - seg_logits * seg_t + jnp.log1p(
            jnp.exp(-jnp.abs(seg_logits))
        )
        seg_loss = jnp.sum(bce * w)

        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            rois, roi_valid, keypoints, kp_valid, kp_feats, train
        )

        def roi_iou_one(rr, rv, gt, gv):
            iou = pairwise_iou3d(rr[:, :7], gt[:, :7])
            iou = jnp.where(gv[None, :], iou, -1.0)
            return jnp.max(iou, axis=1), gt[jnp.argmax(iou, axis=1)]

        roi_iou, roi_gt = jax.vmap(roi_iou_one)(
            rois, roi_valid, batch.gt_boxes, batch.gt_valid
        )
        cls_t = jnp.where(roi_iou > 0.6, 1.0, 0.0)
        cls_cared = ((roi_iou > 0.6) | (roi_iou < 0.45)) & roi_valid
        rbce = jnp.clip(rcnn_cls, 0) - rcnn_cls * cls_t + jnp.log1p(
            jnp.exp(-jnp.abs(rcnn_cls))
        )
        rcnn_cls_loss = jnp.sum(rbce * cls_cared) / jnp.maximum(
            jnp.sum(cls_cared), 1.0
        )
        reg_mask = (roi_iou > 0.55) & roi_valid
        reg_t = encode_boxes(roi_gt[..., :7], rois[..., :7])
        rw = reg_mask.astype(jnp.float32)
        rw = rw / jnp.maximum(jnp.sum(rw, axis=1, keepdims=True), 1.0)
        rcnn_reg_loss = jnp.sum(
            losses.weighted_smooth_l1(rcnn_reg, reg_t, rw)
        ) / batch.points.shape[0]

        total = total + seg_loss + rcnn_cls_loss + rcnn_reg_loss
        tb.update(
            {"kp_seg_loss": seg_loss, "rcnn_cls_loss": rcnn_cls_loss,
             "rcnn_reg_loss": rcnn_reg_loss, "rpn_loss": total}
        )
        return total, tb

    def predict(self, batch):
        rpn_preds, bev, stages = self._backbone(batch, train=False)
        rois, roi_scores, roi_valid = self._proposals(rpn_preds)
        keypoints, kp_valid, kp_feats, _ = self._keypoint_features(
            batch, bev, stages, train=False, rois=rois, roi_valid=roi_valid
        )
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            rois, roi_valid, keypoints, kp_valid, kp_feats, train=False
        )
        refined = decode_boxes(rcnn_reg, rois[..., :7])
        scores = jax.nn.sigmoid(rcnn_cls) * roi_scores
        scores = jnp.where(roi_valid, scores, 0.0)
        labels = jnp.ones_like(scores, dtype=jnp.int32)
        return refined, scores, labels, roi_valid
