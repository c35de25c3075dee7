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
* **PVRCNNHead**: the reference-exact head via models/roi_head.py — RoI 6³
  grid points aggregated from keypoints by multi-scale ball-query SA
  (ROI_GRID_POOL MLPS/POOL_RADIUS/NSAMPLE), channel-major flattened
  SHARED_FC → CLS_FC/REG_FC refinement, ProposalTargetLayer subsampling to
  ROI_PER_IMAGE with soft roi_iou labels, canonical reg targets + corner
  loss, canonical decode + post-processing NMS.
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
from ..core.geometry.boxes import points_in_boxes
from ..core.voxel import VoxelGrid, dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from . import roi_head
from .anchor_head import decode_anchor_predictions
from .pointnet2_backbone import SharedMLP
from .pointpillar import AnchorDetectorBase
from .roi_head import make_fc_stack, roi_head_loss_cfg, roi_head_target_cfg, shared_fc_stack
from .sparse_backbone import (
    SparseEncoder,
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
        pool_cfg = rh.get("ROI_GRID_POOL", None)
        if pool_cfg is not None and "POOL_RADIUS" in pool_cfg:
            # reference PVRCNNHead schema (pv_rcnn.yaml ROI_GRID_POOL:
            # MLPS / POOL_RADIUS / NSAMPLE, one SA group per radius)
            self.roi_grid = int(pool_cfg.get("GRID_SIZE", 6))
            self.grid_sa = [
                SAFromSource(radius=float(r), nsample=int(n), mlp=tuple(m),
                             dtype=self.dtype, name=f"grid_sa{i}")
                for i, (r, n, m) in enumerate(zip(
                    pool_cfg["POOL_RADIUS"], pool_cfg["NSAMPLE"],
                    pool_cfg["MLPS"]))
            ]
        else:  # legacy compact schema
            self.roi_grid = int(rh.get("GRID_SIZE", 6))
            self.grid_sa = [SAFromSource(
                radius=float(rh.get("GRID_RADIUS", 0.8)),
                nsample=int(rh.get("GRID_NSAMPLE", 16)),
                mlp=tuple(rh.get("GRID_MLP", (64, 64))), dtype=self.dtype,
                name="grid_sa",
            )]
        self.grid_msg = None
        self._setup_roi_fc(rh)
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

    def _setup_roi_fc(self, rh):
        """SHARED_FC tower + CLS_FC/REG_FC make_fc_layers (pvrcnn_head.py:
        20-42: dropout between SHARED_FC blocks, pred conv included in the
        cls/reg stacks)."""
        dp = float(rh.get("DP_RATIO", 0.3))
        self.shared_fc = shared_fc_stack(
            tuple(rh.get("SHARED_FC", rh.get("FC", (256, 256)))), dp,
            dtype=self.dtype, name="shared_fc")
        self.cls_fc = make_fc_stack(tuple(rh.get("CLS_FC", (256, 256))), 1,
                                    dp, dtype=self.dtype, name="cls_fc")
        self.reg_fc = make_fc_stack(tuple(rh.get("REG_FC", (256, 256))), 7,
                                    dp, dtype=self.dtype, name="reg_fc")

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
        """G³ grid points per RoI ← multi-scale ball-query SA over keypoints
        (pvrcnn_head.py roi_grid_pool:65-112), channel-major flatten matching
        `pooled.permute(0, 2, 1).view(N, C·g³, 1)` (forward:154-158), then
        SHARED_FC → CLS_FC/REG_FC refinement."""
        g = self.roi_grid
        grid_pts = roi_head.global_grid_points(rois[..., :7], g)
        b, r = grid_pts.shape[0], grid_pts.shape[1]
        flat_pts = grid_pts.reshape(b, r * g ** 3, 3)
        flat_valid = jnp.repeat(roi_valid, g ** 3, axis=1)
        parts = [
            sa(flat_pts, flat_valid, keypoints, kp_feats, kp_valid, train)
            for sa in self.grid_sa
        ]
        pooled = jnp.concatenate(parts, axis=-1)  # (B, R·g³, ΣC)
        if self.grid_msg is not None:
            pooled = self.grid_msg(pooled, flat_valid[..., None], train)
        c = pooled.shape[-1]
        pooled = pooled.reshape(b * r, g ** 3, c)
        pooled = jnp.swapaxes(pooled, 1, 2).reshape(b * r, c * g ** 3)
        h = self.shared_fc(pooled, train)
        cls = self.cls_fc(h, train)
        reg = self.reg_fc(h, train)
        return (cls.reshape(b, r).astype(jnp.float32),
                reg.reshape(b, r, 7).astype(jnp.float32))

    def _proposals(self, rpn_preds, train: bool):
        boxes, cls_scores = decode_anchor_predictions(
            rpn_preds, jnp.asarray(self._anchors_flat), len(self.class_names)
        )
        nms_cfg = roi_head.resolve_nms_cfg(self.cfg.get("ROI_HEAD", {}),
                                           train)
        return roi_head.proposal_layer(boxes, cls_scores, nms_cfg)

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

        rois, roi_scores, roi_labels, _ = self._proposals(rpn_preds, True)
        rh_cfg = self.cfg.get("ROI_HEAD", {})
        key = (self.make_rng("sampler") if self.has_rng("sampler")
               else jax.random.PRNGKey(0))
        tgt = roi_head.assign_roi_targets(
            key, rois, roi_labels, roi_scores, batch.gt_boxes,
            batch.gt_valid, roi_head_target_cfg(rh_cfg),
        )
        m = tgt["rois"].shape[1]
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            tgt["rois"], jnp.ones((rois.shape[0], m), bool),
            keypoints, kp_valid, kp_feats, train,
        )
        rcnn_loss, rtb = roi_head.roi_head_loss(
            rcnn_cls, rcnn_reg, tgt, roi_head_loss_cfg(rh_cfg)
        )

        total = total + seg_loss + rcnn_loss
        tb.update(
            {"kp_seg_loss": seg_loss,
             "rcnn_cls_loss": rtb["rcnn_loss_cls"],
             "rcnn_reg_loss": rtb["rcnn_loss_reg_total"],
             "rpn_loss": total}
        )
        return total, tb

    def predict(self, batch):
        rpn_preds, bev, stages = self._backbone(batch, train=False)
        keypoints, kp_valid, kp_feats, _ = self._keypoint_features(
            batch, bev, stages, train=False
        )
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            rpn_preds, False
        )
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            rois, roi_valid, keypoints, kp_valid, kp_feats, train=False
        )
        refined = roi_head.generate_predicted_boxes(rois[..., :7], rcnn_reg)
        scores = jnp.where(roi_valid, jax.nn.sigmoid(rcnn_cls), 0.0)
        return roi_head.final_nms(
            refined, scores, roi_labels, roi_valid, self.cfg.POST_PROCESSING
        )


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
        pool_cfg = rh.get("ROI_GRID_POOL", None)
        if pool_cfg is not None and "NUM_GROUPS" in pool_cfg:
            # reference VectorPoolAggregationModuleMSG schema
            # (pv_rcnn_plusplus yaml ROI_GRID_POOL: GROUP_CFG_i with
            # NUM_LOCAL_VOXEL / MAX_NEIGHBOR_DISTANCE / NEIGHBOR_NSAMPLE /
            # POST_MLPS, fused by MSG_POST_MLPS)
            self.roi_grid = int(pool_cfg.get("GRID_SIZE", 6))
            groups = []
            for i in range(int(pool_cfg["NUM_GROUPS"])):
                g_cfg = pool_cfg[f"GROUP_CFG_{i}"]
                ns = int(g_cfg.get("NEIGHBOR_NSAMPLE", 32))
                groups.append(VPFromSource(
                    radius=float(g_cfg["MAX_NEIGHBOR_DISTANCE"]),
                    nsample=ns if ns > 0 else 32,
                    bins=tuple(g_cfg["NUM_LOCAL_VOXEL"]),
                    mlp=tuple(g_cfg["POST_MLPS"]), dtype=self.dtype,
                    name=f"grid_vp{i}",
                ))
            self.grid_sa = groups
            self.grid_msg = SharedMLP(
                tuple(pool_cfg["MSG_POST_MLPS"]), dtype=self.dtype,
                name="grid_msg",
            ) if pool_cfg.get("MSG_POST_MLPS") else None
        else:  # legacy compact schema
            self.roi_grid = int(rh.get("GRID_SIZE", 6))
            self.grid_sa = [VPFromSource(
                radius=float(rh.get("GRID_RADIUS", 0.8)),
                nsample=int(rh.get("GRID_NSAMPLE", 16)),
                bins=tuple(rh.get("VP_BINS", (2, 2, 2))),
                mlp=tuple(rh.get("GRID_MLP", (64, 64))), dtype=self.dtype,
                name="grid_vp",
            )]
            self.grid_msg = None
        self._setup_roi_fc(rh)
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
        # proposals FIRST (keypoints are proposal-centric in ++); train-time
        # keypoints sample around the SUBSAMPLED rois, matching the
        # reference's assign_targets → batch_dict['rois'] update before PFE
        # (pv_rcnn_plusplus.py forward)
        rois, roi_scores, roi_labels, _ = self._proposals(rpn_preds, True)
        rh_cfg = self.cfg.get("ROI_HEAD", {})
        key = (self.make_rng("sampler") if self.has_rng("sampler")
               else jax.random.PRNGKey(0))
        tgt = roi_head.assign_roi_targets(
            key, rois, roi_labels, roi_scores, batch.gt_boxes,
            batch.gt_valid, roi_head_target_cfg(rh_cfg),
        )
        m = tgt["rois"].shape[1]
        roi_valid = jnp.ones((rois.shape[0], m), bool)
        keypoints, kp_valid, kp_feats, seg_logits = self._keypoint_features(
            batch, bev, stages, train, rois=tgt["rois"], roi_valid=roi_valid
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
            tgt["rois"], roi_valid, keypoints, kp_valid, kp_feats, train
        )
        rcnn_loss, rtb = roi_head.roi_head_loss(
            rcnn_cls, rcnn_reg, tgt, roi_head_loss_cfg(rh_cfg)
        )

        total = total + seg_loss + rcnn_loss
        tb.update(
            {"kp_seg_loss": seg_loss,
             "rcnn_cls_loss": rtb["rcnn_loss_cls"],
             "rcnn_reg_loss": rtb["rcnn_loss_reg_total"],
             "rpn_loss": total}
        )
        return total, tb

    def predict(self, batch):
        rpn_preds, bev, stages = self._backbone(batch, train=False)
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            rpn_preds, False
        )
        keypoints, kp_valid, kp_feats, _ = self._keypoint_features(
            batch, bev, stages, train=False, rois=rois, roi_valid=roi_valid
        )
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            rois, roi_valid, keypoints, kp_valid, kp_feats, train=False
        )
        refined = roi_head.generate_predicted_boxes(rois[..., :7], rcnn_reg)
        scores = jnp.where(roi_valid, jax.nn.sigmoid(rcnn_cls), 0.0)
        return roi_head.final_nms(
            refined, scores, roi_labels, roi_valid, self.cfg.POST_PROCESSING
        )
