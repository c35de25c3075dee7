"""Voxel R-CNN: two-stage detector pooling RoI features directly from sparse
voxel stages — no keypoints (reference: pcdet/models/detectors/voxel_rcnn.py +
roi_heads/voxelrcnn_head.py + ops voxel_query, SURVEY §2.1 N5).

TPU redesign on this repo's primitives: SECOND-style sparse encoder → BEV
anchor RPN; RoI head is the reference-exact VoxelRCNNHead — per-stage
NeighborVoxelSA grid pooling (voxel_query → ball query over voxel centers),
grid-major flattened FC refinement (SHARED_FC → CLS_FC/REG_FC + pred
layers), ProposalTargetLayer subsampling to ROI_PER_IMAGE with soft roi_iou
cls labels, canonical-frame reg targets + corner loss, and the canonical
decode — all via models/roi_head.py (parity-tested vs the reference's own
torch template).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.voxel import dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from . import roi_head
from .anchor_head import decode_anchor_predictions
from .pointpillar import AnchorDetectorBase
from .roi_head import (
    NeighborVoxelSA,
    roi_head_loss_cfg,
    roi_head_target_cfg,
    shared_fc_stack,
)
from .sparse_backbone import SparseEncoder, height_compression, voxel_centers_of


class VoxelRCNN(AnchorDetectorBase):
    max_voxels: int = 16000

    def setup(self):
        cfg = self.cfg
        nx, ny, nz = self.grid.grid_size
        bb3d = cfg.get("BACKBONE_3D", {})
        self._focal = bb3d.get("NAME", "") == "VoxelBackBone8xFocal"
        self._use_img = bool(bb3d.get("USE_IMG", False))
        if self._focal:
            from .sparse_backbone_focal import VoxelBackBone8xFocal

            self.encoder = VoxelBackBone8xFocal(
                grid=SparseGrid(nx, ny, nz),
                voxel_cap=self.max_voxels,
                point_cloud_range=tuple(self.grid.point_cloud_range),
                voxel_size=tuple(self.grid.voxel_size),
                channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
                out_channels=bb3d.get("OUT_CHANNELS", 128),
                topk=bb3d.get("TOPK", True),
                threshold=float(bb3d.get("THRESHOLD", 0.5)),
                kernel_size=int(bb3d.get("KERNEL_SIZE", 3)),
                mask_multi=bb3d.get("MASK_MULTI", False),
                skip_mask_kernel=bb3d.get("SKIP_MASK_KERNEL", False),
                dtype=self.dtype,
            )
            if self._use_img:
                # compact semantic-feature CNN standing in for the
                # reference's pretrained DeepLabV3-ResNet50 (PyramidFeat2D,
                # spconv_backbone_focal.py:128-149) — documented deviation:
                # trained end-to-end, 16-ch output matching channel_reduce
                from .backbone_2d import ConvBNReLU

                self.img_convs = [
                    ConvBNReLU(32, stride=2, dtype=self.dtype, name="img_c1"),
                    ConvBNReLU(16, dtype=self.dtype, name="img_c2"),
                ]
        else:
            self.encoder = SparseEncoder(
                grid=SparseGrid(nx, ny, nz),
                voxel_cap=self.max_voxels,
                channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
                out_channels=bb3d.get("OUT_CHANNELS", 128),
                dtype=self.dtype,
            )
        rh = cfg.get("ROI_HEAD", {})
        pool_cfg = rh.get("ROI_GRID_POOL", None)
        if pool_cfg is not None:
            # reference schema (voxelrcnn_head.py:12-33): one
            # NeighborVoxelSAModuleMSG per FEATURES_SOURCE stage
            self.roi_grid = int(pool_cfg.get("GRID_SIZE", 6))
            stage_idx = {"x_conv1": 0, "x_conv2": 1, "x_conv3": 2,
                         "x_conv4": 3}
            sources = list(pool_cfg["FEATURES_SOURCE"])
            self.pool_stages = tuple(stage_idx[s] for s in sources)
            layers = pool_cfg["POOL_LAYERS"]
            self.stage_pools = [
                NeighborVoxelSA(
                    mlp_spec=tuple(layers[s]["MLPS"][0]),
                    radius=float(layers[s]["POOL_RADIUS"][0]),
                    nsample=int(layers[s]["NSAMPLE"][0]),
                    pool_method=layers[s].get("POOL_METHOD", "max_pool"),
                    dtype=self.dtype, name=f"pool_{s}",
                )
                for s in sources
            ]
        else:  # legacy compact schema
            self.roi_grid = int(rh.get("GRID_SIZE", 6))
            self.pool_stages = tuple(rh.get("POOL_STAGES", (1, 2, 3)))
            radii = rh.get("POOL_RADII", (0.4, 0.8, 1.6))
            mlp = tuple(rh.get("GRID_MLP", (32, 32)))
            ns = int(rh.get("GRID_NSAMPLE", 16))
            self.stage_pools = [
                NeighborVoxelSA(mlp_spec=mlp, radius=float(r), nsample=ns,
                                dtype=self.dtype, name=f"pool_stage{s}")
                for s, r in zip(self.pool_stages, radii)
            ]
        # FC head (voxelrcnn_head.py:40-79: Linear stacks + pred layers)
        dp = float(rh.get("DP_RATIO", 0.3))
        self.shared_fc = shared_fc_stack(
            tuple(rh.get("SHARED_FC", rh.get("FC", (256, 256)))), dp,
            dtype=self.dtype, name="shared_fc")
        self.cls_fc = shared_fc_stack(tuple(rh.get("CLS_FC", (256, 256))),
                                      dp, dtype=self.dtype, name="cls_fc")
        self.reg_fc = shared_fc_stack(tuple(rh.get("REG_FC", (256, 256))),
                                      dp, dtype=self.dtype, name="reg_fc")
        self.cls_pred = nn.Dense(1, param_dtype=jnp.float32, name="cls_pred")
        self.reg_pred = nn.Dense(7, param_dtype=jnp.float32, name="reg_pred")
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

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
            return (sums / jnp.maximum(counts, 1.0)[:, None],
                    vox.voxel_coords, vox.voxel_valid)

        feats, coords, valid = jax.vmap(voxelize_one)(
            batch.points, batch.points_valid
        )
        if self._focal:
            image_feats = (
                self._voxel_image_feats(batch, coords, valid, train)
                if self._use_img and hasattr(batch, "images") else None
            )
            bev_st, stages, focal_loss = self.encoder(
                feats, coords, valid, train,
                gt_boxes=batch.gt_boxes, gt_valid=batch.gt_valid,
                image_feats=image_feats,
            )
        else:
            bev_st, stages = self.encoder(feats, coords, valid, train)
            focal_loss = jnp.zeros((), jnp.float32)
        bev = height_compression(bev_st).astype(self.dtype)
        spatial = self.backbone_2d(bev, train)
        return self.dense_head(spatial), stages, focal_loss

    def _voxel_image_feats(self, batch, coords, valid, train: bool):
        """Project stride-1 voxel centers into the (first) camera and sample
        semantic features (construct_multimodal_features,
        focal_sparse_conv.py:50-113; nearest sampling, zero outside)."""
        imgs = batch.images[:, 0]                       # (B, H, W, 3)
        feat = imgs
        for conv in self.img_convs:
            feat = conv(feat, train)                    # (B, H/2, W/2, 16)
        fh, fw = feat.shape[1:3]
        ih, iw = imgs.shape[1:3]

        pcr = jnp.asarray(self.grid.point_cloud_range[:3], jnp.float32)
        vs = jnp.asarray(self.grid.voxel_size, jnp.float32)
        centers = (coords.astype(jnp.float32) + 0.5) * vs + pcr   # (B, V, 3)
        ones = jnp.ones(centers.shape[:-1] + (1,), jnp.float32)
        hom = jnp.concatenate([centers, ones], axis=-1)           # (B, V, 4)
        cam = jnp.einsum("bij,bvj->bvi", batch.lidar_to_cam[:, 0], hom)
        img_pt = jnp.einsum("bij,bvj->bvi", batch.cam_to_img[:, 0], cam)
        depth = jnp.maximum(img_pt[..., 2], 1e-3)
        u = img_pt[..., 0] / depth
        v = img_pt[..., 1] / depth
        inside = (
            valid & (img_pt[..., 2] > 0)
            & (u >= 0) & (u < iw) & (v >= 0) & (v < ih)
        )
        fu = jnp.clip((u * fw / iw).astype(jnp.int32), 0, fw - 1)
        fv = jnp.clip((v * fh / ih).astype(jnp.int32), 0, fh - 1)
        lin = fv * fw + fu                                        # (B, V)
        flat = feat.reshape(feat.shape[0], fh * fw, feat.shape[-1])
        sampled = jnp.take_along_axis(flat, lin[..., None], axis=1)
        return jnp.where(inside[..., None], sampled, 0.0)

    def _features(self, batch, train: bool):
        return self._backbone(batch, train)[0]

    def _proposals(self, rpn_preds, train: bool):
        boxes, cls_scores = decode_anchor_predictions(
            rpn_preds, jnp.asarray(self._anchors_flat), len(self.class_names)
        )
        nms_cfg = roi_head.resolve_nms_cfg(self.cfg.get("ROI_HEAD", {}), train)
        return roi_head.proposal_layer(boxes, cls_scores, nms_cfg)

    def _roi_grid_pool(self, rois, roi_valid, stages, train: bool):
        """G³ grid points per RoI ← multi-scale voxel-center aggregation
        (voxelrcnn_head.py roi_grid_pool:106-191), then the reference FC
        refinement (grid-major flatten matching `pooled_features.view(N,-1)`
        on the (BN, g³, C) layout, voxelrcnn_head.py:232-238)."""
        g = self.roi_grid
        grid_pts = roi_head.global_grid_points(rois[..., :7], g)
        b, r = grid_pts.shape[0], grid_pts.shape[1]
        flat_pts = grid_pts.reshape(b, r * g**3, 3)
        flat_valid = jnp.repeat(roi_valid, g**3, axis=1)

        parts = []
        strides = [1, 2, 4, 8]
        for pool, s in zip(self.stage_pools, self.pool_stages):
            st = stages[s]
            centers = voxel_centers_of(
                st, self.grid.grid_size, self.grid.point_cloud_range,
                self.grid.voxel_size, strides[s],
            )
            parts.append(
                pool(flat_pts, flat_valid, centers,
                     st.features.astype(jnp.float32), st.valid, train)
            )
        pooled = jnp.concatenate(parts, axis=-1)  # (B, R·g³, ΣC)
        pooled = pooled.reshape(b * r, g**3 * pooled.shape[-1])
        h = self.shared_fc(pooled, train)
        cls = self.cls_pred(self.cls_fc(h, train))
        reg = self.reg_pred(self.reg_fc(h, train))
        return (cls.reshape(b, r).astype(jnp.float32),
                reg.reshape(b, r, 7).astype(jnp.float32))

    def __call__(self, batch, train: bool = True):
        from .anchor_head import anchor_head_loss

        rpn_preds, stages, focal_loss = self._backbone(batch, train)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        cfg = self.cfg
        lw = cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        total, tb = anchor_head_loss(
            rpn_preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {"cls_weight": lw["cls_weight"], "loc_weight": lw["loc_weight"],
             "dir_weight": lw.get("dir_weight", 0.2),
             "code_weights": lw.get("code_weights", None)},
        )
        rois, roi_scores, roi_labels, _ = self._proposals(rpn_preds, True)
        rh_cfg = cfg.get("ROI_HEAD", {})
        key = (self.make_rng("sampler") if self.has_rng("sampler")
               else jax.random.PRNGKey(0))
        tgt = roi_head.assign_roi_targets(
            key, rois, roi_labels, roi_scores, batch.gt_boxes,
            batch.gt_valid, roi_head_target_cfg(rh_cfg),
        )
        m = tgt["rois"].shape[1]
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            tgt["rois"], jnp.ones((rois.shape[0], m), bool), stages, train
        )
        rcnn_loss, rtb = roi_head.roi_head_loss(
            rcnn_cls, rcnn_reg, tgt, roi_head_loss_cfg(rh_cfg)
        )

        # loss_box_of_pts from the focal layers (SparseSequentialBatchdict
        # accumulation, spconv_backbone_focal.py:29-37 + get_loss:203-208)
        total = total + rcnn_loss + focal_loss
        tb.update({"rcnn_cls_loss": rtb["rcnn_loss_cls"],
                   "rcnn_reg_loss": rtb["rcnn_loss_reg_total"],
                   "loss_box_of_pts": focal_loss})
        return total, tb

    def predict(self, batch):
        rpn_preds, stages, _ = self._backbone(batch, train=False)
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            rpn_preds, False
        )
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            rois, roi_valid, stages, train=False
        )
        refined = roi_head.generate_predicted_boxes(rois[..., :7], rcnn_reg)
        scores = jnp.where(roi_valid, jax.nn.sigmoid(rcnn_cls), 0.0)
        return roi_head.final_nms(
            refined, scores, roi_labels, roi_valid, self.cfg.POST_PROCESSING
        )
