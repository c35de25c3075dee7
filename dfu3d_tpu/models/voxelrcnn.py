"""Voxel R-CNN: two-stage detector pooling RoI features directly from sparse
voxel stages — no keypoints (reference: pcdet/models/detectors/voxel_rcnn.py +
roi_heads/voxelrcnn_head.py + ops voxel_query, SURVEY §2.1 N5).

TPU redesign on this repo's primitives: SECOND-style sparse encoder → BEV
anchor RPN; RoI head places a G³ grid in each proposal and aggregates each
grid point from the active voxels of several encoder stages by ball query
over voxel centers (the voxel_query radius semantics) with a shared MLP +
max-pool per stage — multi-scale "neighbor aggregation" — then FC cls/reg
refinement. RoI subsampling is masked loss weighting (static shapes), as in
the other RoI heads here.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.geometry.boxes import rotate_points_along_z
from ..core.geometry.iou import pairwise_iou3d
from ..core.geometry.nms import nms_bev
from ..core.voxel import dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from . import losses
from .anchor_head import decode_anchor_predictions, decode_boxes, encode_boxes
from .pointnet2_backbone import SharedMLP
from .pointpillar import AnchorDetectorBase
from .pvrcnn import SAFromSource
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
        self.num_rois = int(rh.get("NMS_POST_MAXSIZE", 64))
        self.roi_pre_max = int(rh.get("NMS_PRE_MAXSIZE", 1024))
        self.roi_nms_thresh = float(rh.get("NMS_THRESH", 0.8))
        self.roi_grid = int(rh.get("GRID_SIZE", 6))
        # per-stage voxel-query pools (reference POOL_LAYERS x_conv2..4)
        self.pool_stages = tuple(rh.get("POOL_STAGES", (1, 2, 3)))
        radii = rh.get("POOL_RADII", (0.4, 0.8, 1.6))
        mlp = tuple(rh.get("GRID_MLP", (32, 32)))
        ns = int(rh.get("GRID_NSAMPLE", 16))
        self.stage_pools = [
            SAFromSource(radius=float(r), nsample=ns, mlp=mlp,
                         dtype=self.dtype, name=f"pool_stage{s}")
            for s, r in zip(self.pool_stages, radii)
        ]
        self.roi_fc = SharedMLP(tuple(rh.get("FC", (128, 128))),
                                dtype=self.dtype, name="roi_fc")
        self.roi_cls = nn.Dense(1, param_dtype=jnp.float32, name="roi_cls")
        self.roi_reg = nn.Dense(7, param_dtype=jnp.float32, name="roi_reg")
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

    def _roi_grid_pool(self, rois, roi_valid, stages, train: bool):
        """G³ grid points per RoI ← multi-scale voxel-center aggregation
        (voxelrcnn_head.py roi_grid_pool: voxel_query + grouping per stage)."""
        g = self.roi_grid
        lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g - 0.5
        gz, gy, gx = jnp.meshgrid(lin, lin, lin, indexing="ij")
        unit = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

        def grid_one(r):
            local = unit[None, :, :] * r[:, None, 3:6]
            rot = rotate_points_along_z(local, r[:, 6])
            return rot + r[:, None, 0:3]

        grid_pts = jax.vmap(grid_one)(rois)  # (B, R, g³, 3)
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
        pooled = pooled.reshape(b, r, g**3 * pooled.shape[-1])
        h = self.roi_fc(pooled, roi_valid[..., None], train)
        cls = self.roi_cls(h)[..., 0].astype(jnp.float32)
        reg = self.roi_reg(h).astype(jnp.float32)
        return cls, reg

    def __call__(self, batch, train: bool = True):
        from .anchor_head import anchor_head_loss

        rpn_preds, stages, focal_loss = self._backbone(batch, train)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        lw = self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        total, tb = anchor_head_loss(
            rpn_preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {"cls_weight": lw["cls_weight"], "loc_weight": lw["loc_weight"],
             "dir_weight": lw.get("dir_weight", 0.2),
             "code_weights": lw.get("code_weights", None)},
        )
        rois, roi_scores, roi_valid = self._proposals(rpn_preds)
        rcnn_cls, rcnn_reg = self._roi_grid_pool(rois, roi_valid, stages, train)

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

        # loss_box_of_pts from the focal layers (SparseSequentialBatchdict
        # accumulation, spconv_backbone_focal.py:29-37 + get_loss:203-208)
        total = total + rcnn_cls_loss + rcnn_reg_loss + focal_loss
        tb.update({"rcnn_cls_loss": rcnn_cls_loss,
                   "rcnn_reg_loss": rcnn_reg_loss,
                   "loss_box_of_pts": focal_loss})
        return total, tb

    def predict(self, batch):
        rpn_preds, stages, _ = self._backbone(batch, train=False)
        rois, roi_scores, roi_valid = self._proposals(rpn_preds)
        rcnn_cls, rcnn_reg = self._roi_grid_pool(
            rois, roi_valid, stages, train=False
        )
        refined = decode_boxes(rcnn_reg, rois[..., :7])
        scores = jax.nn.sigmoid(rcnn_cls) * roi_scores
        scores = jnp.where(roi_valid, scores, 0.0)
        labels = jnp.ones_like(scores, dtype=jnp.int32)
        return refined, scores, labels, roi_valid
