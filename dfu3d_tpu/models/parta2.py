"""PartA2: part-aware two-stage detector with a sparse UNet.

Reference: pcdet/models/detectors/PartA2_net.py + backbones_3d/spconv_unet.py
(UNetV2) + dense_heads point-head family + roi_heads/partA2_head.py.

Capability re-design on this repo's sparse substrate:

* **SparseUNet** (UNetV2): explicit encoder (SubM blocks + stride-2 downs,
  VoxelBackBone8x stage layout) keeping per-stage tensors; decoder upsamples
  by parent-feature gather (each fine voxel pulls its stride-2 parent via the
  searchsorted lookup), concatenates the encoder skip and refines with a SubM
  block — a torchsparse-style inverse conv (spconv's learned inverse kernel is
  folded into the post-concat SubM).
* **Part head** (the PartA2 signature): per-voxel foreground segmentation +
  intra-object part-location regression; part targets are the voxel center's
  normalized [0,1]³ coordinates inside its gt box, BCE-supervised on
  foreground voxels (reference point_head_template + part semantics).
* **RoI-aware pooling** (completes SURVEY N2): sampled RoI points voxelized on
  a (G, G, G) grid in the canonical RoI frame with masked max-pool, then a
  small dense 3D conv + FC cls/reg refinement (partA2_head capability).
* Proposals: anchor head over the height-compressed encoder BEV features (the
  reference RPN path), via the shared AnchorDetectorBase machinery.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry.iou import pairwise_iou3d
from ..core.geometry.nms import nms_bev
from ..core.voxel import VoxelGrid, dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from . import losses
from .anchor_head import encode_boxes
from .pointpillar import AnchorDetectorBase
from .pointrcnn import pool_roi_points
from .pointnet2_backbone import SharedMLP
from .sparse_backbone import (
    SparseConv3dDown,
    SparseConvBlock,
    SparseTensor,
    _batched_neighbors,
    height_compression,
)


def _parent_gather(coarse: SparseTensor, fine_coords, fine_valid, z_only=False):
    """Gather each fine voxel's stride-2 parent feature from the coarse set."""
    if z_only:
        parent = jnp.stack(
            [fine_coords[..., 0], fine_coords[..., 1], fine_coords[..., 2] // 2],
            axis=-1,
        )
    else:
        parent = fine_coords // 2
    nbr = _batched_neighbors(
        coarse.grid, parent, fine_valid, coarse.coords, coarse.valid,
        np.zeros((1, 3), np.int32),
    )  # (B, Vf, 1)
    b, vc, c = coarse.features.shape
    padded = jnp.concatenate(
        [jnp.where(coarse.valid[..., None], coarse.features, 0.0),
         jnp.zeros((b, 1, c), coarse.features.dtype)], axis=1,
    ).reshape(b * (vc + 1), c)
    base = (jnp.arange(b, dtype=jnp.int32) * (vc + 1))[:, None]
    idx = (nbr[..., 0] + base).reshape(-1)
    return jnp.take(padded, idx, axis=0).reshape(b, fine_coords.shape[1], c)


class SparseUNet(nn.Module):
    """Encoder (stride 1/2/4/8) + parent-gather decoder back to stride 1."""

    grid: SparseGrid
    voxel_cap: int
    channels: Sequence[int] = (16, 16, 32, 64, 64)
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, coords, valid, train: bool):
        """Returns (bev_st: stride-8 z-compressed tensor for the RPN,
        point_st: stride-1 per-voxel decoder features)."""
        cap = self.voxel_cap
        st = SparseTensor(features.astype(self.dtype), coords, valid, self.grid)
        st = SparseConvBlock(self.channels[0], dtype=self.dtype, name="conv_in")(st, train)
        s1 = SparseConvBlock(self.channels[1], dtype=self.dtype, name="conv1")(st, train)

        def down(st, ch, cap, name):
            st = SparseConv3dDown(ch, out_cap=cap, dtype=self.dtype, name=name)(st, train=train)
            x = nn.relu(
                SparseConvBlock(ch, dtype=self.dtype, name=f"{name}_refine")(
                    st, train
                ).features
            )
            return SparseTensor(
                jnp.where(st.valid[..., None], x, 0.0), st.coords, st.valid, st.grid
            )

        s2 = down(s1, self.channels[2], max(cap // 2, 16), "down2")
        s3 = down(s2, self.channels[3], max(cap // 4, 16), "down3")
        s4 = down(s3, self.channels[4], max(cap // 8, 16), "down4")

        # RPN features: z-compress the deepest encoder stage
        bev_st = SparseConv3dDown(
            self.out_channels, out_cap=max(cap // 8, 16), z_only=True,
            dtype=self.dtype, name="conv_out",
        )(s4, train=train)

        # decoder: 8 → 4 → 2 → 1
        def up(coarse, skip, ch, name):
            gathered = _parent_gather(coarse, skip.coords, skip.valid)
            x = jnp.concatenate([gathered, skip.features], axis=-1)
            st = SparseTensor(x, skip.coords, skip.valid, skip.grid)
            return SparseConvBlock(ch, dtype=self.dtype, name=name)(st, train)

        d3 = up(s4, s3, self.channels[3], "up3")
        d2 = up(d3, s2, self.channels[2], "up2")
        d1 = up(d2, s1, self.channels[1], "up1")
        return bev_st, d1


def roiaware_pool(points_xyz, point_feats, points_valid, rois, roi_valid,
                  num_samples: int, grid_size: int, reduce: str = "max"):
    """RoI-aware grid pooling (SURVEY N2: roiaware_pool3d max/avg).

    Sampled RoI points are voxelized on a (G, G, G) grid in the canonical RoI
    frame and max/mean-pooled. Returns (R, G, G, G, C).
    """
    local, feats, sample_valid = pool_roi_points(
        points_xyz, point_feats, points_valid, rois, roi_valid, num_samples,
        extra=0.0,
    )
    g = grid_size
    dims = jnp.maximum(rois[:, 3:6], 1e-3)  # (R, 3)
    rel = (local / dims[:, None, :] + 0.5) * g
    cell = jnp.clip(rel.astype(jnp.int32), 0, g - 1)
    cell_id = (cell[..., 2] * g + cell[..., 1]) * g + cell[..., 0]  # (R, S)
    r = rois.shape[0]
    seg = jnp.where(sample_valid, cell_id + jnp.arange(r)[:, None] * g ** 3,
                    r * g ** 3)
    c = feats.shape[-1]
    flat_feats = feats.reshape(-1, c).astype(jnp.float32)
    flat_seg = seg.reshape(-1)
    if reduce == "max":
        pooled = jax.ops.segment_max(flat_feats, flat_seg, num_segments=r * g ** 3)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    else:
        s = jax.ops.segment_sum(flat_feats, flat_seg, num_segments=r * g ** 3)
        n = jax.ops.segment_sum(
            sample_valid.reshape(-1).astype(jnp.float32), flat_seg,
            num_segments=r * g ** 3,
        )
        pooled = s / jnp.maximum(n, 1.0)[:, None]
    return pooled.reshape(r, g, g, g, c)


class PartA2RoIHead(nn.Module):
    """Dense 3D conv over pooled RoI grids + FC cls/reg (partA2_head capability)."""

    grid_size: int = 12
    conv_channels: int = 64
    fc: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, grids, train: bool):
        # grids: (B, R, G, G, G, C) → merge batch/roi for the conv stack
        b, r = grids.shape[0], grids.shape[1]
        x = grids.reshape((b * r,) + grids.shape[2:]).astype(self.dtype)
        for i, stride in enumerate([2, 2]):
            x = nn.Conv(self.conv_channels, (3, 3, 3), strides=(stride,) * 3,
                        padding=1, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"bn{i}")(x)
            x = nn.relu(x).astype(self.dtype)
        x = x.reshape(b * r, -1)
        for i, f in enumerate(self.fc):
            x = nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i}")(x)
            x = nn.relu(x)
        cls = nn.Dense(1, param_dtype=jnp.float32, name="cls")(x).reshape(b, r)
        reg = nn.Dense(7, param_dtype=jnp.float32, name="reg")(x).reshape(b, r, 7)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class PartA2Net(AnchorDetectorBase):
    """MeanVFE → SparseUNet → [part head | RPN anchor head] → RoI refinement."""

    max_voxels: int = 16000

    def setup(self):
        cfg = self.cfg
        nx, ny, nz = self.grid.grid_size
        bb3d = cfg.get("BACKBONE_3D", {})
        self.unet = SparseUNet(
            grid=SparseGrid(nx, ny, nz),
            voxel_cap=self.max_voxels,
            channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
            out_channels=bb3d.get("OUT_CHANNELS", 128),
            dtype=self.dtype,
        )
        ph = cfg.get("POINT_HEAD", {})
        self.seg_mlp = SharedMLP(tuple(ph.get("CLS_FC", (64,))), dtype=self.dtype,
                                 name="seg_mlp")
        self.seg_out = nn.Dense(1, param_dtype=jnp.float32, name="seg_out")
        self.part_out = nn.Dense(3, param_dtype=jnp.float32, name="part_out")
        rh = cfg.get("ROI_HEAD", {})
        self.num_rois = int(rh.get("NMS_POST_MAXSIZE", 64))
        self.roi_pre_max = int(rh.get("NMS_PRE_MAXSIZE", 1024))
        self.roi_nms_thresh = float(rh.get("NMS_THRESH", 0.8))
        self.roi_samples = int(rh.get("ROI_POINT_SAMPLES", 128))
        self.roi_head = PartA2RoIHead(
            grid_size=int(rh.get("GRID_SIZE", 12)), dtype=self.dtype
        )
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

    # --- shared forward pieces ---

    def _voxel_centers(self, coords):
        pcr = jnp.asarray(self.grid.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.grid.voxel_size, jnp.float32)
        return (coords.astype(jnp.float32) + 0.5) * vs + pcr[0:3]

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
            feats = sums / jnp.maximum(counts, 1.0)[:, None]
            return feats, vox.voxel_coords, vox.voxel_valid

        feats, coords, valid = jax.vmap(voxelize_one)(
            batch.points, batch.points_valid
        )
        bev_st, point_st = self.unet(feats, coords, valid, train)
        bev = height_compression(bev_st).astype(self.dtype)
        spatial = self.backbone_2d(bev, train)
        rpn_preds = self.dense_head(spatial)
        # part head over stride-1 decoder voxels
        seg_feat = self.seg_mlp(point_st.features, point_st.valid[..., None], train)
        seg_logits = self.seg_out(seg_feat)[..., 0].astype(jnp.float32)
        part_pred = jax.nn.sigmoid(self.part_out(seg_feat).astype(jnp.float32))
        return rpn_preds, point_st, seg_logits, part_pred

    def _features(self, batch, train: bool):
        return self._backbone(batch, train)[0]

    def _part_targets(self, point_st, gt_boxes, gt_valid):
        """Foreground mask + normalized intra-box part locations per voxel."""
        centers = self._voxel_centers(point_st.coords)  # (B, V, 3)

        def one(c, v, gt, gv):
            from ..core.geometry.boxes import points_in_boxes

            inside = points_in_boxes(c, gt[:, :7]) & gv[None, :]  # (V, M)
            fg = jnp.any(inside, axis=1) & v
            bidx = jnp.argmax(inside, axis=1)
            box = gt[bidx]
            local = c - box[:, 0:3]
            cos, sin = jnp.cos(-box[:, 6]), jnp.sin(-box[:, 6])
            lx = local[:, 0] * cos - local[:, 1] * sin
            ly = local[:, 0] * sin + local[:, 1] * cos
            lz = local[:, 2]
            part = jnp.stack(
                [
                    lx / jnp.maximum(box[:, 3], 1e-3) + 0.5,
                    ly / jnp.maximum(box[:, 4], 1e-3) + 0.5,
                    lz / jnp.maximum(box[:, 5], 1e-3) + 0.5,
                ],
                axis=-1,
            )
            return fg, jnp.clip(part, 0.0, 1.0)

        return jax.vmap(one)(
            centers, point_st.valid, gt_boxes, gt_valid
        )

    def __call__(self, batch, train: bool = True):
        rpn_preds, point_st, seg_logits, part_pred = self._backbone(batch, train)

        # RPN losses (shared anchor machinery)
        from .anchor_head import anchor_head_loss

        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        lw = self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        rpn_loss, tb = anchor_head_loss(
            rpn_preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {"cls_weight": lw["cls_weight"], "loc_weight": lw["loc_weight"],
             "dir_weight": lw.get("dir_weight", 0.2),
             "code_weights": lw.get("code_weights", None)},
        )

        # part losses
        fg, part_t = self._part_targets(point_st, batch.gt_boxes, batch.gt_valid)
        cared = point_st.valid
        w = cared.astype(jnp.float32)
        w = w / jnp.maximum(jnp.sum(w), 1.0)
        seg_t = fg.astype(jnp.float32)
        bce = jnp.clip(seg_logits, 0) - seg_logits * seg_t + jnp.log1p(
            jnp.exp(-jnp.abs(seg_logits))
        )
        seg_loss = jnp.sum(bce * w)
        fg_w = fg.astype(jnp.float32)
        fg_w = fg_w / jnp.maximum(jnp.sum(fg_w), 1.0)
        part_bce = -(
            part_t * jnp.log(jnp.clip(part_pred, 1e-6, 1.0))
            + (1 - part_t) * jnp.log(jnp.clip(1 - part_pred, 1e-6, 1.0))
        )
        part_loss = jnp.sum(part_bce * fg_w[..., None]) / 3.0

        # RoI refinement (proposals from the RPN, pooled part+decoder features)
        rois, roi_scores, roi_valid = self._proposals(rpn_preds)
        centers = self._voxel_centers(point_st.coords)
        aug_feats = jnp.concatenate(
            [point_st.features.astype(jnp.float32), part_pred,
             jax.nn.sigmoid(seg_logits)[..., None]], axis=-1,
        )

        def pool_one(c, f, v, r, rv):
            return roiaware_pool(
                c, f, v, r, rv, self.roi_samples, self.roi_head.grid_size
            )

        grids = jax.vmap(pool_one)(
            centers, aug_feats, point_st.valid, rois, roi_valid
        )
        rcnn_cls, rcnn_reg = self.roi_head(grids, train)

        def roi_iou_one(r, rv, gt, gv):
            iou = pairwise_iou3d(r[:, :7], gt[:, :7])
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

        total = rpn_loss + seg_loss + part_loss + rcnn_cls_loss + rcnn_reg_loss
        tb.update(
            {"seg_loss": seg_loss, "part_loss": part_loss,
             "rcnn_cls_loss": rcnn_cls_loss, "rcnn_reg_loss": rcnn_reg_loss,
             "rpn_loss": total}
        )
        return total, tb

    def _proposals(self, rpn_preds):
        from .anchor_head import decode_anchor_predictions

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

    def predict(self, batch):
        rpn_preds, point_st, seg_logits, part_pred = self._backbone(
            batch, train=False
        )
        rois, roi_scores, roi_valid = self._proposals(rpn_preds)
        centers = self._voxel_centers(point_st.coords)
        aug_feats = jnp.concatenate(
            [point_st.features.astype(jnp.float32), part_pred,
             jax.nn.sigmoid(seg_logits)[..., None]], axis=-1,
        )

        def pool_one(c, f, v, r, rv):
            return roiaware_pool(
                c, f, v, r, rv, self.roi_samples, self.roi_head.grid_size
            )

        grids = jax.vmap(pool_one)(
            centers, aug_feats, point_st.valid, rois, roi_valid
        )
        rcnn_cls, rcnn_reg = self.roi_head(grids, train=False)
        from .anchor_head import decode_boxes

        refined = decode_boxes(rcnn_reg, rois[..., :7])
        scores = jax.nn.sigmoid(rcnn_cls) * roi_scores
        scores = jnp.where(roi_valid, scores, 0.0)
        labels = jnp.ones_like(scores, dtype=jnp.int32)  # class-agnostic head
        return refined, scores, labels, roi_valid
