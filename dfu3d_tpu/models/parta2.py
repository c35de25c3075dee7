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
  a (G, G, G) grid in the canonical RoI frame with masked avg (part stream) /
  max (rpn stream) pooling, reference cell layout (x, y, z).
* **RoI head**: the reference-exact PartA2FCHead — dual subm conv stacks over
  the pooled grids (dense SAME convs re-masked to the occupied set), merged
  channel-major into SHARED_FC → CLS_FC/REG_FC, with ProposalTargetLayer
  subsampling + canonical losses via models/roi_head.py.
* Proposals: anchor head over the height-compressed encoder BEV features (the
  reference RPN path), via the shared AnchorDetectorBase machinery.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.voxel import VoxelGrid, dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from . import roi_head
from .pointpillar import AnchorDetectorBase
from .pointrcnn import pool_roi_points
from .pointnet2_backbone import SharedMLP
from .roi_head import make_fc_stack, roi_head_loss_cfg, roi_head_target_cfg, shared_fc_stack
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
    frame and max/mean-pooled. Returns (R, G, G, G, C) with the reference's
    (x, y, z) cell layout (RoIAwarePool3d outputs (N, out_x, out_y, out_z, C)).
    TPU redesign: the reference pools every in-box point with a per-cell cap
    (MAX_POINTS_PER_VOXEL); here a static per-roi point sample feeds a
    segment reduction.
    """
    local, feats, sample_valid = pool_roi_points(
        points_xyz, point_feats, points_valid, rois, roi_valid, num_samples,
        extra=0.0,
    )
    g = grid_size
    dims = jnp.maximum(rois[:, 3:6], 1e-3)  # (R, 3)
    rel = (local / dims[:, None, :] + 0.5) * g
    cell = jnp.clip(rel.astype(jnp.int32), 0, g - 1)
    cell_id = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]  # (R, S)
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
    """Reference-exact PartA2FCHead stack (partA2_head.py:15-58, 164-218).

    TPU redesign: the pooled RoI grids are dense (R, G, G, G, C), so the
    reference's submanifold conv blocks (post_act_block 'subm', BN eps 1e-3
    torch-momentum 0.01) become dense SAME convs whose outputs are re-masked
    to the occupied cells (subm preserves the active set; inactive inputs are
    zero so the convolution sums match) with BN statistics over occupied
    cells only (spconv's BN1d sees only active sites). The part/rpn streams
    merge as torch.cat((x_rpn, x_part)), flatten channel-major
    (`dense().view(N, -1, 1)` is (N, C, x, y, z)), then SHARED_FC →
    CLS_FC/REG_FC via the shared roi_head stacks.
    """

    grid_size: int = 12
    num_features: int = 128
    shared_fc: Sequence[int] = (256, 256, 256)
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    dp_ratio: float = 0.3
    dtype: jnp.dtype = jnp.float32

    def _subm_block(self, x, mask, ch: int, name: str, train: bool):
        from .vfe import MaskedBatchNorm

        x = nn.Conv(ch, (3, 3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"{name}_conv")(x)
        flat_mask = jnp.broadcast_to(mask, x.shape[:-1]).reshape(-1)
        x = MaskedBatchNorm(momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                            name=f"{name}_bn")(
            x.reshape(-1, ch), flat_mask, train
        ).reshape(x.shape)
        return jnp.where(mask[..., None], nn.relu(x), 0.0)

    @nn.compact
    def __call__(self, part_grids, rpn_grids, train: bool):
        """part_grids (B, R, G, G, G, 4), rpn_grids (B, R, G, G, G, C)."""
        b, r = part_grids.shape[0], part_grids.shape[1]
        part = part_grids.reshape((b * r,) + part_grids.shape[2:])
        rpn = rpn_grids.reshape((b * r,) + rpn_grids.shape[2:])
        # active set: sparse_idx = pooled_part.sum(-1).nonzero()
        mask = jnp.sum(jnp.abs(part), axis=-1) > 0
        c0 = self.num_features // 2
        xp = part.astype(self.dtype)
        xr = rpn.astype(self.dtype)
        for i, ch in enumerate((64, c0)):
            xp = self._subm_block(xp, mask, ch, f"part{i}", train)
            xr = self._subm_block(xr, mask, ch, f"rpn{i}", train)
        merged = jnp.concatenate([xr, xp], axis=-1)
        merged = jnp.moveaxis(merged, -1, 1).reshape(b * r, -1)
        h = shared_fc_stack(self.shared_fc, self.dp_ratio, dtype=self.dtype,
                            name="shared_fc")(merged, train)
        cls = make_fc_stack(self.cls_fc, 1, self.dp_ratio, dtype=self.dtype,
                            name="cls_fc")(h, train)
        reg = make_fc_stack(self.reg_fc, 7, self.dp_ratio, dtype=self.dtype,
                            name="reg_fc")(h, train)
        return (cls.reshape(b, r).astype(jnp.float32),
                reg.reshape(b, r, 7).astype(jnp.float32))


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
        pool_cfg = rh.get("ROI_AWARE_POOL", None)
        if pool_cfg is not None:  # reference PartA2.yaml schema
            g = int(pool_cfg.get("POOL_SIZE", 12))
            nf = int(pool_cfg.get("NUM_FEATURES", 128))
        else:  # legacy compact schema
            g = int(rh.get("GRID_SIZE", 12))
            nf = int(rh.get("NUM_FEATURES", 128))
        # static per-roi point sample feeding the segment reduction (the
        # reference instead caps points per CELL via MAX_POINTS_PER_VOXEL)
        self.roi_samples = int(rh.get("ROI_POINT_SAMPLES", 512))
        self.seg_mask_thresh = float(rh.get("SEG_MASK_SCORE_THRESH", 0.3))
        self.disable_part = bool(rh.get("DISABLE_PART", False))
        self.roi_head = PartA2RoIHead(
            grid_size=g, num_features=nf,
            shared_fc=tuple(rh.get("SHARED_FC", (256, 256, 256))),
            cls_fc=tuple(rh.get("CLS_FC", (256, 256))),
            reg_fc=tuple(rh.get("REG_FC", (256, 256))),
            dp_ratio=float(rh.get("DP_RATIO", 0.3)),
            dtype=self.dtype,
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

        # RoI refinement (proposal layer → ProposalTargetLayer → pooled
        # part/rpn streams → PartA2FCHead, roi_head template losses)
        rois, roi_scores, roi_labels, _ = self._proposals(rpn_preds, True)
        rh_cfg = self.cfg.get("ROI_HEAD", {})
        key = (self.make_rng("sampler") if self.has_rng("sampler")
               else jax.random.PRNGKey(0))
        tgt = roi_head.assign_roi_targets(
            key, rois, roi_labels, roi_scores, batch.gt_boxes,
            batch.gt_valid, roi_head_target_cfg(rh_cfg),
        )
        m = tgt["rois"].shape[1]
        rcnn_cls, rcnn_reg = self._roi_forward(
            tgt["rois"], jnp.ones((rois.shape[0], m), bool),
            point_st, seg_logits, part_pred, train,
        )
        rcnn_loss, rtb = roi_head.roi_head_loss(
            rcnn_cls, rcnn_reg, tgt, roi_head_loss_cfg(rh_cfg)
        )

        total = rpn_loss + seg_loss + part_loss + rcnn_loss
        tb.update(
            {"seg_loss": seg_loss, "part_loss": part_loss,
             "rcnn_cls_loss": rtb["rcnn_loss_cls"],
             "rcnn_reg_loss": rtb["rcnn_loss_reg_total"],
             "rpn_loss": total}
        )
        return total, tb

    def _proposals(self, rpn_preds, train: bool):
        from .anchor_head import decode_anchor_predictions

        boxes, cls_scores = decode_anchor_predictions(
            rpn_preds, jnp.asarray(self._anchors_flat), len(self.class_names)
        )
        nms_cfg = roi_head.resolve_nms_cfg(self.cfg.get("ROI_HEAD", {}),
                                           train)
        return roi_head.proposal_layer(boxes, cls_scores, nms_cfg)

    def _roi_forward(self, rois, roi_valid, point_st, seg_logits, part_pred,
                     train: bool):
        """RoI-aware avg(part)/max(rpn) pooling + conv/FC head
        (partA2_head.py roiaware_pool:105-152: part stream =
        [part_offset ‖ detached cls score] with offsets zeroed below
        SEG_MASK_SCORE_THRESH — raw coords instead under DISABLE_PART)."""
        centers = self._voxel_centers(point_st.coords)
        score = jax.lax.stop_gradient(jax.nn.sigmoid(seg_logits))
        part_src = centers if self.disable_part else part_pred
        part_feats = jnp.concatenate([
            jnp.where(score[..., None] >= self.seg_mask_thresh, part_src, 0.0),
            score[..., None],
        ], axis=-1)
        rpn_feats = point_st.features.astype(jnp.float32)

        def pool_one(c, pf, rf, v, r, rv):
            part = roiaware_pool(c, pf, v, r, rv, self.roi_samples,
                                 self.roi_head.grid_size, reduce="avg")
            rpn = roiaware_pool(c, rf, v, r, rv, self.roi_samples,
                                self.roi_head.grid_size, reduce="max")
            return part, rpn

        part_grids, rpn_grids = jax.vmap(pool_one)(
            centers, part_feats, rpn_feats, point_st.valid, rois, roi_valid
        )
        return self.roi_head(part_grids, rpn_grids, train)

    def predict(self, batch):
        rpn_preds, point_st, seg_logits, part_pred = self._backbone(
            batch, train=False
        )
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            rpn_preds, False
        )
        rcnn_cls, rcnn_reg = self._roi_forward(
            rois, roi_valid, point_st, seg_logits, part_pred, train=False
        )
        refined = roi_head.generate_predicted_boxes(rois[..., :7], rcnn_reg)
        scores = jnp.where(roi_valid, jax.nn.sigmoid(rcnn_cls), 0.0)
        return roi_head.final_nms(
            refined, scores, roi_labels, roi_valid, self.cfg.POST_PROCESSING
        )
