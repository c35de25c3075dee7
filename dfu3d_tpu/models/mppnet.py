"""MPPNet / MPPNetE2E — temporal multi-frame proposal refinement (reference:
pcdet/models/detectors/mppnet.py, mppnet_e2e.py; head in
pcdet/models/roi_heads/mppnet_head.py + mppnet_memory_bank_e2e.py).

TPU redesign on this repo's primitives, fully static shapes:
* input: multi-sweep point clouds with a trailing time-lag channel (the same
  contract the nuScenes loader produces; the reference uses 4/16-frame
  KITTI-format sweeps). Points partition into T frame groups by their lag.
* stage 1: sparse-backbone BEV RPN on the merged cloud -> proposals. The
  reference instead LOADS per-frame proposals of a frozen first stage from
  disk (detector `proposals_list`); in-framework we synthesize the per-frame
  proposal sets from the current RPN output and run the same trajectory
  matching (`generate_trajectory`), so the full matching path is exercised
  and external per-frame proposals can be dropped in.
* stage 2: the structurally-faithful MPPNetHead (see mppnet_head.py):
  trajectory generation, per-frame cropping, proxy-point geometry + motion
  streams, intra-/inter-group attention, trajectory auxiliary branch, deep
  per-layer supervision, and a joint regression.
* MPPNetE2E: the first stage sees only the CURRENT frame's points while the
  head consumes the full lag history; `predict_with_bank` carries the
  reference's cached geometry-feature memory bank across steps
  (mppnet_memory_bank_e2e.py:360-466), matching bank entries to the current
  trajectory by 3D IoU.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.voxel import dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from . import roi_head as rh_template
from .anchor_head import decode_anchor_predictions
from .mppnet_head import MPPNetHead, generate_trajectory
from .pointpillar import AnchorDetectorBase
from .column_sparse import select_backbone8x
from .sparse_backbone import VoxelBackBone8x, height_compression


class MemoryBank(NamedTuple):
    """E2E cached state across steps (ref mppnet_memory_bank_e2e.py):
    per past frame the proxy geometry features, their rois, and validity."""

    feats: jnp.ndarray  # (B, T-1, R, P, H)
    rois: jnp.ndarray   # (B, T-1, R, 7)
    valid: jnp.ndarray  # (B, T-1, R)


class MPPNet(AnchorDetectorBase):
    """4/16-frame proposal-trajectory refinement detector."""

    max_voxels: int = 16000
    first_stage_current_only: bool = False

    def setup(self):
        cfg = self.cfg
        nx, ny, nz = self.grid.grid_size
        bb3d = cfg.get("BACKBONE_3D", {})
        self.backbone_3d = select_backbone8x(bb3d)(
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
        num_frames = int(rh.get("NUM_FRAMES", 4))
        self.num_frames = num_frames
        self.aux_weight = float(rh.get("AUX_WEIGHT", 0.5))
        self.roi_head = MPPNetHead(
            num_frames=num_frames,
            num_groups=int(rh.get("NUM_GROUPS", min(num_frames, 4))),
            sequence_stride=int(rh.get("SEQUENCE_STRIDE", 1)),
            grid_size=int(rh.get("GRID_SIZE", 4)),
            num_lidar_points=int(rh.get("NUM_LIDAR_POINTS", 128)),
            hidden=int(rh.get("HIDDEN", 64)),
            enc_layers=int(rh.get("NUM_LAYERS", 3)),
            nheads=int(rh.get("NHEADS", 4)),
            ffn_hidden=int(rh.get("DIM_FEEDFORWARD", 4 * int(rh.get("HIDDEN", 64)))),
            mixer_hidden=int(rh.get("MIXER_HIDDEN", 16)),
            pool_radii=tuple(rh.get("POOL_RADIUS", (0.8, 1.6))),
            pool_nsample=int(rh.get("NSAMPLE", 16)),
            dtype=self.dtype,
            name="roi_head",
        )
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

    def _rpn(self, batch, train: bool):
        points, pvalid = batch.points, batch.points_valid
        if self.first_stage_current_only and points.shape[-1] >= 5:
            # E2E memory-bank arrangement: the RPN sees the current frame only
            pvalid = pvalid & (points[..., -1] < 1e-3)

        def voxelize_one(pts, valid):
            vox = dynamic_voxelize(self.grid, pts, valid, self.max_voxels)
            sums = jax.ops.segment_sum(
                jnp.where(valid[:, None], pts, 0.0),
                vox.point_to_voxel, num_segments=self.max_voxels,
            )
            counts = jax.ops.segment_sum(
                valid.astype(jnp.float32), vox.point_to_voxel,
                num_segments=self.max_voxels,
            )
            return (sums / jnp.maximum(counts, 1.0)[:, None],
                    vox.voxel_coords, vox.voxel_valid)

        feats, coords, valid = jax.vmap(voxelize_one)(points, pvalid)
        st = self.backbone_3d(feats, coords, valid, train)
        bev = height_compression(st).astype(self.dtype)
        spatial = self.backbone_2d(bev, train)
        return self.dense_head(spatial)

    def _features(self, batch, train: bool):
        return self._rpn(batch, train)

    def _proposals(self, rpn_preds, train: bool):
        boxes, cls_scores = decode_anchor_predictions(
            rpn_preds, jnp.asarray(self._anchors_flat), len(self.class_names)
        )
        nms_cfg = rh_template.resolve_nms_cfg(self.cfg.get("ROI_HEAD", {}),
                                              train)
        return rh_template.proposal_layer(boxes, cls_scores, nms_cfg)

    def _trajectory(self, rois, roi_valid):
        """Trajectory rois via the reference's velocity-propagate + IoU-match
        protocol (mppnet_head.py:635-659). Without an external frozen-stage
        proposal store the per-frame proposal sets are the current proposals
        themselves, so matching is exact and the trajectory holds station —
        external `proposals_list` tensors slot into the same function."""
        proposals_list = jnp.broadcast_to(
            rois[:, None], (rois.shape[0], self.num_frames) + rois.shape[1:]
        )
        proposals_valid = jnp.broadcast_to(
            roi_valid[:, None],
            (roi_valid.shape[0], self.num_frames) + roi_valid.shape[1:],
        )
        return generate_trajectory(rois, roi_valid, proposals_list,
                                   proposals_valid)

    def _head_losses(self, out, tgt):
        """Deep-supervised rcnn losses over the ProposalTargetLayer targets
        (ref mppnet_head.get_loss: template cls/reg losses per layer + aux)."""
        loss_cfg = rh_template.roi_head_loss_cfg(self.cfg.get("ROI_HEAD", {}))

        def cls_loss(logits):
            return rh_template.roi_cls_loss(
                logits, tgt["rcnn_cls_labels"], loss_cfg)

        # per-layer deep supervision on the class logits (ref point_cls)
        rcnn_cls_loss = jnp.mean(jax.vmap(cls_loss)(out["cls_layers"]))

        def reg_loss(pred):
            return rh_template.roi_reg_loss(pred, tgt, loss_cfg)[0]

        rcnn_reg_loss = reg_loss(out["rcnn_reg"])
        # aux: per-layer/per-group token regressions + trajectory branch
        lxg = out["point_reg"].shape[0] * out["point_reg"].shape[1]
        aux_point = jax.vmap(reg_loss)(
            out["point_reg"].reshape((lxg,) + out["point_reg"].shape[2:])
        ).mean()
        aux_box = reg_loss(out["box_reg"])
        rcnn_reg_loss = rcnn_reg_loss + self.aux_weight * (aux_point + aux_box)
        return rcnn_cls_loss, rcnn_reg_loss

    def __call__(self, batch, train: bool = True):
        from .anchor_head import anchor_head_loss

        rpn_preds = self._rpn(batch, train)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        lw = self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        total, tb = anchor_head_loss(
            rpn_preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {"cls_weight": lw["cls_weight"], "loc_weight": lw["loc_weight"],
             "dir_weight": lw.get("dir_weight", 0.2),
             "code_weights": lw.get("code_weights", None)},
        )
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            rpn_preds, True
        )
        traj, traj_valid = self._trajectory(rois, roi_valid)
        # ProposalTargetLayerMPPNet: template subsampling at trajectory
        # frame 0, side tensors gathered with the sampled indices
        # (mppnet_head.py sample_rois_for_mppnet:100-160)
        key = (self.make_rng("sampler") if self.has_rng("sampler")
               else jax.random.PRNGKey(0))
        tgt = rh_template.assign_roi_targets(
            key, rois, roi_labels, roi_scores, batch.gt_boxes,
            batch.gt_valid,
            rh_template.roi_head_target_cfg(self.cfg.get("ROI_HEAD", {})),
        )
        idx = tgt["sampled_idx"]
        s_traj = jnp.take_along_axis(traj, idx[:, None, :, None], axis=2)
        s_tvalid = jnp.take_along_axis(traj_valid, idx[:, None, :], axis=2)
        m = idx.shape[1]
        s_valid = jnp.ones((rois.shape[0], m), bool)
        out = self.roi_head(
            tgt["rois"], s_valid, s_traj, s_tvalid, batch.points,
            batch.points_valid, train,
        )
        rcnn_cls_loss, rcnn_reg_loss = self._head_losses(out, tgt)
        total = total + rcnn_cls_loss + rcnn_reg_loss
        tb.update({"rcnn_cls_loss": rcnn_cls_loss,
                   "rcnn_reg_loss": rcnn_reg_loss})
        return total, tb

    def _refine(self, out, rois, roi_scores, roi_valid):
        refined = rh_template.generate_predicted_boxes(
            rois[..., :7], out["rcnn_reg"]
        )
        # AVG_STAGE1_SCORE geometric mean (ref mppnet_head.py:784)
        scores = jnp.sqrt(
            jax.nn.sigmoid(out["rcnn_cls"]) * jnp.maximum(roi_scores, 1e-8)
        )
        scores = jnp.where(roi_valid, scores, 0.0)
        labels = jnp.ones_like(scores, dtype=jnp.int32)
        return refined, scores, labels, roi_valid

    def predict(self, batch):
        rpn_preds = self._rpn(batch, train=False)
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            rpn_preds, False
        )
        traj, traj_valid = self._trajectory(rois, roi_valid)
        out = self.roi_head(
            rois, roi_valid, traj, traj_valid, batch.points,
            batch.points_valid, train=False,
        )
        return self._refine(out, rois, roi_scores, roi_valid)


class MPPNetE2E(MPPNet):
    """End-to-end memory-bank variant: stage 1 on the current frame only,
    cached proxy geometry features carried across steps
    (reference mppnet_e2e.py + mppnet_memory_bank_e2e.py)."""

    first_stage_current_only: bool = True

    def empty_bank(self, batch_size: int) -> MemoryBank:
        r, p = self.num_rois, self.roi_head.num_proxy
        tm1 = self.num_frames - 1
        h = self.roi_head.hidden
        return MemoryBank(
            feats=jnp.zeros((batch_size, tm1, r, p, h), jnp.float32),
            rois=jnp.zeros((batch_size, tm1, r, 7), jnp.float32),
            valid=jnp.zeros((batch_size, tm1, r), bool),
        )

    def predict_with_bank(self, batch, bank: MemoryBank):
        """One online step: detect on the current frame, reuse the cached
        per-frame geometry features for the history, roll the bank
        (ref mppnet_memory_bank_e2e.py:360-466 reorder + feature_bank)."""
        rpn_preds = self._rpn(batch, train=False)
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            rpn_preds, False
        )
        traj, traj_valid = self._trajectory(rois, roi_valid)

        def match_bank(traj_f, tv, b_rois, b_feat, b_valid):
            # reorder one bank frame onto the current trajectory by 3D IoU
            from ..core.geometry.iou import pairwise_iou3d

            iou = pairwise_iou3d(traj_f[:, :7], b_rois[:, :7])
            iou = jnp.where(b_valid[None, :], iou, -1.0)
            best = jnp.argmax(iou, axis=1)
            ok = (jnp.max(iou, axis=1) >= 0.5) & tv
            return b_feat[best], ok

        def match_all(traj_b, tv_b, bank_b: MemoryBank):
            feats, ok = jax.vmap(match_bank)(
                traj_b[1:], tv_b[1:], bank_b.rois, bank_b.feats, bank_b.valid
            )
            return feats, ok

        gfeats, gvalid = jax.vmap(match_all)(traj, traj_valid, bank)
        out = self.roi_head(
            rois, roi_valid, traj, traj_valid, batch.points,
            batch.points_valid, False,
            geometry_bank=gfeats, bank_valid=gvalid,
        )
        new_bank = MemoryBank(
            feats=jnp.concatenate(
                [out["geometry_memory"][:, None], bank.feats[:, :-1]], axis=1
            ),
            rois=jnp.concatenate(
                [rois[..., :7][:, None], bank.rois[:, :-1]], axis=1
            ),
            valid=jnp.concatenate(
                [roi_valid[:, None], bank.valid[:, :-1]], axis=1
            ),
        )
        return self._refine(out, rois, roi_scores, roi_valid), new_bank
