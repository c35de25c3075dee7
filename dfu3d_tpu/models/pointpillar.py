"""Anchor-based detectors: PointPillar and SECOND.

Reference: pcdet/models/detectors/pointpillar.py (DynPillarVFE →
PointPillarScatter → BaseBEVBackbone → AnchorHeadSingle) and second_net.py
(MeanVFE → VoxelBackBone8x → HeightCompression → BaseBEVBackbone →
AnchorHeadSingle). Both share the anchor target-assignment / loss /
class-agnostic-NMS assembly in `AnchorDetectorBase`.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry.nms import nms_bev
from ..core.voxel import VoxelGrid, dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from .anchor_head import (
    AnchorHeadSingle,
    AnchorTargets,
    anchor_head_loss,
    assign_targets_single_class,
    decode_anchor_predictions,
    generate_anchors,
)
from .backbone_2d import BaseBEVBackbone
from .column_sparse import select_backbone8x
from .sparse_backbone import VoxelBackBone8x, height_compression
from .vfe import DynPillarVFE


class AnchorDetectorBase(nn.Module):
    """Shared anchor-head assembly. Subclasses define `_features` and call
    `_setup_anchors` + `_setup_backbone2d_and_head` from their setup."""

    model_cfg: Any
    class_names: Sequence[str]
    grid: VoxelGrid
    dtype: jnp.dtype = jnp.float32

    @property
    def cfg(self):
        from ..utils.config import thaw_cfg

        return thaw_cfg(self.model_cfg)

    def _setup_anchors(self, cfg):
        dh = cfg.DENSE_HEAD
        agc = [dict(c) for c in dh.ANCHOR_GENERATOR_CONFIG]
        anchors, counts = generate_anchors(
            agc, self.grid.grid_size, self.grid.point_cloud_range
        )
        self._per_class_anchors = tuple(anchors)
        self._per_loc_counts = tuple(counts)
        self._anchors_flat = np.concatenate(
            [a.reshape(a.shape[0], a.shape[1], a.shape[2], -1, 7) for a in anchors],
            axis=3,
        ).reshape(-1, 7)
        if dh.get("NAME", "AnchorHeadSingle") == "AnchorHeadMulti":
            from .anchor_head import AnchorHeadMulti

            groups_cfg = dh.get("RPN_HEAD_CFGS", None)
            if groups_cfg:
                name_to_idx = {n: i for i, n in enumerate(self.class_names)}
                groups = tuple(
                    tuple(name_to_idx[n] for n in g["HEAD_CLS_NAME"])
                    for g in groups_cfg
                )
            else:
                groups = tuple((i,) for i in range(len(self.class_names)))
            self.dense_head = AnchorHeadMulti(
                num_class=len(self.class_names),
                class_groups=groups,
                anchors_per_loc_each_class=tuple(counts),
                shared_conv_channels=dh.get("SHARED_CONV_NUM_FILTER", 64),
                use_direction_classifier=dh.get("USE_DIRECTION_CLASSIFIER", True),
                num_dir_bins=dh.get("NUM_DIR_BINS", 2),
                dtype=self.dtype,
            )
        else:
            self.dense_head = AnchorHeadSingle(
                num_class=len(self.class_names),
                num_anchors_per_location=sum(counts),
                use_direction_classifier=dh.get("USE_DIRECTION_CLASSIFIER", True),
                num_dir_bins=dh.get("NUM_DIR_BINS", 2),
                use_iou_head=dh.get("USE_IOU_HEAD", False),
                dtype=self.dtype,
            )

    def _setup_backbone2d(self, cfg):
        bb = cfg.BACKBONE_2D
        self.backbone_2d = BaseBEVBackbone(
            layer_nums=tuple(bb.LAYER_NUMS),
            layer_strides=tuple(bb.LAYER_STRIDES),
            num_filters=tuple(bb.NUM_FILTERS),
            upsample_strides=tuple(bb.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(bb.NUM_UPSAMPLE_FILTERS),
            dtype=self.dtype,
        )

    # --- target assignment over the global anchor layout ---

    def assign_targets(self, gt_boxes, gt_valid):
        cfg = self.cfg
        dh = cfg.DENSE_HEAD
        match_height = dh.get("TARGET_ASSIGNER_CONFIG", {}).get("MATCH_HEIGHT", False)
        labels_pc, targets_pc, weights_pc = [], [], []
        for ci, acfg in enumerate(dh.ANCHOR_GENERATOR_CONFIG):
            cls_id = self.class_names.index(acfg["class_name"]) + 1
            anchors = self._per_class_anchors[ci]
            nz, ny, nx = anchors.shape[:3]
            a_flat = jnp.asarray(anchors.reshape(-1, 7))

            def one_frame(gt, valid):
                mask = valid & (gt[:, -1].astype(jnp.int32) == cls_id)
                return assign_targets_single_class(
                    a_flat, gt[:, :7], mask, gt[:, -1],
                    acfg["matched_threshold"], acfg["unmatched_threshold"],
                    match_height=match_height,
                )

            labels, targets, weights = jax.vmap(one_frame)(gt_boxes, gt_valid)
            per_loc = self._per_loc_counts[ci]
            labels_pc.append(labels.reshape(-1, ny, nx, per_loc))
            targets_pc.append(targets.reshape(-1, ny, nx, per_loc, 7))
            weights_pc.append(weights.reshape(-1, ny, nx, per_loc))
        b = gt_boxes.shape[0]
        return AnchorTargets(
            jnp.concatenate(labels_pc, axis=3).reshape(b, -1),
            jnp.concatenate(targets_pc, axis=3).reshape(b, -1, 7),
            jnp.concatenate(weights_pc, axis=3).reshape(b, -1),
        )

    def __call__(self, batch, train: bool = True):
        preds = self._features(batch, train)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        cfg = self.cfg
        lw = cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        total, tb = anchor_head_loss(
            preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {
                "cls_weight": lw["cls_weight"],
                "loc_weight": lw["loc_weight"],
                "dir_weight": lw.get("dir_weight", 0.2),
                "code_weights": lw.get("code_weights", None),
            },
            dir_offset=cfg.DENSE_HEAD.get("DIR_OFFSET", 0.78539),
            num_dir_bins=cfg.DENSE_HEAD.get("NUM_DIR_BINS", 2),
        )
        if "iou_preds" in preds:
            # SECONDNetIoU: L1 between predicted and actual IoU3D of decoded
            # positive boxes vs their matched gt (second_net_iou semantics)
            from ..core.geometry.iou import aligned_iou3d
            from .anchor_head import decode_boxes

            b = preds["iou_preds"].shape[0]
            iou_p = preds["iou_preds"].reshape(b, -1)
            boxes = decode_boxes(
                preds["box_preds"].reshape(b, -1, 7),
                jnp.asarray(self._anchors_flat)[None],
            )
            pos = targets.box_cls_labels > 0
            matched = decode_boxes(
                targets.box_reg_targets, jnp.asarray(self._anchors_flat)[None]
            )
            actual = jax.vmap(aligned_iou3d)(
                jax.lax.stop_gradient(boxes), matched
            )
            w = pos.astype(jnp.float32)
            w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
            iou_loss = jnp.sum(jnp.abs(jnp.tanh(iou_p) - actual) * w) / b
            total = total + iou_loss
            tb["iou_loss"] = iou_loss
            tb["rpn_loss"] = total
        return total, tb

    def predict(self, batch):
        """Class-agnostic NMS post-processing (detector3d_template.
        post_processing:177-284 default path). Fixed-size masked outputs."""
        cfg = self.cfg
        preds = self._features(batch, train=False)
        boxes, cls_scores = decode_anchor_predictions(
            preds, jnp.asarray(self._anchors_flat), len(self.class_names),
            dir_offset=cfg.DENSE_HEAD.get("DIR_OFFSET", 0.78539),
            num_dir_bins=cfg.DENSE_HEAD.get("NUM_DIR_BINS", 2),
        )
        pp = cfg.POST_PROCESSING
        nms_cfg = pp.NMS_CONFIG
        score_thresh = float(pp.get("SCORE_THRESH", 0.1))
        pre_max = int(nms_cfg.NMS_PRE_MAXSIZE)
        post_max = int(nms_cfg.NMS_POST_MAXSIZE)

        max_scores = jnp.max(cls_scores, axis=-1)
        if "iou_preds" in preds and pp.get("USE_IOU_TO_RECTIFY_SCORE", True):
            # score rectification: score^(1-w) * iou^w (second_net_iou.py)
            b = preds["iou_preds"].shape[0]
            iou = jnp.clip(jnp.tanh(preds["iou_preds"].reshape(b, -1)), 0.0, 1.0)
            w = float(pp.get("IOU_RECTIFIER", 0.68))
            max_scores = jnp.power(max_scores, 1 - w) * jnp.power(
                jnp.maximum(iou, 1e-4), w
            )
        labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32) + 1

        def one_frame(bx, sc, lb):
            valid = sc >= score_thresh
            sel, keep = nms_bev(
                bx, sc, float(nms_cfg.NMS_THRESH),
                pre_max=pre_max, post_max=post_max, valid=valid,
            )
            return (
                bx[sel], jnp.where(keep, sc[sel], 0.0),
                jnp.where(keep, lb[sel], 0), keep,
            )

        return jax.vmap(one_frame)(boxes, max_scores, labels)


class PointPillar(AnchorDetectorBase):
    def setup(self):
        cfg = self.cfg
        vfe_cfg = cfg.VFE
        assert vfe_cfg.NAME in ("DynPillarVFE", "PillarVFE", "DynamicPillarVFE")
        self.vfe = DynPillarVFE(
            num_filters=tuple(vfe_cfg.NUM_FILTERS),
            grid=self.grid,
            use_norm=vfe_cfg.get("USE_NORM", True),
            use_absolute_xyz=vfe_cfg.get("USE_ABSLOTE_XYZ", True),
            with_distance=vfe_cfg.get("WITH_DISTANCE", False),
            dtype=self.dtype,
        )
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

    def _features(self, batch, train: bool):
        bev = self.vfe(batch.points, batch.points_valid, train)
        spatial = self.backbone_2d(bev, train)
        return self.dense_head(spatial)


class SECONDNet(AnchorDetectorBase):
    """MeanVFE → VoxelBackBone8x → HeightCompression → BEV backbone → anchors.

    (reference: pcdet/models/detectors/second_net.py + MeanVFE + spconv
    backbone; voxelization happens on-device via core/voxel.)
    """

    max_voxels: int = 16000

    def setup(self):
        cfg = self.cfg
        nx, ny, nz = self.grid.grid_size
        self.sparse_grid = SparseGrid(nx, ny, nz)
        bb3d = cfg.get("BACKBONE_3D", {})
        self.backbone_3d = select_backbone8x(bb3d)(
            grid=self.sparse_grid,
            voxel_cap=self.max_voxels,
            channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
            out_channels=bb3d.get("OUT_CHANNELS", 128),
            dtype=self.dtype,
        )
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

    def _spatial_features(self, batch, train: bool):
        # MeanVFE: on-device voxelization + per-voxel feature mean
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
        st = self.backbone_3d(feats, coords, valid, train)
        bev = height_compression(st).astype(self.dtype)
        return self.backbone_2d(bev, train)

    def _features(self, batch, train: bool):
        return self.dense_head(self._spatial_features(batch, train))
