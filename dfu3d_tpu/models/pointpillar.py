"""PointPillar detector (reference: pcdet/models/detectors/pointpillar.py —
DynPillarVFE/PillarVFE → PointPillarScatter → BaseBEVBackbone →
AnchorHeadSingle → class-agnostic NMS post-processing).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry.nms import nms_bev
from ..core.voxel import VoxelGrid
from .anchor_head import (
    AnchorHeadSingle,
    AnchorTargets,
    anchor_head_loss,
    assign_targets_single_class,
    decode_anchor_predictions,
    generate_anchors,
)
from .backbone_2d import BaseBEVBackbone
from .vfe import DynPillarVFE


class PointPillar(nn.Module):
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
        bb = cfg.BACKBONE_2D
        self.backbone_2d = BaseBEVBackbone(
            layer_nums=tuple(bb.LAYER_NUMS),
            layer_strides=tuple(bb.LAYER_STRIDES),
            num_filters=tuple(bb.NUM_FILTERS),
            upsample_strides=tuple(bb.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(bb.NUM_UPSAMPLE_FILTERS),
            dtype=self.dtype,
        )

        dh = cfg.DENSE_HEAD
        agc = []
        for c in dh.ANCHOR_GENERATOR_CONFIG:
            agc.append(
                {
                    "class_name": c["class_name"],
                    "anchor_sizes": c["anchor_sizes"],
                    "anchor_rotations": c["anchor_rotations"],
                    "anchor_bottom_heights": c["anchor_bottom_heights"],
                    "align_center": c.get("align_center", False),
                    "feature_map_stride": c.get("feature_map_stride", 2),
                    "matched_threshold": c["matched_threshold"],
                    "unmatched_threshold": c["unmatched_threshold"],
                }
            )
        self.anchor_cfgs = tuple(
            tuple(sorted(c.items())) for c in agc
        )  # hashable record
        anchors, counts = generate_anchors(
            agc, self.grid.grid_size, self.grid.point_cloud_range
        )
        self._per_class_anchors = tuple(a for a in anchors)
        self._per_loc_counts = tuple(counts)
        # global anchor layout: concat on the size axis (reference cat dim=-3)
        self._anchors_flat = np.concatenate(
            [a.reshape(a.shape[0], a.shape[1], a.shape[2], -1, 7) for a in anchors],
            axis=3,
        ).reshape(-1, 7)
        self.dense_head = AnchorHeadSingle(
            num_class=len(self.class_names),
            num_anchors_per_location=sum(counts),
            use_direction_classifier=dh.get("USE_DIRECTION_CLASSIFIER", True),
            num_dir_bins=dh.get("NUM_DIR_BINS", 2),
            dtype=self.dtype,
        )

    def _features(self, batch, train: bool):
        bev = self.vfe(batch.points, batch.points_valid, train)
        spatial = self.backbone_2d(bev, train)
        return self.dense_head(spatial)

    # --- target assignment over the global anchor layout ---

    def assign_targets(self, gt_boxes, gt_valid):
        cfg = self.cfg
        dh = cfg.DENSE_HEAD
        match_height = dh.get("TARGET_ASSIGNER_CONFIG", {}).get("MATCH_HEIGHT", False)
        labels_per_class, targets_per_class, weights_per_class = [], [], []
        for ci, acfg in enumerate(dh.ANCHOR_GENERATOR_CONFIG):
            cls_id = self.class_names.index(acfg["class_name"]) + 1
            anchors = self._per_class_anchors[ci]
            nz, ny, nx = anchors.shape[:3]
            a_flat = jnp.asarray(anchors.reshape(-1, 7))

            def one_frame(gt, valid):
                mask = valid & (gt[:, 7].astype(jnp.int32) == cls_id)
                return assign_targets_single_class(
                    a_flat, gt[:, :7], mask, gt[:, 7],
                    acfg["matched_threshold"], acfg["unmatched_threshold"],
                    match_height=match_height,
                )

            labels, targets, weights = jax.vmap(one_frame)(gt_boxes, gt_valid)
            # reshape to (B, ny, nx, per_loc) for interleaved global layout
            per_loc = self._per_loc_counts[ci]
            labels_per_class.append(labels.reshape(-1, ny, nx, per_loc))
            targets_per_class.append(targets.reshape(-1, ny, nx, per_loc, 7))
            weights_per_class.append(weights.reshape(-1, ny, nx, per_loc))
        labels = jnp.concatenate(labels_per_class, axis=3).reshape(
            gt_boxes.shape[0], -1
        )
        targets = jnp.concatenate(targets_per_class, axis=3).reshape(
            gt_boxes.shape[0], -1, 7
        )
        weights = jnp.concatenate(weights_per_class, axis=3).reshape(
            gt_boxes.shape[0], -1
        )
        return AnchorTargets(labels, targets, weights)

    def __call__(self, batch, train: bool = True):
        preds = self._features(batch, train)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        lw = self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        return anchor_head_loss(
            preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {
                "cls_weight": lw["cls_weight"],
                "loc_weight": lw["loc_weight"],
                "dir_weight": lw.get("dir_weight", 0.2),
                "code_weights": lw.get("code_weights", None),
            },
            dir_offset=self.cfg.DENSE_HEAD.get("DIR_OFFSET", 0.78539),
            num_dir_bins=self.cfg.DENSE_HEAD.get("NUM_DIR_BINS", 2),
        )

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
