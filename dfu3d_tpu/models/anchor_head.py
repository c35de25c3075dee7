"""Anchor-based dense head: generator, residual coder, axis-aligned target
assigner, and AnchorHeadSingle.

Parity with the reference (pcdet/models/dense_heads/anchor_head_single.py +
anchor_head_template.py, target_assigner/axis_aligned_target_assigner.py,
target_assigner/anchor_generator.py, utils/box_coder_utils.ResidualCoder).

TPU-first redesign: the per-batch per-class python loops with dynamic
`nonzero()` indexing become fully vectorized masked ops over the fixed
(num_anchors, max_gt) IoU matrix, so target assignment lives inside the jitted
train step (the reference assigns on device but with dynamic shapes).
"""
from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data import np_geometry as npg
from . import losses


# ---------------------------------------------------------------------------
# Anchor generation (host-side numpy; anchors are static constants)
# ---------------------------------------------------------------------------

def generate_anchors(anchor_generator_cfgs, grid_size, point_cloud_range,
                     anchor_ndim: int = 7):
    """Per-class anchor grids (reference AnchorGenerator.generate_anchors).

    Returns:
        list of (nz, ny, nx, num_sizes, num_rots, 7) float32 arrays (one per
        class config) and list of per-location anchor counts.
    """
    all_anchors = []
    num_anchors_per_location = []
    pcr = np.asarray(point_cloud_range, np.float64)
    for cfg in anchor_generator_cfgs:
        sizes = np.asarray(cfg["anchor_sizes"], np.float64)         # (S, 3) l w h
        rotations = np.asarray(cfg["anchor_rotations"], np.float64)  # (R,)
        heights = np.asarray(cfg["anchor_bottom_heights"], np.float64)  # (Hz,)
        align_center = cfg.get("align_center", False)
        stride = cfg.get("feature_map_stride", 1)
        nx = grid_size[0] // stride
        ny = grid_size[1] // stride

        if align_center:
            x_stride = (pcr[3] - pcr[0]) / nx
            y_stride = (pcr[4] - pcr[1]) / ny
            x_offset, y_offset = x_stride / 2, y_stride / 2
        else:
            x_stride = (pcr[3] - pcr[0]) / (nx - 1)
            y_stride = (pcr[4] - pcr[1]) / (ny - 1)
            x_offset = y_offset = 0.0

        x_shifts = pcr[0] + x_offset + np.arange(nx) * x_stride
        y_shifts = pcr[1] + y_offset + np.arange(ny) * y_stride
        z_shifts = heights

        nz, s, r = len(z_shifts), len(sizes), len(rotations)
        zz, yy, xx = np.meshgrid(z_shifts, y_shifts, x_shifts, indexing="ij")
        centers = np.stack([xx, yy, zz], axis=-1)  # (nz, ny, nx, 3)
        anchors = np.zeros((nz, ny, nx, s, r, anchor_ndim), np.float32)
        anchors[..., 0:3] = centers[:, :, :, None, None, :]
        anchors[..., 3:6] = sizes[None, None, None, :, None, :]
        anchors[..., 6] = rotations[None, None, None, None, :]
        anchors[..., 2] += anchors[..., 5] / 2  # bottom → center z
        all_anchors.append(anchors)
        num_anchors_per_location.append(s * r * nz)
    return all_anchors, num_anchors_per_location


# ---------------------------------------------------------------------------
# Residual box coder (reference ResidualCoder, box_coder_utils.py:5-80)
# ---------------------------------------------------------------------------

def encode_boxes(boxes, anchors):
    """(…, 7) gt boxes vs anchors → (…, 7) residual targets."""
    xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
    dxa = jnp.maximum(anchors[..., 3], 1e-5)
    dya = jnp.maximum(anchors[..., 4], 1e-5)
    dza = jnp.maximum(anchors[..., 5], 1e-5)
    ra = anchors[..., 6]
    xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    dxg = jnp.maximum(boxes[..., 3], 1e-5)
    dyg = jnp.maximum(boxes[..., 4], 1e-5)
    dzg = jnp.maximum(boxes[..., 5], 1e-5)
    rg = boxes[..., 6]
    diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
    return jnp.stack(
        [
            (xg - xa) / diagonal,
            (yg - ya) / diagonal,
            (zg - za) / dza,
            jnp.log(dxg / dxa),
            jnp.log(dyg / dya),
            jnp.log(dzg / dza),
            rg - ra,
        ],
        axis=-1,
    )


def decode_boxes(encodings, anchors):
    xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
    dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
    ra = anchors[..., 6]
    xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
    dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]
    rt = encodings[..., 6]
    diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
    return jnp.stack(
        [
            xt * diagonal + xa,
            yt * diagonal + ya,
            zt * dza + za,
            jnp.exp(dxt) * dxa,
            jnp.exp(dyt) * dya,
            jnp.exp(dzt) * dza,
            rt + ra,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Axis-aligned target assignment (vectorized, static shapes)
# ---------------------------------------------------------------------------

class AnchorTargets(NamedTuple):
    box_cls_labels: jnp.ndarray   # (B, A) int32, -1 = don't care
    box_reg_targets: jnp.ndarray  # (B, A, 7)
    reg_weights: jnp.ndarray      # (B, A)


def _nearest_bev_iou(anchors, gt):
    """boxes3d_nearest_bev_iou in jnp: (A, 7) × (M, 7) → (A, M)."""
    from ..core.geometry.boxes import boxes3d_lidar_to_aligned_bev_boxes, boxes_iou_normal

    return boxes_iou_normal(
        boxes3d_lidar_to_aligned_bev_boxes(anchors),
        boxes3d_lidar_to_aligned_bev_boxes(gt),
    )


def assign_targets_single_class(anchors, gt_boxes, gt_mask, gt_classes,
                                matched_threshold, unmatched_threshold,
                                match_height=False):
    """One class's anchors vs that class's gt (masked), one batch element.

    Exact semantics of assign_targets_single (axis_aligned_target_assigner.py:
    132-214) with masks instead of dynamic indexing.
    """
    num_anchors = anchors.shape[0]
    if match_height:
        from ..core.geometry.iou import pairwise_iou3d

        iou = pairwise_iou3d(anchors[:, :7], gt_boxes[:, :7])
    else:
        iou = _nearest_bev_iou(anchors[:, :7], gt_boxes[:, :7])
    iou = jnp.where(gt_mask[None, :], iou, -1.0)

    any_gt = jnp.any(gt_mask)
    anchor_to_gt_max = jnp.max(iou, axis=1)
    anchor_to_gt_argmax = jnp.argmax(iou, axis=1)

    gt_to_anchor_max = jnp.max(iou, axis=0)  # (M,)
    gt_to_anchor_max = jnp.where(
        gt_mask & (gt_to_anchor_max > 0), gt_to_anchor_max, -1.0
    )
    # force-match: anchors achieving a gt's best overlap
    force = jnp.any(
        (iou == gt_to_anchor_max[None, :]) & (gt_to_anchor_max[None, :] > 0),
        axis=1,
    )

    labels = jnp.full((num_anchors,), -1, dtype=jnp.int32)
    labels = jnp.where(anchor_to_gt_max < unmatched_threshold, 0, labels)
    matched_cls = gt_classes[anchor_to_gt_argmax].astype(jnp.int32)
    pos = anchor_to_gt_max >= matched_threshold
    labels = jnp.where(pos, matched_cls, labels)
    labels = jnp.where(force, matched_cls, labels)
    labels = jnp.where(any_gt, labels, 0)

    fg = labels > 0
    matched_boxes = gt_boxes[anchor_to_gt_argmax]
    targets = encode_boxes(matched_boxes, anchors)
    targets = jnp.where(fg[:, None], targets, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return labels, targets, reg_weights


# ---------------------------------------------------------------------------
# AnchorHeadSingle
# ---------------------------------------------------------------------------

class AnchorHeadSingle(nn.Module):
    """1×1 conv heads over BEV features (anchor_head_single.py:10-74).

    `use_iou_head` adds a per-anchor IoU regression output (the SECONDNetIoU
    variant, detectors/second_net_iou.py: predicted IoU rectifies scores at
    inference)."""

    num_class: int
    num_anchors_per_location: int
    use_direction_classifier: bool = True
    num_dir_bins: int = 2
    use_iou_head: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spatial_features_2d):
        a = self.num_anchors_per_location
        conv = functools.partial(
            nn.Conv, kernel_size=(1, 1), dtype=self.dtype, param_dtype=jnp.float32
        )
        cls_preds = conv(
            a * self.num_class,
            bias_init=nn.initializers.constant(-np.log((1 - 0.01) / 0.01)),
            name="conv_cls",
        )(spatial_features_2d)
        box_preds = conv(a * 7, name="conv_box")(spatial_features_2d)
        out = {
            "cls_preds": cls_preds.astype(jnp.float32),
            "box_preds": box_preds.astype(jnp.float32),
        }
        if self.use_direction_classifier:
            out["dir_cls_preds"] = conv(a * self.num_dir_bins, name="conv_dir_cls")(
                spatial_features_2d
            ).astype(jnp.float32)
        if self.use_iou_head:
            out["iou_preds"] = conv(a, name="conv_iou")(
                spatial_features_2d
            ).astype(jnp.float32)
        return out


def add_sin_difference(boxes1, boxes2, dim: int = 6):
    """(anchor_head_template.py add_sin_difference): encode the angle channel
    as sin(a)cos(b) vs cos(a)sin(b)."""
    rad_pred = jnp.sin(boxes1[..., dim : dim + 1]) * jnp.cos(boxes2[..., dim : dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim : dim + 1]) * jnp.sin(boxes2[..., dim : dim + 1])
    b1 = jnp.concatenate([boxes1[..., :dim], rad_pred, boxes1[..., dim + 1 :]], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :dim], rad_tg, boxes2[..., dim + 1 :]], axis=-1)
    return b1, b2


def get_direction_target(anchors, reg_targets, dir_offset=0.78539,
                         num_bins: int = 2):
    """(anchor_head_template.py get_direction_target)."""
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = (rot_gt - dir_offset) % (2 * np.pi)
    dir_cls = jnp.clip(
        jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32),
        0, num_bins - 1,
    )
    return dir_cls


def anchor_head_loss(preds, targets: AnchorTargets, anchors_flat, num_class,
                     loss_weights, dir_offset=0.78539, num_dir_bins=2):
    """Combined cls + reg(sin-diff) + dir loss (anchor_head_template.py:
    get_cls_layer_loss + get_box_reg_layer_loss)."""
    b = preds["cls_preds"].shape[0]
    cls_preds = preds["cls_preds"].reshape(b, -1, num_class)
    box_preds = preds["box_preds"].reshape(b, -1, 7)
    labels = targets.box_cls_labels

    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives * 1.0 + positives * 1.0) * cared
    reg_weights = positives.astype(jnp.float32)
    pos_norm = jnp.maximum(jnp.sum(positives, axis=1, keepdims=True), 1.0)
    cls_weights = cls_weights / pos_norm
    reg_weights = reg_weights / pos_norm

    one_hot = jax.nn.one_hot(
        jnp.where(cared, labels, 0), num_class + 1, dtype=jnp.float32
    )[..., 1:]
    cls_loss = jnp.sum(
        losses.sigmoid_focal_loss(cls_preds, one_hot, cls_weights)
    ) / b * loss_weights["cls_weight"]

    box_preds_sin, targets_sin = add_sin_difference(box_preds, targets.box_reg_targets)
    loc_loss = jnp.sum(
        losses.weighted_smooth_l1(
            box_preds_sin, targets_sin, reg_weights,
            code_weights=loss_weights.get("code_weights", None),
        )
    ) / b * loss_weights["loc_weight"]

    total = cls_loss + loc_loss
    tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}

    if "dir_cls_preds" in preds:
        dir_targets = get_direction_target(
            anchors_flat[None], targets.box_reg_targets, dir_offset, num_dir_bins
        )
        dir_logits = preds["dir_cls_preds"].reshape(b, -1, num_dir_bins)
        weights = positives.astype(jnp.float32)
        weights = weights / jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1.0)
        dir_onehot = jax.nn.one_hot(dir_targets, num_dir_bins, dtype=jnp.float32)
        dir_loss = jnp.sum(
            losses.weighted_cross_entropy(dir_logits, dir_onehot, weights)
        ) / b * loss_weights.get("dir_weight", 0.2)
        total = total + dir_loss
        tb["rpn_loss_dir"] = dir_loss
    tb["rpn_loss"] = total
    return total, tb


def decode_anchor_predictions(preds, anchors_flat, num_class,
                              dir_offset=0.78539, dir_limit_offset=0.0,
                              num_dir_bins=2):
    """(anchor_head_template.generate_predicted_boxes): decoded boxes + scores.

    Returns (boxes (B, A, 7), cls_scores (B, A, num_class)).
    """
    from ..core.geometry.boxes import limit_period

    b = preds["cls_preds"].shape[0]
    cls_preds = preds["cls_preds"].reshape(b, -1, num_class)
    box_preds = preds["box_preds"].reshape(b, -1, 7)
    boxes = decode_boxes(box_preds, anchors_flat[None])
    if "dir_cls_preds" in preds:
        dir_preds = preds["dir_cls_preds"].reshape(b, -1, num_dir_bins)
        dir_labels = jnp.argmax(dir_preds, axis=-1)
        period = 2 * np.pi / num_dir_bins
        dir_rot = limit_period(boxes[..., 6] - dir_offset, dir_limit_offset, period)
        rot = dir_rot + dir_offset + period * dir_labels.astype(boxes.dtype)
        boxes = boxes.at[..., 6].set(rot)
    return boxes, jax.nn.sigmoid(cls_preds)


class AnchorHeadMulti(nn.Module):
    """Grouped multi-head anchor head (reference dense_heads/
    anchor_head_multi.py SingleHead stacks): a shared conv trunk, then one
    cls/box/dir head per class group. Outputs are assembled into the SAME
    flat per-location layout as AnchorHeadSingle (anchors are class-major per
    location), with each anchor's logits for classes outside its own group
    pinned to a large negative constant (stop-gradient) — per-class anchor
    assignment never targets a foreign class, so the focal-loss contribution
    of those entries is ~0, reproducing the reference's per-head losses
    without a second loss path.

    `class_groups`: tuple of per-group class-index tuples covering
    0..num_class-1 in order; `anchors_per_loc_each_class`: per-CLASS anchor
    counts (from generate_anchors).
    """

    num_class: int
    class_groups: tuple
    anchors_per_loc_each_class: tuple
    shared_conv_channels: int = 64
    use_direction_classifier: bool = True
    num_dir_bins: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spatial_features_2d):
        conv = functools.partial(
            nn.Conv, kernel_size=(1, 1), dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        x = spatial_features_2d
        if self.shared_conv_channels:
            x = nn.relu(
                nn.Conv(self.shared_conv_channels, (3, 3), padding=1,
                        use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name="shared_conv")(x)
            )
        b, h, w, _ = x.shape
        a_cls = self.anchors_per_loc_each_class
        a_tot = sum(a_cls)
        neg = -np.log((1 - 0.01) / 0.01)

        cls_full = jnp.full((b, h, w, a_tot, self.num_class), -10.0, self.dtype)
        box_parts, dir_parts = [], []
        # class-major anchor offsets per location
        offsets = np.concatenate([[0], np.cumsum(a_cls)])
        for g, group in enumerate(self.class_groups):
            a_g = sum(a_cls[c] for c in group)
            gcls = conv(a_g * len(group),
                        bias_init=nn.initializers.constant(neg),
                        name=f"head{g}_cls")(x)
            gbox = conv(a_g * 7, name=f"head{g}_box")(x)
            gcls = gcls.reshape(b, h, w, a_g, len(group))
            # place each class's anchors/logits at their global slots
            base = 0
            for ci, c in enumerate(group):
                sl = slice(int(offsets[c]), int(offsets[c] + a_cls[c]))
                cls_full = cls_full.at[:, :, :, sl, c].set(
                    gcls[:, :, :, base : base + a_cls[c], ci]
                )
                base += a_cls[c]
            box_parts.append((group, gbox.reshape(b, h, w, a_g, 7)))
            if self.use_direction_classifier:
                gdir = conv(a_g * self.num_dir_bins, name=f"head{g}_dir")(x)
                dir_parts.append(gdir.reshape(b, h, w, a_g, self.num_dir_bins))

        box_full = jnp.zeros((b, h, w, a_tot, 7), self.dtype)
        dir_full = jnp.zeros((b, h, w, a_tot, self.num_dir_bins), self.dtype)
        for g, (group, gbox) in enumerate(box_parts):
            base = 0
            for c in group:
                sl = slice(int(offsets[c]), int(offsets[c] + a_cls[c]))
                box_full = box_full.at[:, :, :, sl, :].set(
                    gbox[:, :, :, base : base + a_cls[c]]
                )
                if dir_parts:
                    dir_full = dir_full.at[:, :, :, sl, :].set(
                        dir_parts[g][:, :, :, base : base + a_cls[c]]
                    )
                base += a_cls[c]

        out = {
            "cls_preds": cls_full.reshape(b, h, w, -1).astype(jnp.float32),
            "box_preds": box_full.reshape(b, h, w, -1).astype(jnp.float32),
        }
        if self.use_direction_classifier:
            out["dir_cls_preds"] = dir_full.reshape(b, h, w, -1).astype(jnp.float32)
        return out
