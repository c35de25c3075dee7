"""Reference-exact RoI head machinery shared by the two-stage detectors.

Mirrors pcdet/models/roi_heads/roi_head_template.py and
target_assigner/proposal_target_layer.py as static-shape JAX:

- `proposal_layer`            — roi_head_template.py:45-102 (class-agnostic NMS
  with per-phase pre/post sizes, roi_labels = argmax class + 1).
- `assign_roi_targets`        — proposal_target_layer.py:13-228 (per-class
  max-IoU gt matching, fg/hard-bg/easy-bg subsampling to ROI_PER_IMAGE,
  soft `roi_iou` cls labels) + roi_head_template.py:104-134 (canonical
  transform with opposite-heading flip into [-π/2, π/2]).
- `roi_cls_loss` / `roi_reg_loss` — roi_head_template.py:136-218 (BCE on soft
  iou labels; canonical smooth-L1 vs zero-centered roi-sized anchors; corner
  loss regularization per loss_utils.get_corner_loss_lidar:211-234).
- `generate_predicted_boxes`  — roi_head_template.py:233-261 (decode in the
  roi frame, rotate by roi heading, shift to the roi center).
- `dense_grid_points`         — the G³ RoI grid in the reference's order
  (x slowest / z fastest: `faked_features.nonzero()`, pvrcnn_head.py:123-132),
  so flattened grid features line up with converted torch FC weights.
- `FCStack`                   — make_fc_layers (roi_head_template.py:29-43)
  and the per-head Linear/Conv1d stacks (identical math; BN1d defaults
  eps=1e-5 / torch momentum 0.1 ≡ flax momentum 0.9).

Deviation (documented): the reference subsamples background with replacement
(`torch.randint`, proposal_target_layer.py:164-192); here sampling is without
replacement via randomized ranks, with wrap-around refill when fewer
candidates than slots exist. Composition (fg count, hard:easy ratio,
exhaustion fallback) matches.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.geometry.boxes import boxes_to_corners_3d, rotate_points_along_z
from ..core.geometry.iou import pairwise_iou3d
from ..core.geometry.nms import nms_bev
from .anchor_head import decode_boxes, encode_boxes

PI = 3.141592653589793


# ---------------------------------------------------------------------------
# RoI grid points (reference ordering)
# ---------------------------------------------------------------------------

def dense_grid_points(rois, grid_size: int):
    """Local RoI grid points, reference order (x slowest, z fastest).

    rois: (..., 7+) → (..., G³, 3). Matches get_dense_grid_points
    (pvrcnn_head.py:123-132): dense_idx = ones(g,g,g).nonzero() enumerates
    (x_idx, y_idx, z_idx) row-major, then (idx + 0.5)/g * size - size/2.
    """
    g = grid_size
    idx = jnp.stack(
        jnp.meshgrid(jnp.arange(g), jnp.arange(g), jnp.arange(g),
                     indexing="ij"),
        axis=-1,
    ).reshape(-1, 3).astype(jnp.float32)  # (g³, 3) x slowest, z fastest
    sizes = rois[..., None, 3:6]
    return (idx + 0.5) / g * sizes - sizes / 2.0


def global_grid_points(rois, grid_size: int):
    """Global grid points: rotate local grid by roi ry, shift to roi center
    (get_global_grid_points_of_roi, pvrcnn_head.py:111-121)."""
    local = dense_grid_points(rois, grid_size)             # (..., g³, 3)
    rot = rotate_points_along_z(local, rois[..., 6])
    return rot + rois[..., None, 0:3]


# ---------------------------------------------------------------------------
# Proposal layer
# ---------------------------------------------------------------------------

def resolve_nms_cfg(roi_cfg, train: bool):
    """NMS_CONFIG.TRAIN/TEST (reference schema) with legacy flat-key fallback."""
    nc = roi_cfg.get("NMS_CONFIG", None)
    if nc is not None and ("TRAIN" in nc or "TEST" in nc):
        phase = nc["TRAIN" if train else "TEST"]
        return dict(
            pre_max=int(phase.get("NMS_PRE_MAXSIZE", 1024)),
            post_max=int(phase.get("NMS_POST_MAXSIZE", 128)),
            thresh=float(phase.get("NMS_THRESH", 0.7)),
            score_thresh=phase.get("SCORE_THRESH", None),
        )
    return dict(
        pre_max=int(roi_cfg.get("NMS_PRE_MAXSIZE", 1024)),
        post_max=int(roi_cfg.get("NMS_POST_MAXSIZE",
                                 roi_cfg.get("NMS_POST_MAXSIZE_TEST", 100))),
        thresh=float(roi_cfg.get("NMS_THRESH", 0.7)),
        score_thresh=None,
    )


def proposal_layer(batch_boxes, batch_cls, nms_cfg):
    """RPN decoded boxes → rois (roi_head_template.py proposal_layer:45-102).

    Args:
        batch_boxes: (B, N, 7+) decoded boxes.
        batch_cls: (B, N, num_class) raw class scores/logits.
        nms_cfg: dict from `resolve_nms_cfg`.
    Returns:
        rois (B, P, 7+), roi_scores (B, P), roi_labels (B, P) in 1..K,
        roi_valid (B, P) bool. P = nms_cfg['post_max'].
    """
    scores = jnp.max(batch_cls, axis=-1)
    labels = jnp.argmax(batch_cls, axis=-1) + 1
    if nms_cfg.get("score_thresh") is not None:
        scores = jnp.where(scores >= nms_cfg["score_thresh"], scores, -jnp.inf)

    def one(bx, sc, lb):
        sel, keep = nms_bev(
            bx, sc, nms_cfg["thresh"],
            pre_max=min(nms_cfg["pre_max"], bx.shape[0]),
            post_max=nms_cfg["post_max"],
        )
        # zero out padded slots like the reference's new_zeros buffers
        r = jnp.where(keep[:, None], bx[sel], 0.0)
        s = jnp.where(keep, sc[sel], 0.0)
        l = jnp.where(keep, lb[sel], 0)
        return r, s, l, keep

    return jax.vmap(one)(
        jax.lax.stop_gradient(batch_boxes),
        jax.lax.stop_gradient(scores),
        labels,
    )


_DEFAULT_TARGET_CONFIG = {
    "BOX_CODER": "ResidualCoder",
    "ROI_PER_IMAGE": 128,
    "FG_RATIO": 0.5,
    "SAMPLE_ROI_BY_EACH_CLASS": True,
    "CLS_SCORE_TYPE": "roi_iou",
    "CLS_FG_THRESH": 0.75,
    "CLS_BG_THRESH": 0.25,
    "CLS_BG_THRESH_LO": 0.1,
    "HARD_BG_RATIO": 0.8,
    "REG_FG_THRESH": 0.55,
}

_DEFAULT_LOSS_CONFIG = {
    "CLS_LOSS": "BinaryCrossEntropy",
    "REG_LOSS": "smooth-l1",
    "CORNER_LOSS_REGULARIZATION": True,
    "LOSS_WEIGHTS": {
        "rcnn_cls_weight": 1.0,
        "rcnn_reg_weight": 1.0,
        "rcnn_corner_weight": 1.0,
        "code_weights": [1.0] * 7,
    },
}


def roi_head_target_cfg(rh_cfg):
    """TARGET_CONFIG with the reference voxel_rcnn_car.yaml defaults filled."""
    out = dict(_DEFAULT_TARGET_CONFIG)
    out.update(dict(rh_cfg.get("TARGET_CONFIG", {})))
    return out


def roi_head_loss_cfg(rh_cfg):
    out = dict(_DEFAULT_LOSS_CONFIG)
    given = dict(rh_cfg.get("LOSS_CONFIG", {}))
    lw = dict(out["LOSS_WEIGHTS"])
    lw.update(dict(given.pop("LOSS_WEIGHTS", {})))
    out.update(given)
    out["LOSS_WEIGHTS"] = lw
    return out


# ---------------------------------------------------------------------------
# Proposal target layer
# ---------------------------------------------------------------------------

def _rank(key):
    """Dense rank of each element under ascending sort."""
    order = jnp.argsort(key)
    rank = jnp.zeros_like(order)
    return rank.at[order].set(jnp.arange(key.shape[0]))


def max_iou_with_same_class(rois, roi_labels, gt_boxes, gt_labels, gt_valid):
    """Per-roi max 3D IoU over same-class gt (proposal_target_layer.py:194-228).

    Rois whose class has no valid gt keep overlap 0 / assignment 0, like the
    reference's zero-initialized buffers.
    """
    iou = pairwise_iou3d(rois[:, :7], gt_boxes[:, :7])      # (R, G)
    mask = (roi_labels[:, None] == gt_labels[None, :]) & gt_valid[None, :]
    max_overlaps = jnp.max(jnp.where(mask, iou, 0.0), axis=1)
    gt_assignment = jnp.argmax(jnp.where(mask, iou, -1.0), axis=1)
    has_match = jnp.any(mask, axis=1)
    return max_overlaps, jnp.where(has_match, gt_assignment, 0)


def _subsample_rois(key, max_overlaps, tcfg):
    """Static-shape fg/hard-bg/easy-bg sampling (proposal_target_layer.py:117-162).

    Returns (M,) indices into the roi axis, M = ROI_PER_IMAGE.
    """
    n = max_overlaps.shape[0]
    m = int(tcfg["ROI_PER_IMAGE"])
    fg_per_image = int(round(float(tcfg["FG_RATIO"]) * m))
    fg_thresh = min(float(tcfg["REG_FG_THRESH"]), float(tcfg["CLS_FG_THRESH"]))
    lo = float(tcfg["CLS_BG_THRESH_LO"])
    hard_ratio = float(tcfg["HARD_BG_RATIO"])

    is_fg = max_overlaps >= fg_thresh
    is_easy = max_overlaps < lo
    is_hard = (max_overlaps < float(tcfg["REG_FG_THRESH"])) & (~is_easy) & (~is_fg)

    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n,))
    big = jnp.float32(1e9)

    fg_rank = _rank(jnp.where(is_fg, u, jnp.inf))
    sel_fg = is_fg & (fg_rank < fg_per_image)

    # bg priority: hard and easy interleaved at HARD_BG_RATIO by scaled rank
    u2 = jax.random.uniform(k2, (n,))
    hard_rank = _rank(jnp.where(is_hard, u2, jnp.inf)).astype(jnp.float32)
    easy_rank = _rank(jnp.where(is_easy, u2, jnp.inf)).astype(jnp.float32)
    bg_key = jnp.where(
        is_hard, (hard_rank + 0.5) / max(hard_ratio, 1e-3),
        jnp.where(is_easy, (easy_rank + 0.5) / max(1.0 - hard_ratio, 1e-3),
                  big),
    )

    # global order: selected fg first, then bg, then demoted fg (last resort)
    order_key = jnp.where(
        sel_fg, fg_rank.astype(jnp.float32) - 2.0 * big,
        jnp.where(is_fg, 2.0 * big + fg_rank.astype(jnp.float32), bg_key),
    )
    order = jnp.argsort(order_key)

    n_avail = jnp.sum(sel_fg) + jnp.sum(is_hard) + jnp.sum(is_easy)
    # wrap-around refill emulates the reference's with-replacement sampling
    # when one side is exhausted (proposal_target_layer.py:143-155)
    pos = jnp.arange(m)
    pos = jnp.where(pos < n_avail, pos, pos % jnp.maximum(n_avail, 1))
    return order[pos]


def assign_roi_targets(key, rois, roi_labels, roi_scores, gt_boxes, gt_valid,
                       tcfg):
    """Sample ROI_PER_IMAGE rois + build canonical targets.

    Args:
        key: PRNG key.
        rois: (B, P, 7+) proposal boxes. roi_labels (B, P) 1..K.
        gt_boxes: (B, G, 8+) with class id in the LAST column.
        gt_valid: (B, G) bool.
        tcfg: TARGET_CONFIG mapping.
    Returns dict with rois (B,M,7), roi_labels, roi_scores, gt_of_rois
    (canonical, (B,M,8)), gt_of_rois_src, gt_iou_of_rois, reg_valid_mask,
    rcnn_cls_labels — the reference targets_dict contract.
    """
    by_class = bool(tcfg.get("SAMPLE_ROI_BY_EACH_CLASS", False))

    def one(k, r, rl, rs, gt, gv):
        gt_labels = gt[:, -1].astype(jnp.int32)
        if by_class:
            overlaps, assignment = max_iou_with_same_class(
                r, rl, gt, gt_labels, gv
            )
        else:
            iou = pairwise_iou3d(r[:, :7], gt[:, :7])
            iou = jnp.where(gv[None, :], iou, 0.0)
            overlaps = jnp.max(iou, axis=1)
            assignment = jnp.argmax(jnp.where(gv[None, :], iou, -1.0), axis=1)

        sampled = _subsample_rois(k, overlaps, tcfg)
        gt_of = jnp.concatenate(
            [gt[:, :7], gt_labels[:, None].astype(gt.dtype)], axis=-1
        )
        return (r[sampled][:, :7], rl[sampled], rs[sampled],
                overlaps[sampled], gt_of[assignment[sampled]], sampled)

    keys = jax.random.split(key, rois.shape[0])
    s_rois, s_labels, s_scores, s_ious, gt_of_rois, sampled_idx = jax.vmap(
        one
    )(keys, rois, roi_labels, roi_scores, gt_boxes, gt_valid)

    reg_valid_mask = (s_ious > float(tcfg["REG_FG_THRESH"])).astype(jnp.int32)

    cls_type = tcfg.get("CLS_SCORE_TYPE", "roi_iou")
    fg_t = float(tcfg["CLS_FG_THRESH"])
    bg_t = float(tcfg["CLS_BG_THRESH"])
    if cls_type == "cls":
        cls_labels = (s_ious > fg_t).astype(jnp.float32)
        ignore = (s_ious > bg_t) & (s_ious < fg_t)
        cls_labels = jnp.where(ignore, -1.0, cls_labels)
    elif cls_type == "roi_iou":
        fg = s_ious > fg_t
        bg = s_ious < bg_t
        soft = (s_ious - bg_t) / (fg_t - bg_t)
        cls_labels = jnp.where(fg, 1.0, jnp.where(bg, 0.0, soft))
    else:
        raise NotImplementedError(cls_type)

    gt_of_rois_src = gt_of_rois
    ct = canonicalize_gt_of_rois(s_rois, gt_of_rois)

    return {
        "rois": s_rois,
        "roi_labels": s_labels,
        "roi_scores": s_scores,
        "gt_iou_of_rois": s_ious,
        "gt_of_rois": ct,
        "gt_of_rois_src": gt_of_rois_src,
        "reg_valid_mask": reg_valid_mask,
        "rcnn_cls_labels": cls_labels,
        # indices into the proposal axis — for gathering side tensors that
        # ride along with the sampled rois (MPPNet trajectory_rois,
        # mppnet_head.py sample_rois_for_mppnet:100-160)
        "sampled_idx": sampled_idx,
    }


def canonicalize_gt_of_rois(rois, gt_of_rois):
    """Canonical transformation + opposite-heading flip into [-π/2, π/2]
    (roi_head_template.py assign_targets:113-132). Extra columns (class id)
    pass through the rotation untouched."""
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * PI)
    ct = gt_of_rois.at[..., 0:3].add(-roi_center)
    ct = ct.at[..., 6].add(-roi_ry)
    ct = rotate_points_along_z(ct[..., None, :], -roi_ry)[..., 0, :]

    heading = ct[..., 6] % (2 * PI)
    opposite = (heading > PI * 0.5) & (heading < PI * 1.5)
    heading = jnp.where(opposite, (heading + PI) % (2 * PI), heading)
    heading = jnp.where(heading > PI, heading - 2 * PI, heading)
    heading = jnp.clip(heading, -PI / 2, PI / 2)
    return ct.at[..., 6].set(heading)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def _smooth_l1(diff, beta: float):
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def get_corner_loss_lidar(pred_boxes, gt_boxes):
    """Per-box mean corner huber distance (loss_utils.py:211-234)."""
    pc = boxes_to_corners_3d(pred_boxes)
    gc = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(PI)
    gcf = boxes_to_corners_3d(gt_flip)
    dist = jnp.minimum(
        jnp.linalg.norm(pc - gc, axis=2), jnp.linalg.norm(pc - gcf, axis=2)
    )
    return jnp.mean(_smooth_l1(dist, 1.0), axis=1)


def roi_cls_loss(rcnn_cls, rcnn_cls_labels, loss_cfg):
    """get_box_cls_layer_loss (roi_head_template.py:200-218)."""
    lw = float(loss_cfg["LOSS_WEIGHTS"]["rcnn_cls_weight"])
    kind = loss_cfg.get("CLS_LOSS", "BinaryCrossEntropy")
    labels = rcnn_cls_labels.reshape(-1)
    if kind == "BinaryCrossEntropy":
        x = rcnn_cls.reshape(-1)
        y = labels
        per = jnp.clip(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
        mask = (labels >= 0).astype(jnp.float32)
        loss = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    elif kind == "CrossEntropy":
        logits = rcnn_cls.reshape(labels.shape[0], -1)
        lab = jnp.maximum(labels.astype(jnp.int32), 0)
        per = -jax.nn.log_softmax(logits)[jnp.arange(lab.shape[0]), lab]
        mask = (labels >= 0).astype(jnp.float32)
        loss = jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    else:
        raise NotImplementedError(kind)
    return loss * lw


def roi_reg_loss(rcnn_reg, targets, loss_cfg):
    """get_box_reg_layer_loss (roi_head_template.py:136-198): canonical
    smooth-L1 vs zero-centered roi-sized anchors + optional corner loss."""
    lw = loss_cfg["LOSS_WEIGHTS"]
    code_w = jnp.asarray(lw["code_weights"], dtype=jnp.float32)
    rois = targets["rois"].reshape(-1, targets["rois"].shape[-1])[:, :7]
    gt_ct = targets["gt_of_rois"][..., :7].reshape(-1, 7)
    gt_src = targets["gt_of_rois_src"][..., :7].reshape(-1, 7)
    reg = rcnn_reg.reshape(-1, rcnn_reg.shape[-1])[:, :7]
    fg = (targets["reg_valid_mask"].reshape(-1) > 0).astype(jnp.float32)
    fg_sum = jnp.maximum(jnp.sum(fg), 1.0)

    rois_anchor = rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    reg_targets = encode_boxes(gt_ct, rois_anchor)
    per = _smooth_l1((reg_targets - reg) * code_w[None, :], 1.0 / 9.0)
    loss = jnp.sum(jnp.sum(per, axis=-1) * fg) / fg_sum
    loss = loss * float(lw["rcnn_reg_weight"])
    tb = {"rcnn_loss_reg": loss}

    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        anchors = rois.at[:, 0:3].set(0.0)         # keeps roi ry, sizes
        boxes = decode_boxes(reg, anchors)
        boxes = rotate_points_along_z(boxes[:, None, :], rois[:, 6])[:, 0, :]
        boxes = boxes.at[:, 0:3].add(rois[:, 0:3])
        corner = get_corner_loss_lidar(boxes[:, :7], gt_src)
        corner = jnp.sum(corner * fg) / fg_sum
        corner = corner * float(lw["rcnn_corner_weight"])
        loss = loss + corner
        tb["rcnn_loss_corner"] = corner

    tb["rcnn_loss_reg_total"] = loss
    return loss, tb


def roi_head_loss(rcnn_cls, rcnn_reg, targets, loss_cfg):
    """get_loss (roi_head_template.py:220-231)."""
    cls_loss = roi_cls_loss(rcnn_cls, targets["rcnn_cls_labels"], loss_cfg)
    reg_loss, tb = roi_reg_loss(rcnn_reg, targets, loss_cfg)
    tb["rcnn_loss_cls"] = cls_loss
    total = cls_loss + reg_loss
    tb["rcnn_loss"] = total
    return total, tb


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def generate_predicted_boxes(rois, box_preds):
    """Canonical decode (roi_head_template.py:233-261).

    rois: (B, N, 7+), box_preds: (B, N, code) → (B, N, 7) refined boxes.
    """
    roi_ry = rois[..., 6]
    roi_xyz = rois[..., 0:3]
    local_rois = rois[..., :7].at[..., 0:3].set(0.0)
    boxes = decode_boxes(box_preds[..., :7], local_rois)
    boxes = rotate_points_along_z(boxes[..., None, :], roi_ry)[..., 0, :]
    return boxes.at[..., 0:3].add(roi_xyz)


def final_nms(boxes, scores, labels, valid, pp_cfg):
    """Post-processing class-agnostic NMS over refined boxes
    (detector3d_template.post_processing:177-284 default path)."""
    nms_cfg = pp_cfg["NMS_CONFIG"]
    score_thresh = float(pp_cfg.get("SCORE_THRESH", 0.1))
    pre_max = int(nms_cfg["NMS_PRE_MAXSIZE"])
    post_max = int(nms_cfg["NMS_POST_MAXSIZE"])
    thresh = float(nms_cfg["NMS_THRESH"])

    def one(bx, sc, lb, v):
        live = v & (sc >= score_thresh)
        sel, keep = nms_bev(bx, jnp.where(live, sc, 0.0), thresh,
                            pre_max=min(pre_max, bx.shape[0]),
                            post_max=post_max, valid=live)
        return bx[sel], jnp.where(keep, sc[sel], 0.0), lb[sel], keep

    return jax.vmap(one)(boxes, scores, labels, valid)


# ---------------------------------------------------------------------------
# FC stacks
# ---------------------------------------------------------------------------

class FCStack(nn.Module):
    """[Dense(bias=False) + BN1d + ReLU]* with configurable dropout slots and
    an optional final biased Dense.

    make_fc_layers (roi_head_template.py:29-43): dropout_after=(0,),
    out_channels set. VoxelRCNN shared/cls/reg stacks (voxelrcnn_head.py:40-79):
    dropout after every block but the last. Conv1d(k=1)/Linear are the same
    contraction; BN1d torch defaults → flax momentum 0.9, eps 1e-5.
    """

    fc_list: Sequence[int]
    dp_ratio: float = 0.0
    dropout_after: Sequence[int] = ()
    out_channels: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for i, c in enumerate(self.fc_list):
            x = nn.Dense(c, use_bias=False, name=f"fc{i}", dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}", dtype=jnp.float32,
            )(x)
            x = nn.relu(x)
            if (i in tuple(self.dropout_after) and self.dp_ratio > 0
                    and train and self.has_rng("dropout")):
                x = nn.Dropout(self.dp_ratio, deterministic=False)(x)
        if self.out_channels is not None:
            x = nn.Dense(self.out_channels, use_bias=True, name="out",
                         dtype=self.dtype)(x)
        return x


class NeighborVoxelSA(nn.Module):
    """Single-scale NeighborVoxelSAModuleMSG (voxel_pool_modules.py:8-127):
    per grid point, gather ≤nsample voxel centers in a radius ball, then
    mlp_in(features) + mlp_pos(relative xyz) → ReLU → pool → mlp_out.

    TPU redesign notes: the reference prunes candidates with a voxel-window
    hash query (QUERY_RANGES) before the radius check; for the shipped
    configs the window contains the radius ball, so a pure ball query over
    voxel centers selects the same neighbor set (truncation order beyond
    nsample may differ — pooled away under max_pool). Empty balls are zeroed
    before mlp_pos exactly like `grouped_features[empty_ball_mask] = 0`.
    """

    mlp_spec: Sequence[int]  # (C_mid, C_out); input width inferred
    radius: float
    nsample: int
    pool_method: str = "max_pool"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, grid_xyz, grid_valid, vox_xyz, vox_feats, vox_valid,
                 train: bool):
        """grid_xyz (B, M, 3), vox_xyz (B, N, 3), vox_feats (B, N, C) →
        (B, M, C_out)."""
        from ..core.pointnet2 import ball_query
        from .vfe import MaskedBatchNorm

        c_mid, c_out = int(self.mlp_spec[0]), int(self.mlp_spec[1])

        # mlps_in: Conv1d + BN over all voxels, NO relu
        f = nn.Dense(c_mid, use_bias=False, name="in_dense",
                     dtype=self.dtype, param_dtype=jnp.float32)(vox_feats)
        fm = jnp.broadcast_to(vox_valid[..., None], f[..., :1].shape)
        f = MaskedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            name="in_bn")(
            f.reshape(-1, c_mid), fm.reshape(-1), train
        ).reshape(f.shape)

        def q(x, v, nx, nv):
            return ball_query(self.radius, self.nsample, x, v, nx, nv)

        idx, has = jax.vmap(q)(vox_xyz, vox_valid, grid_xyz, grid_valid)
        gf = jax.vmap(lambda ff, ii: jnp.take(ff, ii, axis=0))(f, idx)
        gx = jax.vmap(lambda xx, ii: jnp.take(xx, ii, axis=0))(vox_xyz, idx)
        gx = gx - grid_xyz[:, :, None, :]
        gf = jnp.where(has[..., None, None], gf, 0.0)
        gx = jnp.where(has[..., None, None], gx, 0.0)

        # mlps_pos: Conv2d + BN over (grid, nsample), NO relu
        pos = nn.Dense(c_mid, use_bias=False, name="pos_dense",
                       dtype=self.dtype, param_dtype=jnp.float32)(gx)
        pm = jnp.broadcast_to(grid_valid[..., None, None],
                              pos[..., :1].shape)
        pos = MaskedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                              name="pos_bn")(
            pos.reshape(-1, c_mid), pm.reshape(-1), train
        ).reshape(pos.shape)

        h = nn.relu(gf + pos)
        if self.pool_method == "max_pool":
            h = jnp.max(h, axis=2)
        else:
            h = jnp.mean(h, axis=2)

        # mlps_out: Conv1d + BN + ReLU
        out = nn.Dense(c_out, use_bias=False, name="out_dense",
                       dtype=self.dtype, param_dtype=jnp.float32)(h)
        om = jnp.broadcast_to(grid_valid[..., None], out[..., :1].shape)
        out = MaskedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                              name="out_bn")(
            out.reshape(-1, c_out), om.reshape(-1), train
        ).reshape(out.shape)
        return nn.relu(out)


def make_fc_stack(fc_list, out_channels, dp_ratio, dtype=jnp.float32, name=None):
    """The reference's make_fc_layers: dropout after block 0 only."""
    return FCStack(fc_list=tuple(fc_list), dp_ratio=dp_ratio,
                   dropout_after=(0,), out_channels=out_channels,
                   dtype=dtype, name=name)


def shared_fc_stack(fc_list, dp_ratio, dtype=jnp.float32, name=None):
    """The per-head shared_fc_layer: dropout between blocks, none after last."""
    n = len(fc_list)
    return FCStack(fc_list=tuple(fc_list), dp_ratio=dp_ratio,
                   dropout_after=tuple(range(n - 1)), out_channels=None,
                   dtype=dtype, name=name)
