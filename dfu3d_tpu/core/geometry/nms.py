"""Rotated NMS in pure JAX with static shapes.

TPU-native replacement for the reference's bitmask-parallel CUDA NMS
(pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu `nms_kernel` / `nms_normal_kernel`
and the wrappers iou3d_nms_utils.nms_gpu:120 / nms_normal_gpu:138): we compute
the full pairwise suppression matrix as one batched polygon-clipping pass (MXU/VPU
friendly), then run a sequential keep-scan with `lax.fori_loop`.

All entry points take and return FIXED-SIZE arrays with validity masks, so they
can live inside a jitted/pjitted program. "Selected" results are (post_max,)
index arrays into the caller's box buffer plus a (post_max,) bool validity mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .iou import pairwise_iou_bev

_NEG_INF = -1e9


def _suppression_scan_reference(iou_mat, valid, thresh):
    """Greedy NMS keep-scan, literal sequential form (slow; kept as a test oracle).

    keep[i] = valid[i] and no kept j < i with iou[j, i] > thresh.
    """
    n = iou_mat.shape[0]
    over = iou_mat > thresh
    idx = jnp.arange(n)

    def body(i, keep):
        suppressed = jnp.any(over[:, i] & keep & (idx < i))
        return keep.at[i].set(keep[i] & ~suppressed)

    return jax.lax.fori_loop(0, n, body, valid)


def _suppression_scan(iou_mat, valid, thresh):
    """Greedy NMS keep-scan via alternating fixed-point iteration.

    The greedy result k* is the unique fixed point of the antitone map
        f(keep)[i] = valid[i] & ¬∃ j<i : over[j,i] & keep[j].
    Since f is antitone, g = f∘f is monotone: iterating g from `valid` (all
    kept) gives a decreasing upper bound u_t ⊇ k*, and from f(valid) an
    increasing lower bound l_t ⊆ k*. They meet at k* after O(suppression chain
    depth) steps — typically < 10 for detector output, worst case n. Each f is
    one fused (n, n) masked any-reduction, so the whole scan is a handful of
    VPU passes instead of n sequential steps (the n-step fori_loop form runs
    ~1000× slower on TPU).
    """
    n = iou_mat.shape[0]
    idx = jnp.arange(n)
    # over_tri[j, i] = candidate j (higher score) suppresses i
    over_tri = (iou_mat > thresh) & (idx[:, None] < idx[None, :])

    def f(keep):
        sup = jnp.any(over_tri & keep[:, None], axis=0)
        return valid & ~sup

    def cond(state):
        u, l, t = state
        return jnp.any(u != l) & (t < n)

    def body(state):
        u, l, t = state
        return f(f(u)), f(f(l)), t + 1

    u, l, _ = jax.lax.while_loop(cond, body, (valid, f(valid), jnp.int32(0)))
    return u


@functools.partial(jax.jit, static_argnames=("pre_max", "post_max", "axis_aligned"))
def nms_bev(boxes, scores, thresh, pre_max: int, post_max: int, valid=None,
            axis_aligned: bool = False):
    """Rotated-BEV NMS (reference `nms_gpu` semantics; `nms_normal_gpu` if axis_aligned).

    Args:
        boxes: (N, 7) lidar boxes.
        scores: (N,)
        thresh: IoU threshold (scalar).
        pre_max: boxes entering NMS after score sort (static).
        post_max: max boxes returned (static).
        valid: optional (N,) bool mask of live boxes.
        axis_aligned: ignore heading (axis-aligned BEV IoU, `nms_normal` semantics).
    Returns:
        (indices, keep): (post_max,) int32 indices into `boxes`, (post_max,) bool.
        Indices are ordered by descending score; invalid slots point at index 0.
    """
    n = boxes.shape[0]
    pre_max = min(pre_max, n)
    post_max = min(post_max, pre_max)

    if valid is not None:
        scores = jnp.where(valid, scores, _NEG_INF)
    top_scores, order = jax.lax.top_k(scores, pre_max)
    live = top_scores > _NEG_INF / 2

    b = boxes[order]
    if axis_aligned:
        half = b[:, 3:5] * 0.5
        aligned = jnp.concatenate([b[:, 0:2] - half, b[:, 0:2] + half], axis=-1)
        from .boxes import boxes_iou_normal

        iou = boxes_iou_normal(aligned, aligned)
    else:
        iou = pairwise_iou_bev(b, b)

    keep = _suppression_scan(iou, live, thresh)

    kept_scores = jnp.where(keep, top_scores, _NEG_INF)
    sel_scores, sel_pos = jax.lax.top_k(kept_scores, post_max)
    sel_valid = sel_scores > _NEG_INF / 2
    sel_indices = jnp.where(sel_valid, order[sel_pos], 0)
    return sel_indices.astype(jnp.int32), sel_valid


def class_agnostic_nms(box_scores, box_preds, nms_thresh, pre_max: int, post_max: int,
                       score_thresh=None, valid=None):
    """Single-pass NMS over all classes together.

    Mirrors the reference's model_nms_utils.class_agnostic_nms:6-25 but with a
    fixed-size masked result instead of dynamic gathers.
    """
    if valid is None:
        valid = jnp.ones(box_scores.shape[0], dtype=bool)
    if score_thresh is not None:
        valid = valid & (box_scores >= score_thresh)
    return nms_bev(box_preds[:, 0:7], box_scores, nms_thresh, pre_max, post_max,
                   valid=valid)


def multi_classes_nms(cls_scores, box_preds, nms_thresh, pre_max: int, post_max: int,
                      score_thresh=None, valid=None):
    """Per-class NMS (reference model_nms_utils.multi_classes_nms:28-67).

    Args:
        cls_scores: (N, num_class) per-class scores.
        box_preds: (N, 7+)
    Returns:
        (scores, labels, indices, keep): each (num_class * post_max,) fixed size;
        labels are 0-based class ids.
    """
    num_class = cls_scores.shape[1]
    if valid is None:
        valid = jnp.ones(cls_scores.shape[0], dtype=bool)

    def one_class(scores_k):
        v = valid
        if score_thresh is not None:
            v = v & (scores_k >= score_thresh)
        idx, keep = nms_bev(box_preds[:, 0:7], scores_k, nms_thresh, pre_max,
                            post_max, valid=v)
        return idx, keep, jnp.where(keep, scores_k[idx], 0.0)

    idxs, keeps, scores = jax.vmap(one_class, in_axes=1)(cls_scores)
    labels = jnp.repeat(jnp.arange(num_class, dtype=jnp.int32), idxs.shape[1])
    return (
        scores.reshape(-1),
        labels,
        idxs.reshape(-1),
        keeps.reshape(-1),
    )


def class_specific_nms(box_scores, box_preds, box_labels, nms_thresh_per_class,
                       pre_max: int, post_max: int, score_thresh=None):
    """Per-class NMS with per-class thresholds (reference
    model_nms_utils.class_specific_nms:70-110). box_labels are 0-based.

    Returns (scores, labels, indices, keep), each (num_class * post_max,).
    """
    num_class = len(nms_thresh_per_class)
    outs = []
    for k, thresh in enumerate(nms_thresh_per_class):
        valid = box_labels == k
        if score_thresh is not None:
            st = score_thresh[k] if isinstance(score_thresh, (list, tuple)) else score_thresh
            valid = valid & (box_scores > st)
        idx, keep = nms_bev(box_preds[:, 0:7], box_scores, float(thresh),
                            pre_max=pre_max, post_max=post_max, valid=valid)
        outs.append((jnp.where(keep, box_scores[idx], 0.0),
                     jnp.full_like(idx, k), idx, keep))
    scores = jnp.concatenate([o[0] for o in outs])
    labels = jnp.concatenate([o[1] for o in outs])
    indices = jnp.concatenate([o[2] for o in outs])
    keeps = jnp.concatenate([o[3] for o in outs])
    return scores, labels, indices, keeps


@functools.partial(jax.jit, static_argnames=("post_max",))
def circle_nms(boxes, scores, min_radius, post_max: int, valid=None):
    """Distance-based circle NMS (reference centernet_utils.circle_nms:100-130,
    the numba-CUDA kernel): suppress any box whose center lies within
    min_radius of an already-kept higher-scoring box.

    Returns (indices, keep) like nms_bev.
    """
    n = boxes.shape[0]
    post_max = min(post_max, n)
    if valid is not None:
        scores = jnp.where(valid, scores, _NEG_INF)
    top_scores, order = jax.lax.top_k(scores, n)
    live = top_scores > _NEG_INF / 2
    b = boxes[order]
    d2 = jnp.sum((b[:, None, 0:2] - b[None, :, 0:2]) ** 2, axis=-1)
    keep = _suppression_scan(
        jnp.where(d2 < min_radius * min_radius, 1.0, 0.0), live, 0.5
    )
    kept_scores = jnp.where(keep, top_scores, _NEG_INF)
    sel_scores, sel_pos = jax.lax.top_k(kept_scores, post_max)
    sel_valid = sel_scores > _NEG_INF / 2
    return jnp.where(sel_valid, order[sel_pos], 0).astype(jnp.int32), sel_valid
