"""Rotated BEV / 3D IoU in pure JAX.

TPU-native replacement for the reference's CUDA kernels (SURVEY §2.1 N1:
pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu — `boxes_overlap_bev_gpu`,
`boxes_iou_bev_gpu`, `boxes_iou3d_gpu`).

Algorithm: Green's-theorem convex intersection. The boundary of A∩B for convex
CCW polygons consists of the sub-segments of A's edges inside B plus the
sub-segments of B's edges inside A; by Green's theorem the enclosed area is the
sum of each sub-segment's signed contribution 0.5·(x_p·y_q − x_q·y_p). Each
edge-in-polygon clip is a Liang–Barsky parametric clip against 4 half-planes —
**pure elementwise math**: no scatter, no sort, no dynamic control flow, so a
full (N, M) pairwise IoU is one fused VPU pass. (A Sutherland–Hodgman polygon
clipper needs per-pair compaction scatters, which serialize on TPU and run
~1000× slower at NMS sizes.)

Shared-boundary double counting is avoided by clipping A's edges inclusively
(side ≥ −tol) and B's edges exclusively (side ≥ +tol): coincident boundary
segments (e.g. identical boxes) are counted exactly once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import boxes_to_corners_bev

_EPS = 1e-9
_TOL = 1e-6  # boundary tolerance in meters (sides are normalized distances)


def _edge_contributions(poly_p, poly_q, boundary_shift):
    """Signed Green's-theorem contribution of poly_p's edges clipped inside poly_q.

    Args:
        poly_p: (..., 4, 2) CCW quad whose edges we clip.
        poly_q: (..., 4, 2) CCW quad acting as the clip region.
        boundary_shift: scalar — added to signed distances before the inside
            test. +_TOL ⇒ inclusive (boundary counts as inside), −_TOL ⇒
            exclusive (boundary counts as outside).
    Returns:
        (...,) summed signed area contribution.
    """
    p = poly_p  # (..., 4, 2) edge starts
    q = jnp.roll(poly_p, -1, axis=-2)  # edge ends

    # Half-planes of poly_q: edge k from e1 to e2, inside = left of e1→e2.
    e1 = poly_q
    e2 = jnp.roll(poly_q, -1, axis=-2)
    d = e2 - e1  # (..., 4, 2)
    inv_len = jax.lax.rsqrt(
        jnp.maximum(d[..., 0] ** 2 + d[..., 1] ** 2, _EPS)
    )  # (..., 4)

    def sides(pts):
        # pts: (..., 4, 2) → (..., 4edges_of_p, 4planes_of_q) normalized distance
        rel_x = pts[..., :, None, 0] - e1[..., None, :, 0]
        rel_y = pts[..., :, None, 1] - e1[..., None, :, 1]
        s = d[..., None, :, 0] * rel_y - d[..., None, :, 1] * rel_x
        return s * inv_len[..., None, :] + boundary_shift

    sp = sides(p)  # (..., 4, 4)
    sq = sides(q)

    den = sp - sq
    den = jnp.where(jnp.abs(den) < _EPS, _EPS, den)
    t_cross = sp / den

    p_in = sp >= 0.0
    q_in = sq >= 0.0
    # Liang–Barsky interval per plane, then intersect over the 4 planes.
    t_lo_k = jnp.where(~p_in & q_in, t_cross, 0.0)
    t_hi_k = jnp.where(p_in & ~q_in, t_cross, 1.0)
    empty_k = ~p_in & ~q_in
    t_lo = jnp.max(jnp.where(empty_k, 1.0, t_lo_k), axis=-1)  # (..., 4)
    t_hi = jnp.min(jnp.where(empty_k, 0.0, t_hi_k), axis=-1)
    live = t_hi > t_lo

    seg = q - p
    px = p[..., 0] + seg[..., 0] * t_lo
    py = p[..., 1] + seg[..., 1] * t_lo
    qx = p[..., 0] + seg[..., 0] * t_hi
    qy = p[..., 1] + seg[..., 1] * t_hi
    contrib = 0.5 * (px * qy - qx * py)
    return jnp.sum(jnp.where(live, contrib, 0.0), axis=-1)


def _quad_intersection_area(corners_a, corners_b):
    """Intersection area of CCW quads: (..., 4, 2) × (..., 4, 2) → (...,)."""
    # Center each pair to keep fp32 cancellation small at any world position.
    mid = (
        jnp.mean(corners_a, axis=-2, keepdims=True)
        + jnp.mean(corners_b, axis=-2, keepdims=True)
    ) * 0.5
    ca = corners_a - mid
    cb = corners_b - mid
    area = _edge_contributions(ca, cb, +_TOL) + _edge_contributions(cb, ca, -_TOL)
    return jnp.maximum(area, 0.0)


def pairwise_overlap_bev(boxes_a, boxes_b):
    """Rotated BEV intersection area. (N, 7) × (M, 7) → (N, M).

    Accepts (N, 5) [x, y, dx, dy, angle] too.
    """
    ca = boxes_to_corners_bev(boxes_a)  # (N, 4, 2)
    cb = boxes_to_corners_bev(boxes_b)  # (M, 4, 2)
    return _quad_intersection_area(ca[:, None], cb[None, :])


def _bev_area(boxes):
    if boxes.shape[-1] >= 7:
        return boxes[:, 3] * boxes[:, 4]
    return boxes[:, 2] * boxes[:, 3]


def pairwise_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU. (N, 7|5) × (M, 7|5) → (N, M)."""
    inter = pairwise_overlap_bev(boxes_a, boxes_b)
    area_a = _bev_area(boxes_a)
    area_b = _bev_area(boxes_b)
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def pairwise_iou3d(boxes_a, boxes_b):
    """3D IoU of lidar boxes: BEV polygon overlap × z-interval overlap.

    Same decomposition as the reference's boxes_iou3d_gpu
    (pcdet/ops/iou3d_nms/iou3d_nms_utils.py:48-76).
    """
    inter_bev = pairwise_overlap_bev(boxes_a, boxes_b)
    za_min = boxes_a[:, 2] - boxes_a[:, 5] / 2.0
    za_max = boxes_a[:, 2] + boxes_a[:, 5] / 2.0
    zb_min = boxes_b[:, 2] - boxes_b[:, 5] / 2.0
    zb_max = boxes_b[:, 2] + boxes_b[:, 5] / 2.0
    overlap_h = jnp.maximum(
        jnp.minimum(za_max[:, None], zb_max[None, :])
        - jnp.maximum(za_min[:, None], zb_min[None, :]),
        0.0,
    )
    inter = inter_bev * overlap_h
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return inter / jnp.clip(vol_a[:, None] + vol_b[None, :] - inter, 1e-6)


def aligned_overlap_bev(boxes_a, boxes_b):
    """Element-wise rotated BEV intersection of equal-length sets: (N,) each."""
    ca = boxes_to_corners_bev(boxes_a)
    cb = boxes_to_corners_bev(boxes_b)
    return _quad_intersection_area(ca, cb)


def aligned_iou3d(boxes_a, boxes_b):
    """Element-wise 3D IoU of two equal-length box sets: (N, 7) × (N, 7) → (N,).

    (reference: paired_boxes_iou3d_gpu, iou3d_nms_utils.py:156-188)
    """
    inter_bev = aligned_overlap_bev(boxes_a, boxes_b)
    overlap_h = jnp.maximum(
        jnp.minimum(boxes_a[:, 2] + boxes_a[:, 5] / 2, boxes_b[:, 2] + boxes_b[:, 5] / 2)
        - jnp.maximum(
            boxes_a[:, 2] - boxes_a[:, 5] / 2, boxes_b[:, 2] - boxes_b[:, 5] / 2
        ),
        0.0,
    )
    inter = inter_bev * overlap_h
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-6)
