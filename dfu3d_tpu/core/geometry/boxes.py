"""Box geometry primitives in pure JAX (fp32, static shapes).

Box conventions follow the reference framework's public contract so that configs,
info pkls, and KITTI-format artifacts remain interchangeable:

* LiDAR box: ``[x, y, z, dx, dy, dz, heading]`` — ``(x, y, z)`` is the 3D *center*,
  ``dx/dy/dz`` are sizes along the box-local x/y/z axes, ``heading`` rotates around
  +z with x→y positive (reference: pcdet/utils/box_utils.py:28-53).
* Camera (KITTI rect) box: ``[x, y, z, l, h, w, ry]`` — ``(x, y, z)`` is the *bottom*
  center in the rectified camera frame, ``ry`` rotates around the camera y axis
  (reference: pcdet/utils/box_utils.py:134-150, 203-219).

All functions are jit-compatible: fixed shapes, no data-dependent control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Corner template matching the reference ordering (pcdet/utils/box_utils.py:44-46):
#         7 -------- 4
#        /|         /|
#       6 -------- 5 .
#       | |        | |
#       . 3 -------- 0
#       |/         |/
#       2 -------- 1
_CORNER_TEMPLATE_3D = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
) / 2.0

# BEV corners in counter-clockwise order (convexity assumed by the polygon clipper).
_CORNER_TEMPLATE_BEV_CCW = np.array(
    [[1, -1], [1, 1], [-1, 1], [-1, -1]], dtype=np.float32
) / 2.0


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap angles into ``[-offset*period, (1-offset)*period)``.

    Same semantics as the reference's common_utils.limit_period
    (pcdet/utils/common_utils.py:21-24).
    """
    return val - jnp.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(…,) angle → (…, 3, 3) rotation around +z, x→y positive."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.stack(
        [c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1
    )
    return rot.reshape(angle.shape + (3, 3))


def rotate_points_along_z(points, angle):
    """Rotate points around +z.

    Elementwise formulation (not einsum): a 2×2 rotation through the MXU would
    silently run in bf16 on TPU; the VPU form is exact fp32 and faster for
    tiny contractions.

    Args:
        points: (..., N, 3 + C)
        angle: (...,) radians, x→y positive.
    Returns:
        rotated points, same shape. Extra channels pass through.
    """
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    x, y = points[..., 0], points[..., 1]
    rx = x * c - y * s
    ry = x * s + y * c
    return jnp.concatenate(
        [rx[..., None], ry[..., None], points[..., 2:]], axis=-1
    )


def boxes_to_corners_3d(boxes):
    """(N, 7+) lidar boxes → (N, 8, 3) corners (reference corner ordering)."""
    template = jnp.asarray(_CORNER_TEMPLATE_3D)
    corners = boxes[:, None, 3:6] * template[None]  # (N, 8, 3)
    corners = rotate_points_along_z(corners, boxes[:, 6])
    return corners + boxes[:, None, 0:3]


def boxes_to_corners_bev(boxes):
    """(N, 7) lidar boxes (or (N, 5) [x,y,dx,dy,angle]) → (N, 4, 2) CCW BEV corners."""
    if boxes.shape[-1] >= 7:
        ctr, dims, ang = boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6]
    else:
        ctr, dims, ang = boxes[:, 0:2], boxes[:, 2:4], boxes[:, 4]
    template = jnp.asarray(_CORNER_TEMPLATE_BEV_CCW)
    corners = dims[:, None, :] * template[None]  # (N, 4, 2)
    c, s = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]
    x, y = corners[..., 0], corners[..., 1]
    corners = jnp.stack([x * c - y * s, x * s + y * c], axis=-1)
    return corners + ctr[:, None, :]


def points_in_boxes(points, boxes):
    """Point-in-rotated-box tests (replaces the roiaware_pool3d CUDA op, SURVEY §2.1 N2).

    Args:
        points: (N, 3+)
        boxes: (M, 7) lidar boxes.
    Returns:
        (N, M) bool — point n inside box m.
    """
    shifted = points[:, None, :3] - boxes[None, :, 0:3]  # (N, M, 3)
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    local_x = shifted[..., 0] * c[None] - shifted[..., 1] * s[None]
    local_y = shifted[..., 0] * s[None] + shifted[..., 1] * c[None]
    local_z = shifted[..., 2]
    half = boxes[:, 3:6] * 0.5  # (M, 3)
    return (
        (jnp.abs(local_x) <= half[None, :, 0])
        & (jnp.abs(local_y) <= half[None, :, 1])
        & (jnp.abs(local_z) <= half[None, :, 2])
    )


def enlarge_box3d(boxes, extra_width=(0.0, 0.0, 0.0)):
    """Grow dx/dy/dz by extra widths (reference: box_utils.enlarge_box3d:187-200)."""
    extra = jnp.asarray(extra_width, dtype=boxes.dtype)
    return boxes.at[..., 3:6].add(extra)


def mask_boxes_outside_range(boxes, limit_range, use_center_to_filter: bool = True):
    """(N, 7+) boxes, [x1,y1,z1,x2,y2,z2] → (N,) keep mask.

    Center-based filter (the default path in the reference's
    box_utils.mask_boxes_outside_range_numpy:93-114).
    """
    lim = jnp.asarray(limit_range, dtype=boxes.dtype)
    if use_center_to_filter:
        c = boxes[:, 0:3]
        return jnp.all((c >= lim[0:3]) & (c <= lim[3:6]), axis=-1)
    corners = boxes_to_corners_3d(boxes)[:, :, 0:2]  # (N, 8, 2)
    inside = jnp.all((corners >= lim[0:2]) & (corners <= lim[3:5]), axis=-1)
    return jnp.sum(inside.astype(jnp.int32), axis=-1) >= 1


# ---------------------------------------------------------------------------
# Camera ↔ LiDAR box conversion. `rect_to_lidar_fn` / `lidar_to_rect_fn` are
# (N,3)->(N,3) callables — use CalibMatrices (calibration.py) on device or the
# numpy Calibration host-side.
# ---------------------------------------------------------------------------

def boxes3d_kitti_camera_to_lidar(boxes_camera, rect_to_lidar_fn):
    """[x,y,z,l,h,w,ry] rect-camera (bottom center) → [x,y,z,dx,dy,dz,heading] lidar (center).

    Matches reference box_utils.boxes3d_kitti_camera_to_lidar:134-150.
    """
    xyz_camera, r = boxes_camera[:, 0:3], boxes_camera[:, 6:7]
    l, h, w = boxes_camera[:, 3:4], boxes_camera[:, 4:5], boxes_camera[:, 5:6]
    xyz_lidar = rect_to_lidar_fn(xyz_camera)
    xyz_lidar = jnp.concatenate(
        [xyz_lidar[:, 0:2], xyz_lidar[:, 2:3] + h / 2.0], axis=-1
    )
    heading = -(r + np.pi / 2.0)
    return jnp.concatenate([xyz_lidar, l, w, h, heading], axis=-1)


def boxes3d_lidar_to_kitti_camera(boxes_lidar, lidar_to_rect_fn):
    """[x,y,z,dx,dy,dz,heading] lidar (center) → [x,y,z,l,h,w,ry] rect camera (bottom center).

    Matches reference box_utils.boxes3d_lidar_to_kitti_camera:203-219.
    """
    l, w, h = boxes_lidar[:, 3:4], boxes_lidar[:, 4:5], boxes_lidar[:, 5:6]
    r = boxes_lidar[:, 6:7]
    xyz_lidar = jnp.concatenate(
        [boxes_lidar[:, 0:2], boxes_lidar[:, 2:3] - h / 2.0], axis=-1
    )
    xyz_cam = lidar_to_rect_fn(xyz_lidar)
    ry = -r - np.pi / 2.0
    return jnp.concatenate([xyz_cam, l, h, w, ry], axis=-1)


def boxes3d_to_corners3d_kitti_camera(boxes, bottom_center: bool = True):
    """(N, 7) [x,y,z,l,h,w,ry] camera boxes → (N, 8, 3) corners in rect frame.

    Corner ordering matches reference box_utils.boxes3d_to_corners3d_kitti_camera:222-266.
    """
    l, h, w = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    sx = jnp.stack([l, l, -l, -l, l, l, -l, -l], axis=1) / 2.0
    sz = jnp.stack([w, -w, -w, w, w, -w, -w, w], axis=1) / 2.0
    if bottom_center:
        zeros = jnp.zeros_like(sx[:, 0:4])
        sy = jnp.concatenate([zeros, -jnp.stack([h, h, h, h], axis=1)], axis=1)
    else:
        sy = jnp.stack([h, h, h, h, -h, -h, -h, -h], axis=1) / 2.0
    ry = boxes[:, 6]
    c, s = jnp.cos(ry), jnp.sin(ry)
    # Rotation around camera y axis; corners are row vectors multiplied on the right
    # (same convention as the reference's matmul(temp_corners, R_list)).
    x = sx * c[:, None] + sz * s[:, None]
    z = -sx * s[:, None] + sz * c[:, None]
    corners = jnp.stack([x, sy, z], axis=-1)  # (N, 8, 3)
    return corners + boxes[:, None, 0:3]


def boxes3d_kitti_camera_to_imageboxes(boxes, project_rect_to_img_fn, image_shape=None):
    """Camera boxes → (N, 4) [x1, y1, x2, y2] 2D image boxes.

    `project_rect_to_img_fn`: (M,3) rect points → ((M,2) pixels, (M,) depth).
    Matches reference box_utils.boxes3d_kitti_camera_to_imageboxes:268-288.
    """
    corners = boxes3d_to_corners3d_kitti_camera(boxes)  # (N, 8, 3)
    pts_img, _ = project_rect_to_img_fn(corners.reshape(-1, 3))
    pts_img = pts_img.reshape(-1, 8, 2)
    lo = jnp.min(pts_img, axis=1)
    hi = jnp.max(pts_img, axis=1)
    boxes2d = jnp.concatenate([lo, hi], axis=-1)
    if image_shape is not None:
        h_img, w_img = image_shape[0], image_shape[1]
        boxes2d = jnp.stack(
            [
                jnp.clip(boxes2d[:, 0], 0, w_img - 1),
                jnp.clip(boxes2d[:, 1], 0, h_img - 1),
                jnp.clip(boxes2d[:, 2], 0, w_img - 1),
                jnp.clip(boxes2d[:, 3], 0, h_img - 1),
            ],
            axis=-1,
        )
    return boxes2d


# ---------------------------------------------------------------------------
# Axis-aligned BEV helpers (reference: box_utils.py:291-341).
# ---------------------------------------------------------------------------

def boxes3d_lidar_to_aligned_bev_boxes(boxes):
    """(N, 7+) → (N, 4) axis-aligned [x1, y1, x2, y2] after snapping heading to 0/90°."""
    rot = limit_period(boxes[:, 6], offset=0.5, period=np.pi)
    choose_xy = jnp.abs(rot) < np.pi / 4.0
    half_dx = jnp.where(choose_xy, boxes[:, 3], boxes[:, 4]) * 0.5
    half_dy = jnp.where(choose_xy, boxes[:, 4], boxes[:, 3]) * 0.5
    return jnp.stack(
        [
            boxes[:, 0] - half_dx,
            boxes[:, 1] - half_dy,
            boxes[:, 0] + half_dx,
            boxes[:, 1] + half_dy,
        ],
        axis=-1,
    )


def boxes_iou_normal(boxes_a, boxes_b):
    """Axis-aligned 2D IoU: (N, 4) × (M, 4) → (N, M)."""
    x_overlap = jnp.maximum(
        jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
        - jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0]),
        0.0,
    )
    y_overlap = jnp.maximum(
        jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])
        - jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1]),
        0.0,
    )
    inter = x_overlap * y_overlap
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def boxes3d_nearest_bev_iou(boxes_a, boxes_b):
    """Fast approximate BEV IoU used by the gt-sampler collision test
    (reference: box_utils.boxes3d_nearest_bev_iou:328-341)."""
    return boxes_iou_normal(
        boxes3d_lidar_to_aligned_bev_boxes(boxes_a),
        boxes3d_lidar_to_aligned_bev_boxes(boxes_b),
    )
