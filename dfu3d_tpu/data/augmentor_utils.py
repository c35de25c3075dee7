"""Point/box augmentation transforms (host-side numpy).

Same transform semantics as the reference's augmentor_utils.py (random world
flip/rotation/scaling/translation and their effect on boxes), expressed as pure
functions returning (gt_boxes, points, params) so the applied transform is
recorded (needed for the lidar_aug_matrix contract, dataset.py:134-156).
"""
from __future__ import annotations

import numpy as np


def _rotate_points_z(points, angle):
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], dtype=points.dtype)
    out = points.copy()
    out[:, 0:3] = points[:, 0:3] @ rot
    return out


def random_flip_along_x(gt_boxes, points, rng, force=None):
    """Flip y → −y with prob 0.5 (reference augmentor_utils.random_flip_along_x)."""
    enable = rng.choice([False, True]) if force is None else force
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:  # velocity channels
            gt_boxes[:, 8] = -gt_boxes[:, 8]
    return gt_boxes, points, bool(enable)


def random_flip_along_y(gt_boxes, points, rng, force=None):
    enable = rng.choice([False, True]) if force is None else force
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points, bool(enable)


def global_rotation(gt_boxes, points, rot_range, rng, force=None):
    angle = rng.uniform(rot_range[0], rot_range[1]) if force is None else force
    points = _rotate_points_z(points, angle)
    gt_boxes = gt_boxes.copy()
    gt_boxes[:, 0:3] = _rotate_points_z(gt_boxes[:, 0:3], angle)
    gt_boxes[:, 6] += angle
    if gt_boxes.shape[1] > 7:
        vel = np.concatenate(
            [gt_boxes[:, 7:9], np.zeros((gt_boxes.shape[0], 1), gt_boxes.dtype)], axis=1
        )
        gt_boxes[:, 7:9] = _rotate_points_z(vel, angle)[:, 0:2]
    return gt_boxes, points, float(angle)


def global_scaling(gt_boxes, points, scale_range, rng, force=None):
    if scale_range[1] - scale_range[0] < 1e-3 and force is None:
        return gt_boxes, points, 1.0
    scale = rng.uniform(scale_range[0], scale_range[1]) if force is None else force
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] *= scale
    gt_boxes[:, :6] *= scale
    if gt_boxes.shape[1] > 7:
        gt_boxes[:, 7:9] *= scale
    return gt_boxes, points, float(scale)


def global_translation(gt_boxes, points, noise_std, rng, force=None):
    offset = (
        np.array(
            [
                rng.normal(0, noise_std[0]),
                rng.normal(0, noise_std[1]),
                rng.normal(0, noise_std[2]),
            ],
            dtype=points.dtype,
        )
        if force is None
        else np.asarray(force, dtype=points.dtype)
    )
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] += offset
    gt_boxes[:, :3] += offset
    return gt_boxes, points, offset
