"""KITTI calibration: host-side parser + device-side functional transforms.

Same public API/semantics as the reference's pcdet/utils/calibration_kitti.py
(P2/R0/Tr_velo_to_cam projection suite), re-expressed as:

* `Calibration` — a numpy host-side object (file parsing, dataset prep).
* `CalibMatrices` — a pytree of precomputed 4×4 homogeneous matrices so the whole
  projection suite is jnp-traceable (einsum-friendly, batchable over frames).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def get_calib_from_file(calib_file):
    """Parse a KITTI calib txt (line layout per calibration_kitti.py:4-21)."""
    with open(calib_file) as f:
        lines = f.readlines()
    vals = {}
    for line in lines:
        line = line.strip()
        if not line or ":" not in line and " " not in line:
            continue
        key, _, rest = line.partition(":" if ":" in line else " ")
        try:
            vals[key.strip()] = np.array(rest.strip().split(), dtype=np.float32)
        except ValueError:
            continue
    return {
        "P2": vals["P2"].reshape(3, 4),
        "P3": vals.get("P3", vals["P2"]).reshape(3, 4),
        "R0": vals["R0_rect"].reshape(3, 3) if "R0_rect" in vals else vals["R0"].reshape(3, 3),
        "Tr_velo2cam": (
            vals["Tr_velo_to_cam"] if "Tr_velo_to_cam" in vals else vals["Tr_velo2cam"]
        ).reshape(3, 4),
    }


def _homogeneous(mat3x4_or_3x3):
    out = np.eye(4, dtype=np.float32)
    m = np.asarray(mat3x4_or_3x3, dtype=np.float32)
    out[:3, : m.shape[1]] = m
    return out


class CalibMatrices(NamedTuple):
    """Precomputed projection matrices (all fp32). jnp/np agnostic pytree."""

    P2: jnp.ndarray            # (3, 4) camera projection
    rect_from_lidar: jnp.ndarray  # (4, 4) = R0_ext @ V2C_ext
    lidar_from_rect: jnp.ndarray  # (4, 4) inverse
    # Intrinsics for img→rect back-projection (calibration_kitti.py:34-40).
    cu: jnp.ndarray
    cv: jnp.ndarray
    fu: jnp.ndarray
    fv: jnp.ndarray
    tx: jnp.ndarray
    ty: jnp.ndarray

    @classmethod
    def from_arrays(cls, P2, R0, V2C):
        P2 = np.asarray(P2, dtype=np.float32)
        rect_from_lidar = _homogeneous(R0) @ _homogeneous(V2C)
        lidar_from_rect = np.linalg.inv(rect_from_lidar).astype(np.float32)
        fu, fv = P2[0, 0], P2[1, 1]
        return cls(
            P2=P2,
            rect_from_lidar=rect_from_lidar.astype(np.float32),
            lidar_from_rect=lidar_from_rect,
            cu=np.float32(P2[0, 2]),
            cv=np.float32(P2[1, 2]),
            fu=np.float32(fu),
            fv=np.float32(fv),
            tx=np.float32(P2[0, 3] / (-fu)),
            ty=np.float32(P2[1, 3] / (-fv)),
        )


def _apply44(mat, pts):
    """(4,4) @ (N,3) points (implicit w=1) → (N,3).

    Elementwise (VPU) instead of matmul: keeps fp32 precision on TPU where
    small matmuls would be demoted to bf16 on the MXU.
    """
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    out = [
        x * mat[i, 0] + y * mat[i, 1] + z * mat[i, 2] + mat[i, 3] for i in range(3)
    ]
    xp = jnp if isinstance(pts, jnp.ndarray) else np
    return xp.stack(out, axis=-1)


def lidar_to_rect(calib: CalibMatrices, pts_lidar):
    return _apply44(calib.rect_from_lidar, pts_lidar)


def rect_to_lidar(calib: CalibMatrices, pts_rect):
    return _apply44(calib.lidar_from_rect, pts_rect)


def _apply34(mat, pts):
    """(3,4) projection of (…,3) points (implicit w=1) → (…,3), elementwise."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    out = [
        x * mat[i, 0] + y * mat[i, 1] + z * mat[i, 2] + mat[i, 3] for i in range(3)
    ]
    xp = jnp if isinstance(pts, jnp.ndarray) else np
    return xp.stack(out, axis=-1)


def rect_to_img(calib: CalibMatrices, pts_rect):
    """(N,3) rect points → ((N,2) pixel coords, (N,) depth in rect frame)."""
    hom = _apply34(calib.P2, pts_rect)
    depth_denom = hom[:, 2]
    pts_img = hom[:, 0:2] / depth_denom[:, None]
    # depth in rect camera coords: subtract the projection matrix's z-offset
    # (calibration_kitti.py:84).
    pts_rect_depth = hom[:, 2] - calib.P2[2, 3]
    return pts_img, pts_rect_depth


def lidar_to_img(calib: CalibMatrices, pts_lidar):
    return rect_to_img(calib, lidar_to_rect(calib, pts_lidar))


def img_to_rect(calib: CalibMatrices, u, v, depth_rect):
    """Pixel (u, v) + rect-frame depth → (N,3) rect points (calibration_kitti.py:99-108)."""
    x = ((u - calib.cu) * depth_rect) / calib.fu + calib.tx
    y = ((v - calib.cv) * depth_rect) / calib.fv + calib.ty
    xp = jnp if isinstance(depth_rect, jnp.ndarray) else np
    return xp.stack([x, y, depth_rect], axis=-1)


def corners3d_to_img_boxes(calib: CalibMatrices, corners3d):
    """(N,8,3) rect corners → ((N,4) [x1,y1,x2,y2], (N,8,2) corner pixels)."""
    xp = jnp if isinstance(corners3d, jnp.ndarray) else np
    hom = _apply34(calib.P2, corners3d)  # (N,8,3)
    xy = hom[..., 0:2] / hom[..., 2:3]
    lo = xp.min(xy, axis=1)
    hi = xp.max(xy, axis=1)
    return xp.concatenate([lo, hi], axis=-1), xy


class Calibration:
    """Host-side calibration object with the reference's method names.

    (pcdet/utils/calibration_kitti.py:24-127 API; numpy in/out.)
    """

    def __init__(self, calib_file):
        calib = calib_file if isinstance(calib_file, dict) else get_calib_from_file(calib_file)
        self.P2 = np.asarray(calib["P2"], dtype=np.float32)
        self.R0 = np.asarray(calib["R0"], dtype=np.float32)
        self.V2C = np.asarray(calib["Tr_velo2cam"], dtype=np.float32)
        self.mats = CalibMatrices.from_arrays(self.P2, self.R0, self.V2C)
        self.cu, self.cv = self.mats.cu, self.mats.cv
        self.fu, self.fv = self.mats.fu, self.mats.fv
        self.tx, self.ty = self.mats.tx, self.mats.ty

    def cart_to_hom(self, pts):
        return np.hstack([pts, np.ones((pts.shape[0], 1), dtype=np.float32)])

    def lidar_to_rect(self, pts_lidar):
        return np.asarray(lidar_to_rect(self.mats, pts_lidar.astype(np.float32)))

    def rect_to_lidar(self, pts_rect):
        return np.asarray(rect_to_lidar(self.mats, pts_rect.astype(np.float32)))

    def rect_to_img(self, pts_rect):
        img, depth = rect_to_img(self.mats, pts_rect.astype(np.float32))
        return np.asarray(img), np.asarray(depth)

    def lidar_to_img(self, pts_lidar):
        img, depth = lidar_to_img(self.mats, pts_lidar.astype(np.float32))
        return np.asarray(img), np.asarray(depth)

    def img_to_rect(self, u, v, depth_rect):
        return np.asarray(
            img_to_rect(self.mats, np.asarray(u, np.float32), np.asarray(v, np.float32),
                        np.asarray(depth_rect, np.float32))
        )

    def corners3d_to_img_boxes(self, corners3d):
        boxes, corners = corners3d_to_img_boxes(self.mats, corners3d.astype(np.float32))
        return np.asarray(boxes), np.asarray(corners)
