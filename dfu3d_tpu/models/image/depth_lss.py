"""Depth-LSS view transform: lift camera features into a frustum point cloud
with a predicted depth distribution, splat onto the BEV grid.

Reference: pcdet/models/view_transforms/depth_lss.py (DepthLSSTransform, the
BEVFusion lift-splat with a LiDAR-depth-conditioned depth net) + the bev_pool
op (N6) — here core.voxel.bev_pool (segment-sum formulation).

Geometry follows the reference exactly: a static (D, fH, fW, 3) frustum of
(u, v, depth) samples, un-did image post-transforms, pinhole back-projection,
camera→lidar, then BEV binning. NHWC layout; all shapes static.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.voxel.bev_pool import bev_pool


def _conv_bn_relu(x, ch, k, stride, train, name_prefix, mdl, use_bias=False):
    x = nn.Conv(ch, (k, k), strides=(stride, stride), padding=k // 2,
                use_bias=use_bias, dtype=mdl.dtype, param_dtype=jnp.float32,
                name=f"{name_prefix}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                     dtype=jnp.float32, param_dtype=jnp.float32,
                     name=f"{name_prefix}_bn")(x)
    return nn.relu(x).astype(mdl.dtype)


class DepthLSSTransform(nn.Module):
    """config: IN_CHANNEL, OUT_CHANNEL, IMAGE_SIZE, FEATURE_SIZE, XBOUND,
    YBOUND, ZBOUND, DBOUND, DOWNSAMPLE."""

    in_channel: int
    out_channel: int
    image_size: Tuple[int, int]      # (iH, iW)
    feature_size: Tuple[int, int]    # (fH, fW)
    xbound: Sequence[float]
    ybound: Sequence[float]
    zbound: Sequence[float]
    dbound: Sequence[float]
    downsample: int = 1
    max_pooled_cells: int = 0        # bev_pool compaction cap (0 = dense)
    dtype: jnp.dtype = jnp.float32

    def _frustum(self):
        iH, iW = self.image_size
        fH, fW = self.feature_size
        ds = np.arange(*self.dbound, dtype=np.float32)
        d = len(ds)
        xs = np.linspace(0, iW - 1, fW, dtype=np.float32)
        ys = np.linspace(0, iH - 1, fH, dtype=np.float32)
        f = np.zeros((d, fH, fW, 3), np.float32)
        f[..., 0] = xs[None, None, :]
        f[..., 1] = ys[None, :, None]
        f[..., 2] = ds[:, None, None]
        return f

    @property
    def num_depth_bins(self):
        return len(np.arange(*self.dbound))

    def get_geometry(self, cam2lidar_rots, cam2lidar_trans, intrins,
                     post_rots=None, post_trans=None):
        """Frustum sample → lidar xyz (B, N, D, fH, fW, 3) (reference
        get_geometry:94-120)."""
        frustum = jnp.asarray(self._frustum())  # (D, fH, fW, 3)
        b, n = cam2lidar_trans.shape[:2]
        pts = jnp.broadcast_to(
            frustum, (b, n) + frustum.shape
        )
        if post_trans is not None:
            pts = pts - post_trans[:, :, None, None, None, :]
        if post_rots is not None:
            inv = jnp.linalg.inv(post_rots.astype(jnp.float32))
            pts = jnp.einsum("bnij,bndhwj->bndhwi", inv, pts)
        # (u·d, v·d, d) pinhole
        pts = jnp.concatenate(
            [pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], axis=-1
        )
        combine = jnp.einsum(
            "bnij,bnjk->bnik", cam2lidar_rots.astype(jnp.float32),
            jnp.linalg.inv(intrins.astype(jnp.float32)),
        )
        pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
        return pts + cam2lidar_trans[:, :, None, None, None, :]

    @nn.compact
    def __call__(self, img_feats, sparse_depth, cam2lidar_rots,
                 cam2lidar_trans, intrins, train: bool = False,
                 post_rots=None, post_trans=None):
        """
        Args:
            img_feats: (B, N, fH, fW, C_in) camera features.
            sparse_depth: (B, N, iH, iW, 1) projected-LiDAR depth map.
        Returns:
            (B, ny, nx, C_out·nz) BEV features.
        """
        b, n, fh, fw, _ = img_feats.shape
        d = self.num_depth_bins
        x = img_feats.reshape(b * n, fh, fw, -1)

        # dtransform: sparse depth → depth features at feature resolution
        dd = sparse_depth.reshape(b * n, *self.image_size, 1).astype(self.dtype)
        dd = _conv_bn_relu(dd, 8, 1, 1, train, "dt0", self)
        dd = _conv_bn_relu(dd, 32, 5, 4, train, "dt1", self)
        dd = _conv_bn_relu(dd, 64, 5, 2, train, "dt2", self)
        # bilinear-resize to the feature grid if strides don't land exactly
        if dd.shape[1:3] != (fh, fw):
            dd = jax.image.resize(dd, (b * n, fh, fw, dd.shape[-1]), "bilinear")

        y = jnp.concatenate([dd, x.astype(self.dtype)], axis=-1)
        y = _conv_bn_relu(y, self.in_channel, 3, 1, train, "dn0", self)
        y = _conv_bn_relu(y, self.in_channel, 3, 1, train, "dn1", self)
        y = nn.Conv(d + self.out_channel, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="dn_out")(y)

        depth_logits = y[..., :d].astype(jnp.float32)
        depth = jax.nn.softmax(depth_logits, axis=-1)   # (B·N, fH, fW, D)
        feat = y[..., d:].astype(jnp.float32)           # (B·N, fH, fW, C)
        # outer product: (B·N, D, fH, fW, C)
        frustum_feats = depth.transpose(0, 3, 1, 2)[..., None] * feat[:, None]

        geom = self.get_geometry(cam2lidar_rots, cam2lidar_trans, intrins,
                                 post_rots, post_trans)  # (B,N,D,fH,fW,3)
        xb, yb, zb = self.xbound, self.ybound, self.zbound
        nx = int(round((xb[1] - xb[0]) / xb[2]))
        ny = int(round((yb[1] - yb[0]) / yb[2]))
        nz = int(round((zb[1] - zb[0]) / zb[2]))
        lo = jnp.asarray([xb[0], yb[0], zb[0]], jnp.float32)
        dx = jnp.asarray([xb[2], yb[2], zb[2]], jnp.float32)
        cell = jnp.floor((geom - lo) / dx).astype(jnp.int32)

        p = b * n * d * fh * fw
        batch_ix = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n * d * fh * fw)
        coords = jnp.concatenate(
            [batch_ix[:, None],
             cell.reshape(p, 3)[:, [2, 1, 0]]], axis=1
        )  # [b, z, y, x]
        pooled = bev_pool(
            frustum_feats.reshape(p, self.out_channel), coords,
            jnp.ones((p,), bool), b, nz, ny, nx,
            max_cells=self.max_pooled_cells,
        )  # (B, nz, ny, nx, C)
        out = pooled.transpose(0, 2, 3, 1, 4).reshape(b, ny, nx, nz * self.out_channel)
        out = out.astype(self.dtype)
        if self.downsample > 1:
            assert self.downsample == 2
            out = _conv_bn_relu(out, self.out_channel, 3, 1, train, "ds0", self)
            out = _conv_bn_relu(out, self.out_channel, 3, 2, train, "ds1", self)
            out = _conv_bn_relu(out, self.out_channel, 3, 1, train, "ds2", self)
        return out
