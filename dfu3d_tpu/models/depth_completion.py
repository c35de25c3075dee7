"""Depth completion network (ENet-style two-branch, reference: tools/PENet/model.py).

The reference ships PENet/ENet (color-dominant + depth-dominant encoder-decoder
branches with geometric encoding and confidence-weighted fusion,
model.py:3-987) as the legacy depth-completion path, superseded at runtime by
DepthAnything. This is a compact flax re-design of the same capability:

* `GeometryFeature` — (u, v, depth) → camera-frame xyz channels (basic.py:270).
* Two branches: color-dominant (rgb + sparse depth + geometry) and
  depth-dominant (sparse depth + CD prediction); each an encoder–decoder with
  skip connections; outputs (depth, confidence).
* Confidence-softmax fusion of the two branch depths (ENet forward semantics).
* `masked_l2_loss` / `masked_l1_loss` — MaskedMSELoss/MaskedL1Loss
  (criteria.py:6-30): supervised only at valid sparse-depth pixels.

`tools/complete_depth.py` runs it over KITTI-format frames to produce the
`depth/<idx>.npy` artifacts the pseudo-box factory consumes — closing the
pipeline without external checkpoints.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def geometry_feature(depth, calib_cu, calib_cv, calib_fu, calib_fv):
    """(B, H, W, 1) depth → (B, H, W, 3) camera xyz (reference GeometryFeature)."""
    b, h, w, _ = depth.shape
    vv = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    uu = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    z = depth
    x = (uu - calib_cu) * z / calib_fu
    y = (vv - calib_cv) * z / calib_fv
    return jnp.concatenate([x, y, z], axis=-1)


class ConvBnRelu(nn.Module):
    features: int
    stride: int = 1
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class DeconvBnRelu(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class EncoderDecoder(nn.Module):
    """Strided encoder + skip-connected decoder → (depth, confidence)."""

    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        skips = []
        h = ConvBnRelu(self.widths[0], dtype=self.dtype)(x, train)
        for wdt in self.widths[1:]:
            skips.append(h)
            h = ConvBnRelu(wdt, stride=2, dtype=self.dtype)(h, train)
            h = ConvBnRelu(wdt, dtype=self.dtype)(h, train)
        for wdt, skip in zip(reversed(self.widths[:-1]), reversed(skips)):
            h = DeconvBnRelu(wdt, dtype=self.dtype)(h, train)
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBnRelu(wdt, dtype=self.dtype)(h, train)
        out = nn.Conv(2, (3, 3), param_dtype=jnp.float32)(h).astype(jnp.float32)
        depth = nn.softplus(out[..., 0:1])
        confidence = out[..., 1:2]
        return depth, confidence


class ENet(nn.Module):
    """Two-branch depth completion with confidence fusion."""

    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, sparse_depth, calib_cu, calib_cv, calib_fu,
                 calib_fv, train: bool = False):
        """rgb (B, H, W, 3) in [0,1]; sparse_depth (B, H, W, 1), 0 = missing.

        Returns (fused_depth, cd_depth, dd_depth), each (B, H, W, 1).
        """
        geo = geometry_feature(sparse_depth, calib_cu, calib_cv, calib_fu, calib_fv)
        cd_in = jnp.concatenate([rgb, sparse_depth, geo], axis=-1)
        cd_depth, cd_conf = EncoderDecoder(
            self.widths, dtype=self.dtype, name="color_branch"
        )(cd_in.astype(self.dtype), train)

        dd_in = jnp.concatenate([sparse_depth, cd_depth, geo], axis=-1)
        dd_depth, dd_conf = EncoderDecoder(
            self.widths, dtype=self.dtype, name="depth_branch"
        )(dd_in.astype(self.dtype), train)

        w = jax.nn.softmax(jnp.concatenate([cd_conf, dd_conf], axis=-1), axis=-1)
        fused = w[..., 0:1] * cd_depth + w[..., 1:2] * dd_depth
        return fused, cd_depth, dd_depth


def masked_l2_loss(pred, target):
    """MaskedMSELoss (criteria.py:6-17): mean over target > 0 pixels."""
    mask = (target > 0).astype(jnp.float32)
    diff = (pred - target) * mask
    return jnp.sum(diff ** 2) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_l1_loss(pred, target):
    """MaskedL1Loss (criteria.py:19-30)."""
    mask = (target > 0).astype(jnp.float32)
    return jnp.sum(jnp.abs(pred - target) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
