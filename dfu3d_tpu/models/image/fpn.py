"""GeneralizedLSSFPN (reference: pcdet/models/backbones_image/img_neck/
generalized_lss.py): top-down neck that concatenates each level with the
upsampled coarser level before the lateral conv — BEVFusion's image neck."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class GeneralizedLSSFPN(nn.Module):
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: list of (B, H_i, W_i, C_i), fine → coarse."""
        n = len(feats)
        # top-down: level i gets concat(feats[i], upsample(laterals[i+1]))
        outs = [None] * n
        prev = feats[-1]
        for i in range(n - 1, -1, -1):
            x = feats[i]
            if i < n - 1:
                up = jax.image.resize(
                    prev, (x.shape[0], x.shape[1], x.shape[2], prev.shape[-1]),
                    "bilinear",
                )
                x = jnp.concatenate([x, up], axis=-1)
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"lateral{i}")(x.astype(self.dtype))
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"lateral_bn{i}")(x)
            x = nn.relu(x).astype(self.dtype)
            y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"fpn{i}")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"fpn_bn{i}")(y)
            outs[i] = nn.relu(y).astype(self.dtype)
            prev = outs[i]
        return outs[: self.num_outs]
