"""GeneralizedLSSFPN (reference: pcdet/models/backbones_image/img_neck/
generalized_lss.py): top-down neck that concatenates each level with the
upsampled coarser level before the lateral conv — BEVFusion's image neck.

Reference-exact structure (pinned by tests/test_reference_parity.py
TestLSSFPNParity): with n input levels only n−1 are processed — the
topmost processed level concatenates the RAW coarsest input, each level
below concatenates the PROCESSED (out_channels) level above
(generalized_lss.py:36-41,62-71); the coarsest level itself has no convs
and is not emitted. Each processed level is BasicBlock2D(1×1, no bias) →
BasicBlock2D(3×3, no bias), i.e. conv-BN-ReLU twice."""
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
        """feats: list of (B, H_i, W_i, C_i), fine → coarse → list of n−1
        (B, H_i, W_i, out_channels) maps (levels 0..n−2)."""
        n = len(feats)
        outs = [None] * (n - 1)
        prev = feats[-1].astype(self.dtype)  # raw coarsest, never conv'd
        for i in range(n - 2, -1, -1):
            x = feats[i].astype(self.dtype)
            up = jax.image.resize(
                prev, (x.shape[0], x.shape[1], x.shape[2], prev.shape[-1]),
                "bilinear",
            ).astype(self.dtype)
            x = jnp.concatenate([x, up], axis=-1)
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"lateral{i}")(x)
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
