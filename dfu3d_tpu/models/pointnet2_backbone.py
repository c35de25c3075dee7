"""PointNet++ MSG backbone (reference: pcdet/models/backbones_3d/
pointnet2_backbone.py PointNet2MSG — SA-MSG encoder + FP decoder).

Batched formulation: FPS/ball-query run per frame via vmap over the pure ops
in core/pointnet2; the MLPs (Dense over the channel axis + masked BN) see the
whole batch so normalization stats are global.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import pointnet2 as P
from .vfe import MaskedBatchNorm


class SharedMLP(nn.Module):
    """1×1 conv stack over the last axis with masked BN + ReLU.

    BN defaults are torch's (eps=1e-5, momentum=0.1 ⇒ ema keep 0.9): every
    reference stack this mirrors — pointnet2 SA/FP MLPs and
    point_head_template.make_fc_layers:36-47 — constructs BatchNorm with
    torch defaults, unlike the VFE's explicit eps=1e-3 (pinned by
    TestPointHeadBoxParity against the reference's own modules)."""

    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    bn_epsilon: float = 1e-5
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # x: (..., C); mask broadcastable to x[..., :1]
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"dense_{i}")(x)
            flat = x.reshape(-1, c)
            flat_mask = jnp.broadcast_to(mask, x[..., :1].shape).reshape(-1)
            flat = MaskedBatchNorm(
                momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                dtype=self.dtype, name=f"bn_{i}",
            )(flat, flat_mask, train)
            x = nn.relu(flat.reshape(x.shape[:-1] + (c,)))
        return x


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping SA layer (pointnet2_modules.PointnetSAModuleMSG)."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats, valid, train: bool):
        """xyz (B, N, 3), feats (B, N, C) or None, valid (B, N) →
        new_xyz (B, S, 3), new_feats (B, S, ΣC'), new_valid (B, S)."""

        def sample_one(x, v):
            idx = P.farthest_point_sample(x, v, self.npoint)
            return idx, v[idx]

        fps_idx, new_valid = jax.vmap(sample_one)(xyz, valid)
        new_xyz = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)

        outs = []
        for si, (radius, nsample) in enumerate(zip(self.radii, self.nsamples)):
            def query_one(x, v, nx, nv):
                return P.ball_query(radius, nsample, x, v, nx, nv)

            idx, has = jax.vmap(query_one)(xyz, valid, new_xyz, new_valid)
            grouped_xyz = jax.vmap(lambda x, i: jnp.take(x, i, axis=0))(xyz, idx)
            grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
            if feats is not None:
                grouped_f = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(feats, idx)
                grouped = jnp.concatenate([grouped_xyz, grouped_f], axis=-1)
            else:
                grouped = grouped_xyz
            m = has & new_valid  # (B, S)
            g = SharedMLP(self.mlps[si], dtype=self.dtype, name=f"mlp_{si}")(
                grouped.astype(self.dtype), m[..., None, None], train
            )
            g = jnp.where(m[..., None, None], g, -jnp.inf)
            pooled = jnp.max(g, axis=2)
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
            outs.append(pooled)
        return new_xyz, jnp.concatenate(outs, axis=-1), new_valid


class FeaturePropagation(nn.Module):
    """FP layer: 3-NN interpolation + skip concat + MLP
    (pointnet2_modules.PointnetFPModule)."""

    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz_fine, valid_fine, feats_fine, xyz_coarse,
                 valid_coarse, feats_coarse, train: bool):
        def interp_one(uf, uv, kf, kv, f):
            dist, idx = P.three_nn(uf, uv, kf, kv)
            return P.three_interpolate(f, idx, dist)

        interp = jax.vmap(interp_one)(
            xyz_fine, valid_fine, xyz_coarse, valid_coarse, feats_coarse
        )
        if feats_fine is not None:
            x = jnp.concatenate([interp, feats_fine], axis=-1)
        else:
            x = interp
        return SharedMLP(self.mlp, dtype=self.dtype)(
            x.astype(self.dtype), valid_fine[..., None], train
        )


class PointNet2MSG(nn.Module):
    """4×SA-MSG + 4×FP → per-point features (reference PointNet2MSG)."""

    npoints: Sequence[int]
    radii: Sequence[Sequence[float]]
    nsamples: Sequence[Sequence[int]]
    mlps: Sequence[Sequence[Sequence[int]]]
    fp_mlps: Sequence[Sequence[int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, valid, train: bool):
        """points (B, N, 3+C) → per-point features (B, N, fp_mlps[0][-1])."""
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        xyzs, feats_list, valids = [xyz], [feats], [valid]
        for i in range(len(self.npoints)):
            nx, nf, nv = SetAbstractionMSG(
                npoint=self.npoints[i], radii=tuple(self.radii[i]),
                nsamples=tuple(self.nsamples[i]),
                mlps=tuple(tuple(m) for m in self.mlps[i]),
                dtype=self.dtype, name=f"sa_{i}",
            )(xyzs[-1], feats_list[-1], valids[-1], train)
            xyzs.append(nx)
            feats_list.append(nf)
            valids.append(nv)

        for i in range(len(self.fp_mlps) - 1, -1, -1):
            feats_list[i] = FeaturePropagation(
                mlp=tuple(self.fp_mlps[i]), dtype=self.dtype, name=f"fp_{i}",
            )(
                xyzs[i], valids[i], feats_list[i],
                xyzs[i + 1], valids[i + 1], feats_list[i + 1], train,
            )
        return feats_list[0]
