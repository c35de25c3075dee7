"""PointNet++ ops in pure JAX: FPS, ball query, grouping, 3-NN interpolation.

TPU-native replacement for the pointnet2_batch CUDA ops (SURVEY §2.1 N4:
pcdet/ops/pointnet2/pointnet2_batch/) used by the PointNet2/PointRCNN
backbones. All ops are static-shape and mask-aware: invalid points are pushed
to +inf distance and gather indices are always in-range.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e9


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(xyz, valid, npoint: int):
    """Iterative farthest-point sampling (pointnet2 farthest_point_sampling).

    Args:
        xyz: (N, 3); valid: (N,) bool.
    Returns:
        (npoint,) int32 indices (repeats the first point if fewer valid).
    """
    n = xyz.shape[0]
    start = jnp.argmax(valid)  # first valid point (reference starts at 0)

    def body(i, state):
        dists, idxs = state
        last = idxs[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        d = jnp.where(valid, d, -_BIG)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists)
        return dists, idxs.at[i].set(nxt.astype(jnp.int32))

    dists0 = jnp.where(valid, _BIG, -_BIG)
    idxs0 = jnp.zeros((npoint,), jnp.int32).at[0].set(start.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, npoint, body, (dists0, idxs0))
    return idxs


def ball_query(radius: float, nsample: int, xyz, xyz_valid, new_xyz, new_valid):
    """Indices of up to nsample points within radius of each query center.

    Matches the CUDA op's padding behavior: empty slots repeat the FIRST found
    neighbor; centers with no neighbor fall back to index 0 and are flagged.

    Args:
        xyz: (N, 3) source; new_xyz: (M, 3) centers.
    Returns:
        idx (M, nsample) int32, has_neighbor (M,) bool.
    """
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    within = (d2 <= radius * radius) & xyz_valid[None, :] & new_valid[:, None]
    # rank of each hit within its row (1-based)
    rank = jnp.cumsum(within.astype(jnp.int32), axis=1)
    take = within & (rank <= nsample)
    slot = jnp.where(take, rank - 1, nsample)  # out-of-range → dropped
    src = jnp.broadcast_to(jnp.arange(xyz.shape[0], dtype=jnp.int32), d2.shape)
    idx = (
        jnp.zeros((new_xyz.shape[0], nsample), jnp.int32)
        .at[jnp.arange(new_xyz.shape[0])[:, None], slot]
        .set(src, mode="drop")
    )
    counts = rank[:, -1]
    has_neighbor = counts > 0
    # pad empty slots with the first neighbor (CUDA kernel behavior)
    first = idx[:, 0]
    in_slot = jnp.arange(nsample)[None, :] < jnp.minimum(counts, nsample)[:, None]
    idx = jnp.where(in_slot, idx, first[:, None])
    return idx, has_neighbor


def group_points(features, idx):
    """Gather: features (N, C) + idx (M, K) → (M, K, C)."""
    return jnp.take(features, idx, axis=0)


def three_nn(unknown, unknown_valid, known, known_valid):
    """3 nearest known points for each unknown point.

    Returns (dist (M, 3), idx (M, 3))."""
    d2 = jnp.sum((unknown[:, None, :] - known[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(known_valid[None, :], d2, _BIG)
    neg_d2, idx = jax.lax.top_k(-d2, 3)
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 1e-12))
    return dist, idx.astype(jnp.int32)


def three_interpolate(features, idx, dist):
    """Inverse-distance-weighted interpolation (pointnet2 three_interpolate).

    features: (N, C); idx/dist: (M, 3) → (M, C).
    """
    w = 1.0 / jnp.maximum(dist * dist, 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = jnp.take(features, idx, axis=0)  # (M, 3, C)
    return jnp.sum(gathered * w[..., None], axis=1)


def vector_pool(queries, q_valid, xyz, xyz_valid, feats, radius: float,
                nsample: int, bins=(3, 3, 3)):
    """VectorPool aggregation (SURVEY §2.1 N5: pointnet2_stack
    vector_pool_gpu.cu:485 / voxel_pool_modules.py:131, PV-RCNN++).

    Each query owns a local cube of half-extent `radius` split into
    bins=(nx, ny, nz) sub-voxels; support points gathered by ball query are
    averaged PER SUB-VOXEL (position-sensitive, unlike max-pool SA), and the
    output is the flattened per-bin [mean Δxyz, mean features] vector — the
    caller's MLP mixes it (the reference's separate_local_aggregation with
    avg pooling).

    Args:
        queries: (M, 3); xyz: (N, 3); feats: (N, C) or None.
    Returns:
        (M, nx·ny·nz·(3+C)) float32, (M,) has_neighbor.
    """
    nx, ny, nz = bins
    nbins = nx * ny * nz
    idx, has = ball_query(radius, nsample, xyz, xyz_valid, queries, q_valid)
    grouped_xyz = jnp.take(xyz, idx, axis=0) - queries[:, None, :]  # (M, S, 3)
    # slot occupancy: ball_query pads empty slots with the first neighbor —
    # mask slots beyond the true count
    d2 = jnp.sum(grouped_xyz**2, axis=-1)
    slot_ok = (d2 <= radius * radius) & has[:, None]
    # first-neighbor padding duplicates slot 0; keep only one copy per dup run
    first_dup = jnp.concatenate(
        [jnp.ones_like(idx[:, :1], bool), idx[:, 1:] != idx[:, :1]], axis=1
    )
    slot_ok = slot_ok & (first_dup | (jnp.arange(idx.shape[1])[None, :] == 0))

    rel = (grouped_xyz + radius) / (2.0 * radius)  # [0, 1]
    bx = jnp.clip((rel[..., 0] * nx).astype(jnp.int32), 0, nx - 1)
    by = jnp.clip((rel[..., 1] * ny).astype(jnp.int32), 0, ny - 1)
    bz = jnp.clip((rel[..., 2] * nz).astype(jnp.int32), 0, nz - 1)
    bin_id = (bx * ny + by) * nz + bz  # (M, S)
    onehot = jax.nn.one_hot(
        jnp.where(slot_ok, bin_id, nbins), nbins, dtype=jnp.float32
    )  # (M, S, nbins)

    if feats is not None:
        payload = jnp.concatenate(
            [grouped_xyz, jnp.take(feats, idx, axis=0).astype(jnp.float32)],
            axis=-1,
        )
    else:
        payload = grouped_xyz
    sums = jnp.einsum("msb,msc->mbc", onehot, payload)
    counts = jnp.sum(onehot, axis=1)  # (M, nbins)
    means = sums / jnp.maximum(counts[..., None], 1.0)
    return means.reshape(queries.shape[0], -1), has
