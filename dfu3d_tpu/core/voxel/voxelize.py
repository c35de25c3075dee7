"""Dynamic voxelization + segment reductions — the scatter substrate.

TPU-native replacement for the reference's external native deps (SURVEY §2.1
N8/N9): spconv's `Point2VoxelCPU3d` voxelizer (pcdet/datasets/processor/
data_processor.py:16-61) and `torch_scatter` segment ops used by the dynamic
VFEs (pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py).

Design: everything is static-shape and mask-padded. Points carry a validity
mask; invalid points get an out-of-range segment id and fall out of scatter
results via `mode="drop"` semantics of `jax.ops.segment_*` (ids >= num_segments
are dropped). Two paths:

* **dense path** (pillars / BEV): segment id = linearized BEV cell index; no
  uniquification needed at all — reductions land directly in the dense grid.
  This replaces the hash → `torch.unique` → scatter chain of DynamicPillarVFE
  with a single sort-free scatter, which is the natural XLA formulation.
* **compacted path** (sparse 3D backbones): sort by linear voxel id, segment
  boundaries by neighbor-compare, capacity-capped compaction.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class VoxelGrid(NamedTuple):
    """Static voxel grid description (python floats/ints — hashable, jit-static).

    Follows the reference convention: grid_size = round((range[3:6] - range[0:3])
    / voxel_size) as (nx, ny, nz) (data_processor.py:133-180).
    """

    point_cloud_range: Tuple[float, float, float, float, float, float]
    voxel_size: Tuple[float, float, float]
    grid_size: Tuple[int, int, int]  # (nx, ny, nz)

    @classmethod
    def create(cls, point_cloud_range: Sequence[float], voxel_size: Sequence[float]):
        pcr = tuple(float(v) for v in point_cloud_range)
        vs = tuple(float(v) for v in voxel_size)
        gs = tuple(
            int(round((pcr[3 + i] - pcr[i]) / vs[i])) for i in range(3)
        )
        return cls(pcr, vs, gs)

    @property
    def num_bev_cells(self) -> int:
        return self.grid_size[0] * self.grid_size[1]

    @property
    def num_cells(self) -> int:
        return self.grid_size[0] * self.grid_size[1] * self.grid_size[2]


def voxel_coords_of_points(grid: VoxelGrid, points, valid=None):
    """Points → integer voxel coords + in-range validity.

    Args:
        points: (N, 3+) xyz-first.
        valid: optional (N,) bool mask of live (non-padding) points.
    Returns:
        coords: (N, 3) int32 (ix, iy, iz) — clipped into the grid.
        ok: (N,) bool — live AND inside the grid.
    """
    pcr = jnp.asarray(grid.point_cloud_range[:3], dtype=points.dtype)
    vs = jnp.asarray(grid.voxel_size, dtype=points.dtype)
    rel = (points[:, 0:3] - pcr) / vs
    coords = jnp.floor(rel).astype(jnp.int32)
    gs = jnp.asarray(grid.grid_size, dtype=jnp.int32)
    ok = jnp.all((coords >= 0) & (coords < gs), axis=-1)
    if valid is not None:
        ok = ok & valid
    coords = jnp.clip(coords, 0, gs - 1)
    return coords, ok


def bev_linear_index(grid: VoxelGrid, coords, ok):
    """(N, 3) voxel coords → (N,) linearized BEV cell id (iy * nx + ix).

    Invalid points map to num_bev_cells (dropped by segment ops).
    """
    nx = grid.grid_size[0]
    idx = coords[:, 1] * nx + coords[:, 0]
    return jnp.where(ok, idx, grid.num_bev_cells)


def linear_index_3d(grid: VoxelGrid, coords, ok):
    """(N, 3) voxel coords → (N,) COLUMN-MAJOR 3D cell id
    ((iy * nx + ix) * nz + iz — z fastest).

    This is the voxel-slot SORT key: dynamic_voxelize compacts slots in this
    order, which makes every BEV column's voxels occupy consecutive slots
    with z ascending — the invariant the sparse backbone's columnar cell
    maps rely on (core/voxel/sparse_ops.ColumnMap: neighbor slot = column
    base + popcount of the z-occupancy mask). Dense cell-map LAYOUT keys are
    separate (sparse_ops.linearize) and unchanged.
    """
    nx, _, nz = grid.grid_size
    idx = (coords[:, 1] * nx + coords[:, 0]) * nz + coords[:, 2]
    return jnp.where(ok, idx, grid.num_cells)


def segment_sum(values, segment_ids, num_segments: int):
    """(N, C) values summed into (num_segments, C); ids >= num_segments dropped."""
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def segment_mean(values, segment_ids, num_segments: int):
    """Segment mean; empty segments → 0."""
    totals = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones(values.shape[:1], dtype=values.dtype), segment_ids,
        num_segments=num_segments,
    )
    return totals / jnp.maximum(counts, 1.0)[..., None], counts


def segment_max(values, segment_ids, num_segments: int, empty_value: float = 0.0):
    """Segment max; empty segments → empty_value (torch_scatter scatter_max parity)."""
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    # segment_max initializes empty segments to -inf
    return jnp.where(jnp.isfinite(out), out, empty_value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_max_fast(values, segment_ids, num_segments: int,
                     indices_are_sorted: bool = False):
    """segment_max (empty segments → 0) with a gather-only backward.

    XLA's automatic gradient of scatter-max re-runs the scatter to locate the
    winners — ~12 ms for a 240k-row, 64-ch reduction on a v5e (measured round
    2) vs ~1 ms for the equivalent gather formulation
        dx[i] = (x[i] == y[seg[i]]) · dy[seg[i]],
    which needs only two row-gathers and elementwise compares. Ties receive
    the gradient replicated (torch_scatter routes to one winner; the sum over
    ties is the subgradient choice — documented deviation, irrelevant to
    training in practice). Hot path of DynPillarVFE (models/vfe.py).
    """
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def _segment_max_fast_fwd(values, segment_ids, num_segments, indices_are_sorted):
    out = segment_max_fast(values, segment_ids, num_segments, indices_are_sorted)
    return out, (values, segment_ids, out)


def _segment_max_fast_bwd(num_segments, indices_are_sorted, res, g):
    values, segment_ids, out = res
    safe = jnp.minimum(segment_ids, num_segments - 1)
    in_range = (segment_ids < num_segments)[:, None]
    winners = (values == jnp.take(out, safe, axis=0)) & in_range
    dx = jnp.where(winners, jnp.take(g, safe, axis=0), 0.0).astype(values.dtype)
    return dx, None


segment_max_fast.defvjp(_segment_max_fast_fwd, _segment_max_fast_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_broadcast(table, segment_ids, num_segments: int,
                      indices_are_sorted: bool = False):
    """Row-gather table[seg[i]] with a segment-sum backward.

    The automatic transpose of `jnp.take` is a generic scatter-add (~5 ms for
    240k rows × 64 ch on a v5e); `segment_sum` over the same ids with the
    sorted hint is ~3 ms. Out-of-range ids read row num_segments-1 forward
    (callers mask those rows) and are dropped in the backward.
    """
    return jnp.take(table, jnp.minimum(segment_ids, num_segments - 1), axis=0)


def _segment_broadcast_fwd(table, segment_ids, num_segments, indices_are_sorted):
    return (segment_broadcast(table, segment_ids, num_segments,
                              indices_are_sorted), segment_ids)


def _segment_broadcast_bwd(num_segments, indices_are_sorted, segment_ids, g):
    dt = jax.ops.segment_sum(g, segment_ids, num_segments=num_segments,
                             indices_are_sorted=indices_are_sorted)
    return dt, None


segment_broadcast.defvjp(_segment_broadcast_fwd, _segment_broadcast_bwd)


def bev_scatter(values, linear_idx, grid: VoxelGrid, reduce: str = "max"):
    """Scatter per-point features into the dense BEV grid.

    Args:
        values: (N, C)
        linear_idx: (N,) BEV cell ids (invalid = num_bev_cells).
        reduce: "max" | "sum" | "mean".
    Returns:
        (ny * nx, C) dense BEV features.
    """
    n = grid.num_bev_cells
    if reduce == "sum":
        return segment_sum(values, linear_idx, n)
    if reduce == "mean":
        return segment_mean(values, linear_idx, n)[0]
    if reduce == "max":
        return segment_max(values, linear_idx, n)
    raise ValueError(f"unknown reduce: {reduce}")


class Voxelized(NamedTuple):
    """Compacted voxelization result (all fixed-size)."""

    voxel_coords: jnp.ndarray  # (V, 3) int32 (ix, iy, iz); invalid slots = -1
    voxel_valid: jnp.ndarray   # (V,) bool
    point_to_voxel: jnp.ndarray  # (N,) int32 slot in [0, V); invalid points → V
    num_voxels: jnp.ndarray    # () int32 (capped at max_voxels)
    num_unique: jnp.ndarray    # () int32 uncapped unique-cell count — when
    # this exceeds max_voxels the tail of the scene was silently dropped
    # (first-seen cells win); monitor voxel_overflow in train metrics


@functools.partial(jax.jit, static_argnames=("grid", "max_voxels"))
def dynamic_voxelize(grid: VoxelGrid, points, valid, max_voxels: int) -> Voxelized:
    """Sort-based voxel compaction (no hash table, no `unique`).

    Each live in-range point gets a slot index into a (max_voxels,) compacted
    voxel list. Voxels beyond capacity are dropped (points masked out), matching
    the reference's MAX_NUMBER_OF_VOXELS truncation behavior.
    """
    n = points.shape[0]
    coords, ok = voxel_coords_of_points(grid, points, valid)
    lin = linear_index_3d(grid, coords, ok)  # invalid → num_cells (sorts last)

    order = jnp.argsort(lin)
    sorted_lin = lin[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_lin[1:] != sorted_lin[:-1]]
    )
    # padding/invalid ids (== num_cells) must not open segments
    sorted_ok = sorted_lin < grid.num_cells
    is_start = is_start & sorted_ok
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # segment per sorted point
    seg = jnp.where(sorted_ok & (seg < max_voxels), seg, max_voxels)

    # map back to original point order
    point_to_voxel = jnp.zeros((n,), dtype=jnp.int32).at[order].set(seg)

    num_unique = jnp.sum(is_start.astype(jnp.int32))
    num_voxels = jnp.minimum(num_unique, max_voxels)

    # voxel coords: scatter the first point of each segment
    sorted_coords = coords[order]
    voxel_coords = (
        jnp.full((max_voxels, 3), -1, dtype=jnp.int32)
        .at[jnp.where(is_start, seg, max_voxels)]
        .set(sorted_coords, mode="drop")
    )
    voxel_valid = jnp.arange(max_voxels) < num_voxels
    return Voxelized(voxel_coords, voxel_valid, point_to_voxel, num_voxels,
                     num_unique)
