"""Sparse-voxel ops: neighbor lookup + strided downsampling (static shapes).

The substrate for the TPU-native sparse 3D convolution (replacing spconv,
SURVEY §2.1 N8). Design: active voxels live in fixed-capacity buffers
(coords (V, 3) int32 + valid (V,)); neighbor resolution is sort +
`searchsorted` over linearized coordinates — a gather-friendly formulation
instead of spconv's hash tables. Missing neighbors resolve to the sentinel
index V (callers keep a zero row at index V in padded feature buffers).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SparseGrid(NamedTuple):
    """Static spatial extent of a sparse tensor (nx, ny, nz)."""

    nx: int
    ny: int
    nz: int

    @property
    def num_cells(self):
        return self.nx * self.ny * self.nz

    def down(self):
        return SparseGrid(-(-self.nx // 2), -(-self.ny // 2), -(-self.nz // 2))

    def down_z(self):
        return SparseGrid(self.nx, self.ny, -(-self.nz // 2))


def linearize(grid: SparseGrid, coords, valid):
    """(V, 3) int coords → (V,) linear ids; invalid/out-of-grid → num_cells."""
    ix, iy, iz = coords[:, 0], coords[:, 1], coords[:, 2]
    ok = (
        valid
        & (ix >= 0) & (ix < grid.nx)
        & (iy >= 0) & (iy < grid.ny)
        & (iz >= 0) & (iz < grid.nz)
    )
    lin = (iz * grid.ny + iy) * grid.nx + ix
    return jnp.where(ok, lin, grid.num_cells)


def build_lookup(grid: SparseGrid, coords, valid):
    """Sorted-id lookup table: returns (sorted_lin, order)."""
    lin = linearize(grid, coords, valid)
    order = jnp.argsort(lin)
    return lin[order], order


# Grids up to this many cells use the dense cell→slot map (int32, so
# 4·num_cells bytes of transient HBM per batch element); larger grids fall
# back to unrolled binary search. 2^27 cells = 537 MB — comfortably inside a
# v5e's 16 GB for the B≤4 stage-1 grids this framework targets.
DENSE_MAP_MAX_CELLS = 1 << 27


def build_cell_map(grid: SparseGrid, coords, valid):
    """Dense cell→slot map: (num_cells + 1,) int32, -1 where empty.

    One scatter instead of a sort; lookups become one gather. This is the
    TPU-native replacement for spconv's GPU hash table (reference
    pcdet/ops/.../spconv hash lookups): random scatters/gathers of 4-byte
    slots beat searchsorted's 17-deep dependent-gather binary search by ~100×
    on TPU (measured round 2: 596 ms → ~5 ms for a 60k-voxel 27-point
    neighbor table).
    """
    v = coords.shape[0]
    lin = linearize(grid, coords, valid)  # invalid → num_cells (spill slot)
    cmap = jnp.full((grid.num_cells + 1,), -1, jnp.int32)
    return cmap.at[lin].set(jnp.arange(v, dtype=jnp.int32), mode="drop")


def find_neighbors_via_map(grid: SparseGrid, query_coords, query_valid,
                           cell_map, v: int, offsets):
    """Dense-map twin of `find_neighbors`: (Q, K) indices, sentinel = v."""
    off = jnp.asarray(offsets, jnp.int32)
    q = query_coords[:, None, :] + off[None, :, :]
    qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]
    ok = (
        query_valid[:, None]
        & (qx >= 0) & (qx < grid.nx)
        & (qy >= 0) & (qy < grid.ny)
        & (qz >= 0) & (qz < grid.nz)
    )
    qlin = jnp.where(ok, (qz * grid.ny + qy) * grid.nx + qx, grid.num_cells)
    idx = jnp.take(cell_map, qlin.reshape(-1), axis=0).reshape(qlin.shape)
    # the spill slot may hold a (invalid-voxel) index — mask by `ok` as well
    return jnp.where(ok & (idx >= 0), idx, v).astype(jnp.int32)


def find_neighbors(grid: SparseGrid, query_coords, query_valid, sorted_lin,
                   order, offsets):
    """For each query voxel and each offset, the index of the voxel at
    query_coord + offset (sentinel V if absent).

    Args:
        query_coords: (Q, 3); offsets: (K, 3) static numpy.
        sorted_lin/order: from build_lookup over the SEARCHED set (size V).
    Returns:
        (Q, K) int32 indices into the searched set, sentinel = V.
    """
    v = order.shape[0]
    off = jnp.asarray(offsets, jnp.int32)  # (K, 3)
    q = query_coords[:, None, :] + off[None, :, :]  # (Q, K, 3)
    qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]
    ok = (
        query_valid[:, None]
        & (qx >= 0) & (qx < grid.nx)
        & (qy >= 0) & (qy < grid.ny)
        & (qz >= 0) & (qz < grid.nz)
    )
    qlin = jnp.where(ok, (qz * grid.ny + qy) * grid.nx + qx, grid.num_cells)
    pos = jnp.searchsorted(sorted_lin, qlin.reshape(-1)).reshape(qlin.shape)
    pos = jnp.clip(pos, 0, v - 1)
    found = (jnp.take(sorted_lin, pos) == qlin) & (qlin < grid.num_cells)
    idx = jnp.take(order, pos)
    return jnp.where(found, idx, v).astype(jnp.int32)


def transpose_down_neighbors(down_grid: SparseGrid, in_coords, in_valid,
                             out_cmap, q_cap: int, offsets, z_only=False):
    """Transpose neighbor table of a stride-2 sparse conv.

    tnbr[p, k] = the output slot q whose kernel tap k reads input p, i.e.
    center(q) + offsets[k] == in_coords[p] (sentinel q_cap where the implied
    center has odd parity, is out of grid, or is not an active output).
    center(q) = 2·out_coord (xyz stride) or (x, y, 2·z) (z_only). Used by the
    gather-only backward of the strided conv (models/sparse_backbone.py).
    """
    off = jnp.asarray(offsets, jnp.int32)  # (K, 3)
    t = in_coords[:, None, :] - off[None, :, :]  # (V, K, 3) implied centers
    if z_only:
        par_ok = (t[..., 2] % 2) == 0
        qc = jnp.stack([t[..., 0], t[..., 1], t[..., 2] // 2], axis=-1)
    else:
        par_ok = jnp.all((t % 2) == 0, axis=-1)
        qc = t // 2
    qx, qy, qz = qc[..., 0], qc[..., 1], qc[..., 2]
    ok = (
        in_valid[:, None] & par_ok
        & (qx >= 0) & (qx < down_grid.nx)
        & (qy >= 0) & (qy < down_grid.ny)
        & (qz >= 0) & (qz < down_grid.nz)
    )
    qlin = jnp.where(ok, (qz * down_grid.ny + qy) * down_grid.nx + qx,
                     down_grid.num_cells)
    idx = jnp.take(out_cmap, qlin.reshape(-1), axis=0).reshape(qlin.shape)
    return jnp.where(ok & (idx >= 0), idx, q_cap).astype(jnp.int32)


def kernel_offsets(kx: int, ky: int, kz: int) -> np.ndarray:
    """Centered kernel offset list, e.g. 3×3×3 → (27, 3)."""
    ox = np.arange(kx) - kx // 2
    oy = np.arange(ky) - ky // 2
    oz = np.arange(kz) - kz // 2
    grid = np.stack(np.meshgrid(ox, oy, oz, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("down_grid", "out_cap", "z_only"))
def downsample_coords(down_grid: SparseGrid, coords, valid, out_cap: int,
                      z_only: bool = False):
    """Active output set of a stride-2 sparse conv: the unique parent cells
    (coords // 2) of the active inputs (torchsparse-style downsample; spconv's
    full receptive-field output set is a superset — deliberate simplification,
    see models/sparse_backbone.py module doc).

    Args:
        down_grid: the OUTPUT grid (must satisfy num_cells < 2^31).
    Returns (out_coords (out_cap, 3), out_valid, parent_of_input (V,)) where
    parent_of_input maps each input voxel to its output slot (sentinel out_cap).
    """
    if z_only:
        parent = jnp.stack(
            [coords[:, 0], coords[:, 1], coords[:, 2] // 2], axis=1
        )
    else:
        parent = coords // 2
    # unique via sort-compaction on the output-grid linear id (int32-safe)
    key = linearize(down_grid, parent, valid)
    sentinel = down_grid.num_cells
    order = jnp.argsort(key)
    skey = key[order]
    is_start = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_start = is_start & (skey < sentinel)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg = jnp.where((skey < sentinel) & (seg < out_cap), seg, out_cap)
    slot_of_input = jnp.zeros_like(seg).at[order].set(seg)
    num_out = jnp.minimum(jnp.sum(is_start.astype(jnp.int32)), out_cap)
    out_coords = (
        jnp.zeros((out_cap, 3), jnp.int32)
        .at[jnp.where(is_start, seg, out_cap)]
        .set(parent[order], mode="drop")
    )
    out_valid = jnp.arange(out_cap) < num_out
    return out_coords, out_valid, slot_of_input


def ingroup_inds(group_ids, valid=None):
    """Index of each element within its group (SURVEY §2.1 N7: the
    ingroup_inds CUDA op used by DSVT's set partitioning,
    pcdet/ops/ingroup_inds). Sort-based, fully static shapes.

    Args:
        group_ids: (N,) int32; valid: (N,) bool (invalid sort last, get -1).
    Returns:
        (N,) int32 rank within group, stable by original order.
    """
    n = group_ids.shape[0]
    if valid is not None:
        big = jnp.iinfo(jnp.int32).max
        keys = jnp.where(valid, group_ids, big)
    else:
        keys = group_ids
    order = jnp.argsort(keys, stable=True)
    sorted_keys = jnp.take(keys, order)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    pos = jnp.arange(n, dtype=jnp.int32)
    start_pos = jnp.where(is_start, pos, 0)
    start_of = jax.lax.associative_scan(jnp.maximum, start_pos)
    rank_sorted = pos - start_of
    out = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
    if valid is not None:
        out = jnp.where(valid, out, -1)
    return out
