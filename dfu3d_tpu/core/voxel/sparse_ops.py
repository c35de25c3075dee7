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
