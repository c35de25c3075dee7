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


def map_dtype(v: int):
    """Cell-map element dtype: uint16 while slot+1 fits, else int32.

    Random gathers of 2-byte elements from the big dense maps are ~4.5×
    faster than 4-byte on the v5e (measured round 2 on the 90M-cell stride-1
    grid: 15 ms vs 71 ms for 1.08M 3-wide window rows), and the map build /
    prefetch copies halve. Values are encoded slot+1 with 0 = empty (no -1
    in unsigned), which both dtypes share for uniform decoding.
    """
    return jnp.uint16 if v <= 65534 else jnp.int32


def build_cell_map(grid: SparseGrid, coords, valid):
    """Dense cell→slot map: (num_cells + 3,), value = slot+1 (0 = empty),
    with one LEADING and two trailing zero pad rows (map index p = cell p−1).

    One scatter instead of a sort; lookups become one gather. This is the
    TPU-native replacement for spconv's GPU hash table (reference
    pcdet/ops/.../spconv hash lookups): random scatters/gathers of small
    slots beat searchsorted's 17-deep dependent-gather binary search by ~100×
    on TPU (measured round 2: 596 ms → ~5 ms for a 60k-voxel 27-point
    neighbor table). The pad layout lets `find_neighbors_via_map_packed`
    fetch 3-consecutive-cell windows without clamping; invalid/out-of-grid
    voxels scatter out of range (dropped). Element dtype per `map_dtype`.
    """
    v = coords.shape[0]
    dt = map_dtype(v)
    lin = linearize(grid, coords, valid)
    ids = jnp.where(lin < grid.num_cells, lin + 1, grid.num_cells + 3)
    cmap = jnp.zeros((grid.num_cells + 3,), dt)
    return cmap.at[ids].set(jnp.arange(1, v + 1, dtype=dt), mode="drop",
                            unique_indices=True)


class CellMap(NamedTuple):
    """Dense cell→slot map plus an optional x-pair-packed companion.

    `slots`: the `build_cell_map` layout (value slot+1, 0 = empty, cell c at
    index c+1). `pair`: uint32 with pair[i] = slots[i] | slots[i+1] << 16 —
    one u32 gather fetches TWO consecutive x-taps. Motivation (measured on
    chip, round 3, 90M-cell stride-1 grid): XLA decomposes a
    slice_sizes=(3,) window gather into 3 element-gather fusions
    (~13.5 ms/step each at 1.08M rows); gathers cost ~constant time per ROW,
    so packing taps into wider elements is the only way to cut the row
    count. Only built while slot+1 fits 16 bits (map_dtype uint16).

    Batched maps are FLAT (B·(num_cells+3),) with element b's region starting
    at base = b·(num_cells+3); lookups take a `base` scalar. Round-4 measured
    motivation: a (B, stride) reshape of the flat scatter output forces a
    T(1024)→T(2,128) relayout that XLA lowers as a per-element while loop of
    dynamic-update-slices — ~51 ms/step at the 90M-cell stage-1 KITTI grid
    (profile: tools/dev/profile_second.py). Flat maps never relayout."""

    slots: jnp.ndarray
    pair: jnp.ndarray | None


def _pack_pair(flat_slots):
    """pair[i] = m[i] | m[i+1]<<16 over the flat (B·stride,) u16 map.

    The +1 shift at an element boundary reads the NEXT element's index 0 —
    its leading zero pad — and valid window starts never address the last
    two pad rows, so no cross-element leakage is observable."""
    m32 = flat_slots.astype(jnp.uint32)
    nxt = jnp.concatenate([m32[1:], m32[:1]])
    return m32 | (nxt << jnp.uint32(16))


def build_cell_map_batched(grid: SparseGrid, coords, valid,
                           with_pair: bool = True) -> CellMap:
    """FLAT (B·(num_cells+3),) dense maps via ONE scatter (+ pair companion).

    `jax.vmap(build_cell_map)` lowers the batched scatter to a sequential
    while-loop of 4·num_cells-byte dynamic-update-slices (measured round 2:
    ~27 ms/step on the 90M-cell stride-1 KITTI grid at B=2). Scattering into
    a flat (B·(num_cells+3),) buffer with batch-offset ids is a single
    parallel scatter. The result STAYS flat: reshaping to (B, stride) forces
    a tiled-layout relayout lowered as a per-element while loop (~51 ms/step
    measured round 4 at the stage-1 KITTI grid) — lookups instead take a
    per-element `base` offset.
    """
    b, v = coords.shape[0], coords.shape[1]
    stride = grid.num_cells + 3
    assert b * stride < 2 ** 31 - 1, "flat map exceeds int32 indexing"
    lin = jax.vmap(lambda c, vv: linearize(grid, c, vv))(coords, valid)
    ids = jnp.where(lin < grid.num_cells, lin + 1, b * stride)
    ids = jnp.where(
        ids < b * stride,
        ids + (jnp.arange(b, dtype=ids.dtype) * stride)[:, None],
        b * stride,
    )
    dt = map_dtype(v)
    slots = jnp.broadcast_to(jnp.arange(1, v + 1, dtype=dt)[None], (b, v))
    flat = jnp.zeros((b * stride,), dt)
    # voxelizer output cells are unique per element; every invalid slot
    # scatters out of range (dropped) — declaring uniqueness lets XLA lower
    # one parallel scatter instead of a sequential while loop
    flat = flat.at[ids.reshape(-1)].set(slots.reshape(-1), mode="drop",
                                        unique_indices=True)
    pair = None
    if with_pair and dt == jnp.uint16:
        pair = _pack_pair(flat)
    return CellMap(flat, pair)


def map_bases(grid: SparseGrid, b: int):
    """(B,) int32 start offsets of each element's region in a flat map."""
    return jnp.arange(b, dtype=jnp.int32) * (grid.num_cells + 3)


# ---------------------------------------------------------------------------
# Columnar (BEV) cell maps
#
# The dense 3D maps above index num_cells entries (180M at the KITTI stage-1
# grid, ×2 with the u32 pair companion): building them moves ~1 GB/step and
# random lookups into them run at ~13 ns/row (profiled round 5,
# tools/dev/profile_second.py — the largest cost block of the SECOND step).
# A columnar map stores ONE row per BEV cell (nx·ny = 2.25M at the same
# grid, 40× smaller): a z-occupancy bitmask (nz ≤ 64) plus the slot of the
# column's first voxel. The neighbor slot for (x, y, z) is then
#     base + popcount(occ & bits_below(z)),
# which is exact because voxel slots are sorted COLUMN-MAJOR (z fastest) —
# the dynamic_voxelize / downsample_coords compaction order
# (voxelize.linear_index_3d). A 3×3×3 submanifold lookup needs 9 BEV row
# gathers (vs 18 window rows on the packed dense path) from a ~50 MB table
# (vs ~1 GB), and the z taps are pure VPU bit math. This is the map-side
# half of the column idea WITHOUT the dense-z execution that lost the
# round-5 A/B 10.7× (AB_COLUMN_r05.json): features keep the gather-GEMM
# path; only the table machinery goes columnar.
# ---------------------------------------------------------------------------

COLUMN_MAP_MAX_NZ = 64


class ColumnMap(NamedTuple):
    """Flat batched columnar map: data (B·(nx·ny + 1), 3) uint32 rows
    [occ_lo (z 0-31), occ_hi (z 32-63), base_slot+1 (0 = empty column)].
    Element b's BEV cell (x, y) is row b·(nx·ny + 1) + y·nx + x; each
    element's trailing row is its invalid-voxel sink (never looked up —
    queries clamp to cell < nx·ny). The per-element stride keeps the
    build's scatter ids MONOTONE so occupancy accumulates as a sorted
    segment sum instead of a duplicate-index scatter-add. REQUIRES the
    voxel slots to be sorted column-major with z ascending (see module
    comment)."""

    data: jnp.ndarray
    nbev: int  # nx · ny (static)


def column_major_index(grid: SparseGrid, coords, valid):
    """Column-major sort key ((y·nx + x)·nz + z); invalid → num_cells."""
    ix, iy, iz = coords[:, 0], coords[:, 1], coords[:, 2]
    ok = (
        valid
        & (ix >= 0) & (ix < grid.nx)
        & (iy >= 0) & (iy < grid.ny)
        & (iz >= 0) & (iz < grid.nz)
    )
    lin = (iy * grid.nx + ix) * grid.nz + iz
    return jnp.where(ok, lin, grid.num_cells)


def column_map_bases(grid: SparseGrid, b: int):
    """(B,) int32 start rows of each element's region in a ColumnMap."""
    return jnp.arange(b, dtype=jnp.int32) * (grid.nx * grid.ny + 1)


def build_column_map_batched(grid: SparseGrid, coords, valid) -> ColumnMap:
    """One (B·nbev + 1, 3) u32 scatter pass: occupancy bits via scatter-add
    (bits are distinct per voxel — the voxelizer's unique-cell invariant
    makes add == or) and column bases via a unique scatter at column starts
    (consecutive-slot comparison, valid because slots are column-sorted)."""
    assert grid.nz <= COLUMN_MAP_MAX_NZ, grid
    b, v = coords.shape[0], coords.shape[1]
    nbev = grid.nx * grid.ny
    ix, iy, iz = coords[..., 0], coords[..., 1], coords[..., 2]
    ok = (
        valid
        & (ix >= 0) & (ix < grid.nx)
        & (iy >= 0) & (iy < grid.ny)
        & (iz >= 0) & (iz < grid.nz)
    )
    bev = iy * grid.nx + ix
    stride = nbev + 1
    base_off = (jnp.arange(b, dtype=jnp.int32) * stride)[:, None]
    # invalid rows target each element's own trailing sink row, keeping ids
    # MONOTONE per element AND across the flat id space (column-major slot
    # order puts invalid slots last within each element)
    ids = jnp.where(ok, bev + base_off, nbev + base_off)

    zc = jnp.clip(iz, 0, grid.nz - 1).astype(jnp.uint32)
    one = jnp.uint32(1)
    bit_lo = jnp.where(ok & (zc < 32), one << jnp.minimum(zc, 31), 0)
    bit_hi = jnp.where(ok & (zc >= 32),
                       one << jnp.minimum(zc - 32, 31), 0)

    flat_ids = ids.reshape(-1)
    # occupancy bits via a SORTED segment sum (bits are distinct per voxel,
    # so sum == or): avoids the serialized duplicate-index scatter-add
    # (profiled round 5: ~5 ms per stage map at 120k voxels)
    occ = jax.ops.segment_sum(
        jnp.stack([bit_lo, bit_hi], axis=-1).reshape(-1, 2).astype(jnp.uint32),
        flat_ids,
        num_segments=b * stride,
        indices_are_sorted=True,
    )
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    is_start = ok & (ids != prev)
    slot = jnp.broadcast_to(
        jnp.arange(1, v + 1, dtype=jnp.uint32)[None], (b, v))
    base = (
        jnp.zeros((b * stride,), jnp.uint32)
        .at[jnp.where(is_start, ids, b * stride).reshape(-1)]
        .set(slot.reshape(-1), mode="drop", unique_indices=True)
    )
    return ColumnMap(jnp.concatenate([occ, base[:, None]], axis=-1), nbev)


@functools.lru_cache(maxsize=32)
def _grouped_offsets(off_key) -> tuple:
    """Static regrouping of a (K, 3) offset list by BEV tap (ox, oy):
    (((ox, oy), ((dz, k), ...)), ...) preserving first-seen group order."""
    off = np.asarray(off_key, np.int32).reshape(-1, 3)
    groups: dict = {}
    for k, (ox, oy, oz) in enumerate(off):
        groups.setdefault((int(ox), int(oy)), []).append((int(oz), int(k)))
    return tuple((g, tuple(taps)) for g, taps in groups.items())


def _column_rank(occ_lo, occ_hi, zp, nz):
    """(present, rank) of z slot `zp` in a column's occupancy bits."""
    zc = jnp.clip(zp, 0, COLUMN_MAP_MAX_NZ - 1).astype(jnp.uint32)
    lo = zc < 32
    sh_lo = jnp.minimum(zc, 31)
    sh_hi = jnp.minimum(jnp.where(lo, 0, zc - 32), 31)
    one = jnp.uint32(1)
    present = jnp.where(
        lo, (occ_lo >> sh_lo) & one, (occ_hi >> sh_hi) & one) == 1
    mask_lo = jnp.where(lo, (one << sh_lo) - one, jnp.uint32(0xFFFFFFFF))
    mask_hi = jnp.where(lo, jnp.uint32(0), (one << sh_hi) - one)
    rank = (jax.lax.population_count(occ_lo & mask_lo)
            + jax.lax.population_count(occ_hi & mask_hi))
    zok = (zp >= 0) & (zp < nz)
    return present & zok, rank.astype(jnp.int32)


def find_neighbors_via_column_map(grid: SparseGrid, query_coords, query_valid,
                                  colmap: ColumnMap, v: int, offsets, base=0):
    """Columnar twin of `find_neighbors_via_map`: (Q, K) slot indices,
    sentinel = v. One BEV row gather per unique (ox, oy) tap group (9 for a
    3×3×3 kernel, 1 for the z-only (1,1,3) conv_out); z taps are bit tests +
    popcount ranking. `base` = the element's start row (column_map_bases)."""
    groups = _grouped_offsets(tuple(np.asarray(offsets).reshape(-1)))
    x, y, z = query_coords[:, 0], query_coords[:, 1], query_coords[:, 2]
    k_total = int(np.asarray(offsets).reshape(-1, 3).shape[0])
    out = [None] * k_total
    for (ox, oy), taps in groups:
        cx, cy = x + ox, y + oy
        ok2 = (query_valid
               & (cx >= 0) & (cx < grid.nx) & (cy >= 0) & (cy < grid.ny))
        cell = base + (jnp.clip(cy, 0, grid.ny - 1) * grid.nx
                       + jnp.clip(cx, 0, grid.nx - 1))
        row = jnp.take(colmap.data, cell, axis=0)  # (Q, 3) u32, clip mode
        occ_lo, occ_hi, bp = row[:, 0], row[:, 1], row[:, 2]
        for dz, k in taps:
            present, rank = _column_rank(occ_lo, occ_hi, z + dz, grid.nz)
            slot = bp.astype(jnp.int32) - 1 + rank
            out[k] = jnp.where(ok2 & present & (bp > 0), slot, v)
    return jnp.stack(out, axis=1).astype(jnp.int32)


def transpose_down_neighbors_column(down_grid: SparseGrid, in_coords,
                                    in_valid, out_colmap: ColumnMap,
                                    q_cap: int, offsets, z_only=False,
                                    base=0):
    """Columnar twin of `transpose_down_neighbors(_packed)`: for each input
    voxel p and tap k, the output slot q with center(q) + offsets[k] ==
    in_coords[p] (sentinel q_cap). Full-3D stride: the implied BEV parents
    span the 2×2 window at (⌊(x−1)/2⌋, ⌊(y−1)/2⌋) — 4 row gathers; z_only:
    the voxel's own BEV cell — 1 row gather."""
    off = np.asarray(offsets, np.int32)
    x, y, z = in_coords[:, 0], in_coords[:, 1], in_coords[:, 2]

    if z_only:
        ok0 = (in_valid & (x >= 0) & (x < down_grid.nx)
               & (y >= 0) & (y < down_grid.ny))
        cell = base + (jnp.clip(y, 0, down_grid.ny - 1) * down_grid.nx
                       + jnp.clip(x, 0, down_grid.nx - 1))
        row = jnp.take(out_colmap.data, cell, axis=0)
        occ_lo, occ_hi, bp = row[:, 0], row[:, 1], row[:, 2]
        outs = []
        for k in range(off.shape[0]):
            oz = int(off[k, 2])
            tz = z - oz
            par_ok = (tz % 2) == 0
            qz = tz // 2
            present, rank = _column_rank(occ_lo, occ_hi, qz, down_grid.nz)
            slot = bp.astype(jnp.int32) - 1 + rank
            outs.append(jnp.where(ok0 & par_ok & present & (bp > 0),
                                  slot, q_cap))
        return jnp.stack(outs, axis=1).astype(jnp.int32)

    qx0, qy0 = (x - 1) // 2, (y - 1) // 2
    rows = []
    for dy in (0, 1):
        for dx in (0, 1):
            cx, cy = qx0 + dx, qy0 + dy
            ok2 = (in_valid & (cx >= 0) & (cx < down_grid.nx)
                   & (cy >= 0) & (cy < down_grid.ny))
            cell = base + (jnp.clip(cy, 0, down_grid.ny - 1) * down_grid.nx
                           + jnp.clip(cx, 0, down_grid.nx - 1))
            r = jnp.take(out_colmap.data, cell, axis=0)
            rows.append((ok2, r[:, 0], r[:, 1], r[:, 2]))

    outs = []
    for k in range(off.shape[0]):
        oxk, oyk, ozk = int(off[k, 0]), int(off[k, 1]), int(off[k, 2])
        tx, ty, tz = x - oxk, y - oyk, z - ozk
        par_ok = ((tx % 2) == 0) & ((ty % 2) == 0) & ((tz % 2) == 0)
        qx, qy, qz = tx // 2, ty // 2, tz // 2
        wx, wy = qx - qx0, qy - qy0  # ∈ {0, 1} when in the parent window
        # branchless 4-way select of the gathered parent row (pure VPU)
        sel_ok = jnp.zeros_like(par_ok)
        occ_lo = jnp.zeros_like(rows[0][1])
        occ_hi = jnp.zeros_like(rows[0][2])
        bp = jnp.zeros_like(rows[0][3])
        for j, (ok2, lo, hi, bs) in enumerate(rows):
            pick = (wy * 2 + wx) == j
            sel_ok = jnp.where(pick, ok2, sel_ok)
            occ_lo = jnp.where(pick, lo, occ_lo)
            occ_hi = jnp.where(pick, hi, occ_hi)
            bp = jnp.where(pick, bs, bp)
        present, rank = _column_rank(occ_lo, occ_hi, qz, down_grid.nz)
        slot = bp.astype(jnp.int32) - 1 + rank
        ok = (par_ok & sel_ok & present & (bp > 0)
              & (wx >= 0) & (wx <= 1) & (wy >= 0) & (wy <= 1))
        outs.append(jnp.where(ok, slot, q_cap))
    return jnp.stack(outs, axis=1).astype(jnp.int32)


def _map_parts(cell_map):
    """Accept a CellMap or a bare slots array (oracle tests / focal path)."""
    if isinstance(cell_map, CellMap):
        return cell_map.slots, cell_map.pair
    return cell_map, None


def find_neighbors_via_map(grid: SparseGrid, query_coords, query_valid,
                           cell_map, v: int, offsets, base=0):
    """Dense-map twin of `find_neighbors`: (Q, K) indices, sentinel = v.
    `cell_map` uses the padded layout of `build_cell_map` (cell c at p=c+1);
    for flat batched maps pass the element's start offset as `base`."""
    cell_map, _ = _map_parts(cell_map)
    off = jnp.asarray(offsets, jnp.int32)
    q = query_coords[:, None, :] + off[None, :, :]
    qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]
    ok = (
        query_valid[:, None]
        & (qx >= 0) & (qx < grid.nx)
        & (qy >= 0) & (qy < grid.ny)
        & (qz >= 0) & (qz < grid.nz)
    )
    qlin = jnp.where(ok, (qz * grid.ny + qy) * grid.nx + qx, grid.num_cells + 1)
    val = jnp.take(cell_map, base + qlin.reshape(-1) + 1,
                   axis=0).reshape(qlin.shape)
    idx = val.astype(jnp.int32) - 1  # slot+1 encoding, 0 = empty
    return jnp.where(ok & (val > 0), idx, v).astype(jnp.int32)


def _is_x_packable(offsets) -> bool:
    """True when `offsets` is kernel_offsets(3, ky, kz) layout: taps grouped
    as k = a·(ky·kz) + g with ox = a−1 varying slowest — each (oy, oz) group's
    three x-taps address 3 consecutive cells."""
    off = np.asarray(offsets)
    if off.shape[0] % 3 != 0 or off.shape[0] < 3:
        return False
    gk = off.shape[0] // 3
    for a in range(3):
        blk = off[a * gk:(a + 1) * gk]
        if not np.all(blk[:, 0] == a - 1):
            return False
        if not np.array_equal(blk[:, 1:], off[:gk, 1:]):
            return False
    return True


def find_neighbors_via_map_packed(grid: SparseGrid, query_coords, query_valid,
                                  cell_map, v: int, offsets, base=0):
    """x-packed neighbor lookup: fetch each (oy, oz) group's three x-taps as
    ONE contiguous 3-cell window of the dense map (`lax.gather` with
    slice_sizes=(3,)) — 9 window rows per query instead of 27 element rows.
    Random gathers on TPU cost ~constant time PER ROW regardless of width
    (measured round 2), and on the 90M-cell stride-1 KITTI grid the element
    lookups were the single largest cost of the SECOND train step (~39 ms for
    3.24M rows). Requires `offsets` in kernel_offsets(3, ky, kz) layout
    (`_is_x_packable`); callers fall back to `find_neighbors_via_map`.

    `cell_map` is the padded layout of `build_cell_map` (cell c at index
    c + 1), so window starts never clamp: the window for cells
    (L−1, L, L+1) begins at index L.
    """
    cell_map, pair = _map_parts(cell_map)
    off = np.asarray(offsets)
    k = off.shape[0]
    gk = k // 3
    qn = query_coords.shape[0]
    # dx=0 plane: group cell lins (window centers); the center x equals the
    # query's own x (ox = 0), in-range for every valid query
    off0 = jnp.asarray(off[gk:2 * gk], jnp.int32)            # (gk, 3), ox=0
    q = query_coords[:, None, :] + off0[None, :, :]          # (Q, gk, 3)
    qx, qy, qz = q[..., 0], q[..., 1], q[..., 2]
    ctr_ok = (
        query_valid[:, None]
        & (qx >= 0) & (qx < grid.nx)
        & (qy >= 0) & (qy < grid.ny)
        & (qz >= 0) & (qz < grid.nz)
    )
    lin0 = base + jnp.where(ctr_ok, (qz * grid.ny + qy) * grid.nx + qx,
                            grid.num_cells + 1)
    if pair is not None:
        # 2 gathers instead of 3: taps (−1, 0) from the u32 pair map, tap
        # (+1) from the u16 map (slice_sizes windows decompose into one
        # element-gather fusion PER TAP on this backend — row count is the
        # cost, so pack taps into element width)
        st = lin0.reshape(-1)
        p = jnp.take(pair, st, axis=0).reshape(qn, gk)
        t01 = jnp.stack(
            [(p & jnp.uint32(0xFFFF)), (p >> jnp.uint32(16))], axis=-1
        ).astype(cell_map.dtype)
        t2 = jnp.take(cell_map, st + 2, axis=0).reshape(qn, gk, 1)
        win = jnp.concatenate([t01, t2], axis=-1)             # (Q, gk, 3)
    else:
        start = lin0.reshape(-1, 1).astype(jnp.int32)
        win = jax.lax.gather(
            cell_map, start,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(3,), mode="clip",
        ).reshape(qn, gk, 3)                                  # [q, g, dx]
    # per-tap validity: x bound of each dx tap (windows crossing a y-row
    # fetch the adjacent row's cells — masked here)
    dx = jnp.asarray([-1, 0, 1], jnp.int32)
    tap_x = qx[..., None] + dx[None, None, :]
    ok = ctr_ok[..., None] & (tap_x >= 0) & (tap_x < grid.nx)
    # slot+1 encoding, 0 = empty
    idx = jnp.where(ok & (win > 0), win.astype(jnp.int32) - 1, v)
    # (Q, gk, 3)[g, dx] → (Q, K) with k = dx_index·gk + g
    return idx.transpose(0, 2, 1).reshape(qn, k).astype(jnp.int32)


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
                             out_cmap, q_cap: int, offsets, z_only=False,
                             base=0):
    """Transpose neighbor table of a stride-2 sparse conv.

    tnbr[p, k] = the output slot q whose kernel tap k reads input p, i.e.
    center(q) + offsets[k] == in_coords[p] (sentinel q_cap where the implied
    center has odd parity, is out of grid, or is not an active output).
    center(q) = 2·out_coord (xyz stride) or (x, y, 2·z) (z_only). Used by the
    gather-only backward of the strided conv (models/sparse_backbone.py).
    """
    out_cmap, _ = _map_parts(out_cmap)
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
    # padded map layout (build_cell_map): cell c lives at index c + 1
    val = jnp.take(out_cmap, base + qlin.reshape(-1) + 1,
                   axis=0).reshape(qlin.shape)
    idx = val.astype(jnp.int32) - 1  # slot+1 encoding, 0 = empty
    return jnp.where(ok & (val > 0), idx, q_cap).astype(jnp.int32)


def transpose_down_neighbors_packed(down_grid: SparseGrid, in_coords,
                                    in_valid, out_cmap, q_cap: int, offsets,
                                    base=0):
    """Packed twin of `transpose_down_neighbors` for full-3D stride-2 convs.

    Every tap's implied output cell qc = (p − o)/2 with o ∈ {−1,0,1}³ lies in
    the 2×2×2 parent window starting at (⌊(x−1)/2⌋, ⌊(y−1)/2⌋, ⌊(z−1)/2⌋), so
    4 two-wide x-window gathers of the dense map replace 27 element gathers
    (random gathers cost ~constant time per ROW on TPU — this was the single
    largest op of the SECOND train step, ~35 ms/step at 60k voxels B=2).
    Selecting each tap's cell from the fetched 8 is then pure VPU arithmetic
    (take_along_axis over an 8-wide axis).
    """
    out_cmap, pair = _map_parts(out_cmap)
    off = np.asarray(offsets)
    assert off.shape[0] == 27 and np.all(np.abs(off) <= 1), "3x3x3 only"
    x, y, z = in_coords[:, 0], in_coords[:, 1], in_coords[:, 2]
    v = in_coords.shape[0]
    qx0, qy0, qz0 = (x - 1) // 2, (y - 1) // 2, (z - 1) // 2

    # 4 window rows per voxel: (dz, dy) ∈ {0,1}², each a 2-wide x slice
    dyz = np.array([(dz, dy) for dz in (0, 1) for dy in (0, 1)], np.int32)
    qy_r = qy0[:, None] + dyz[None, :, 1]           # (V, 4)
    qz_r = qz0[:, None] + dyz[None, :, 0]
    row_ok = (
        in_valid[:, None]
        & (qy_r >= 0) & (qy_r < down_grid.ny)
        & (qz_r >= 0) & (qz_r < down_grid.nz)
    )
    c0 = (qz_r * down_grid.ny + qy_r) * down_grid.nx + qx0[:, None]
    # map index of a 2-slice covering cells (c0, c0+1) is c0+1 (padded
    # layout); invalid rows start at the trailing −1 pads. c0 ≥ −1 always.
    start = base + jnp.where(row_ok, c0 + 1, down_grid.num_cells + 1)
    if pair is not None:
        # both taps of each 2-wide window from ONE u32 pair-map gather
        p = jnp.take(pair, start.reshape(-1), axis=0).reshape(v, 4)
        win = jnp.stack(
            [(p & jnp.uint32(0xFFFF)), (p >> jnp.uint32(16))], axis=-1
        ).astype(out_cmap.dtype).reshape(v, 8)
    else:
        win = jax.lax.gather(
            out_cmap, start.reshape(-1, 1).astype(jnp.int32),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(2,), mode="clip",
        ).reshape(v, 8)                              # [(dz,dy) major, dx minor]

    oj = jnp.asarray(off, jnp.int32)                 # (27, 3) = (ox, oy, oz)
    tx = x[:, None] - oj[None, :, 0]                 # implied center per tap
    ty = y[:, None] - oj[None, :, 1]
    tz = z[:, None] - oj[None, :, 2]
    par_ok = ((tx % 2) == 0) & ((ty % 2) == 0) & ((tz % 2) == 0)
    qx, qy, qz = tx // 2, ty // 2, tz // 2
    ok = (
        in_valid[:, None] & par_ok
        & (qx >= 0) & (qx < down_grid.nx)
        & (qy >= 0) & (qy < down_grid.ny)
        & (qz >= 0) & (qz < down_grid.nz)
    )
    wx = qx - qx0[:, None]                           # ∈ {0, 1} when ok
    wy = qy - qy0[:, None]
    wz = qz - qz0[:, None]
    pos = jnp.clip((wz * 2 + wy) * 2 + wx, 0, 7)
    # branchless 8-way select: take_along_axis over a tiny trailing axis
    # lowers to a per-lane serialized gather on TPU (measured round 2: ~56
    # ms/step across the three stages); 8 compare-selects are pure VPU
    val = jnp.zeros(pos.shape, out_cmap.dtype)
    for j in range(8):
        val = jnp.where(pos == j, win[:, j:j + 1], val)
    idx = val.astype(jnp.int32) - 1  # slot+1 encoding, 0 = empty
    return jnp.where(ok & (val > 0), idx, q_cap).astype(jnp.int32)


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
    # unique via sort-compaction on the output-grid COLUMN-MAJOR id: output
    # slots inherit the columnar ordering (z fastest), preserving the
    # ColumnMap invariant down every stage (int32-safe either order)
    key = column_major_index(down_grid, parent, valid)
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


def grouped_column_neighbors(grid: SparseGrid, query_coords, query_valid,
                             colmap: ColumnMap, v: int, offsets, base=0):
    """3×3×3 neighbor lookup in GROUPED form for packed-row gather-GEMMs.

    Column-contiguous slots (z fastest) put a voxel's z∓1 neighbors at the
    ADJACENT rows of the feature table, so per BEV tap group (ox, oy) the
    three z taps can be fetched as ONE 3C-wide packed row instead of three
    C-wide rows — random gathers cost ~constant time per ROW (round-2/3
    measurements), so this cuts the sparse conv's feature-fetch rows 3×.

    Returns (idx (Q, 9) int32, p (Q, 9, 3) bool):
      idx   = row of the would-be z tap (base + rank(z), even when z itself
              is absent); sentinel v when the BEV cell is empty/OOB.
      p[..., dz+1] = presence of the (z+dz) tap. Row arithmetic consumed by
      the packed GEMM (models/sparse_backbone.subm_gather_gemm_grouped):
        row(z−1) = idx − p0  (block 0 of the packed row when present)
        row(z)   = idx       (block 1)
        row(z+1) = idx + p1  (block 1+p1 → select block 1 or 2)
    Tap order: kernel_offsets(3, 3, 3) (x slowest, z fastest) ⇒ original
    tap k = g·3 + (dz+1) with g = (ox+1)·3 + (oy+1).
    """
    off = np.asarray(offsets, np.int32)
    assert off.shape[0] == 27 and np.all(np.abs(off) <= 1), "3x3x3 only"
    x, y, z = query_coords[:, 0], query_coords[:, 1], query_coords[:, 2]
    idx_g, p_g = [], []
    for a in (-1, 0, 1):
        for b in (-1, 0, 1):
            cx, cy = x + a, y + b
            ok2 = (query_valid
                   & (cx >= 0) & (cx < grid.nx) & (cy >= 0) & (cy < grid.ny))
            cell = base + (jnp.clip(cy, 0, grid.ny - 1) * grid.nx
                           + jnp.clip(cx, 0, grid.nx - 1))
            row = jnp.take(colmap.data, cell, axis=0)  # (Q, 3) u32
            occ_lo, occ_hi, bp = row[:, 0], row[:, 1], row[:, 2]
            ok_col = ok2 & (bp > 0)
            pm1, rank_m1 = _column_rank(occ_lo, occ_hi, z - 1, grid.nz)
            pc, rank = _column_rank(occ_lo, occ_hi, z, grid.nz)
            pp1, _ = _column_rank(occ_lo, occ_hi, z + 1, grid.nz)
            del rank_m1
            idx = jnp.where(ok_col, bp.astype(jnp.int32) - 1 + rank, v)
            idx_g.append(idx)
            p_g.append(jnp.stack(
                [pm1 & ok_col, pc & ok_col, pp1 & ok_col], axis=-1))
    return jnp.stack(idx_g, axis=1), jnp.stack(p_g, axis=1)


def grouped_transpose_tables(down_grid: SparseGrid, in_coords, in_valid,
                             out_colmap: ColumnMap, q_cap: int, base=0):
    """Packed-row transpose tables for the stride-2 conv backward.

    Every tap's implied output parent lies in the 2×2 BEV window at
    (⌊(x−1)/2⌋, ⌊(y−1)/2⌋) with z-parent ∈ {zp0, zp0+1} (zp0 = ⌊(z−1)/2⌋),
    so FOUR packed g-row fetches cover all 27 taps; per-tap routing is pure
    VPU select. Returns:
      idx_t (V, 4) int32 — row of the zp0 slot per BEV parent (sentinel
            q_cap when the parent column is empty/OOB),
      pz    (V, 4, 2) bool — presence of zp0 / zp0+1 in that column,
      sel   (V, 27) int32 — tap → candidate index (j·2 + wz) ∈ [0, 8),
      okk   (V, 27) bool — tap parity/bounds validity.
    Consumed by models/sparse_backbone._down_grouped_bwd.
    """
    x, y, z = in_coords[:, 0], in_coords[:, 1], in_coords[:, 2]
    qx0, qy0 = (x - 1) // 2, (y - 1) // 2
    zp0 = (z - 1) // 2
    idx_t, pz = [], []
    for dy in (0, 1):
        for dx in (0, 1):
            cx, cy = qx0 + dx, qy0 + dy
            ok2 = (in_valid & (cx >= 0) & (cx < down_grid.nx)
                   & (cy >= 0) & (cy < down_grid.ny))
            cell = base + (jnp.clip(cy, 0, down_grid.ny - 1) * down_grid.nx
                           + jnp.clip(cx, 0, down_grid.nx - 1))
            row = jnp.take(out_colmap.data, cell, axis=0)
            occ_lo, occ_hi, bp = row[:, 0], row[:, 1], row[:, 2]
            ok_col = ok2 & (bp > 0)
            p0, rank0 = _column_rank(occ_lo, occ_hi, zp0, down_grid.nz)
            p1, _ = _column_rank(occ_lo, occ_hi, zp0 + 1, down_grid.nz)
            idx_t.append(jnp.where(
                ok_col, bp.astype(jnp.int32) - 1 + rank0, q_cap))
            pz.append(jnp.stack([p0 & ok_col, p1 & ok_col], axis=-1))

    off = kernel_offsets(3, 3, 3)
    sels, oks = [], []
    for k in range(27):
        oxk, oyk, ozk = int(off[k, 0]), int(off[k, 1]), int(off[k, 2])
        tx, ty, tz = x - oxk, y - oyk, z - ozk
        par = ((tx % 2) == 0) & ((ty % 2) == 0) & ((tz % 2) == 0)
        qx, qy, qz = tx // 2, ty // 2, tz // 2
        wx, wy, wz = qx - qx0, qy - qy0, qz - zp0
        ok = (in_valid & par
              & (qx >= 0) & (qx < down_grid.nx)
              & (qy >= 0) & (qy < down_grid.ny)
              & (qz >= 0) & (qz < down_grid.nz)
              & (wx >= 0) & (wx <= 1) & (wy >= 0) & (wy <= 1)
              & (wz >= 0) & (wz <= 1))
        sels.append(jnp.clip((wy * 2 + wx) * 2 + wz, 0, 7))
        oks.append(ok)
    return (jnp.stack(idx_t, axis=1), jnp.stack(pz, axis=1),
            jnp.stack(sels, axis=1).astype(jnp.int32),
            jnp.stack(oks, axis=1))
