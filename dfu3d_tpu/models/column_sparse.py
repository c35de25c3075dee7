"""Column-sparse (dense-z) execution of the VoxelBackBone8x sparse conv stack.

The gather-GEMM backbone (models/sparse_backbone.py) issues 27 HBM row
gathers per submanifold conv; on the v5e random gathers cost ~constant time
per ROW (~2.6 ns, round-3 measurement), so at DFU3D capacities the row count
itself is the bottleneck. This module reformulates the SAME computation over
BEV *columns*: active voxels are grouped by BEV cell into (B, P, Z, C)
buffers with the z extent DENSE. Then

* the 3×3×3 submanifold conv = 9 BEV-neighbor column gathers (3× fewer rows,
  each Z·C wide — amortized) + 3 z-shifted slices feeding MXU GEMMs; the z
  taps cost no random gathers at all;
* the cell map shrinks from the num_cells 3D grid (90M cells at the KITTI
  stage-1 shape) to the nx·ny 2D grid (2.25M) — 40× less table traffic;
* inactive voxels inside an active column hold zeros, so summing over them
  IS the submanifold semantics (inactive neighbors contribute zero) as long
  as outputs are re-masked to the active set each layer — equivalence with
  the gather-GEMM path is asserted in tests/test_column_sparse.py.

The param tree is IDENTICAL to sparse_backbone.VoxelBackBone8x — kernels
stay (27, Cin, Cout) in the reference tap order (kernel_offsets: x slowest,
z fastest ⇒ reshape (3, 3, 3, Cin, Cout) splits (ox, oy, dz)) and module
names match — so checkpoints, torch_convert mappings, and init seeds
interop: this is an execution strategy, not a different model. Reference
semantics: pcdet/models/backbones_3d/spconv_backbone.py:70-180
(VoxelBackBone8x); the torchsparse-style strided output set matches
sparse_backbone.py's documented deviation.

Capacity-overflow deviation (documented): stage capacities cap COLUMNS here
vs VOXELS in the gather path, so under overflow the two paths truncate
different tails (the column path keeps strictly more voxels at equal cap —
more faithful to spconv, which never truncates). Equivalence holds wherever
caps don't bind (tests/test_column_sparse.py uses non-binding caps).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.voxel.sparse_ops import (
    SparseGrid,
    build_cell_map_batched,
    find_neighbors_via_map,
    kernel_offsets,
    map_bases,
)
from .sparse_backbone import SparseBatchNorm, SparseTensor

OFFSETS_2D = kernel_offsets(3, 3, 1)  # (9, 3): x slowest — tap2d k maps to
# the (27,)-tap block k*3 + dz of kernel_offsets(3, 3, 3)


def _bev_grid(grid: SparseGrid) -> SparseGrid:
    return SparseGrid(grid.nx, grid.ny, 1)


def columns_from_voxels(grid: SparseGrid, feats, coords, valid, col_cap: int):
    """(B, V, C) voxel list → dense-z columns.

    Returns (col_feats (B, P, Z, C), col_xy (B, P, 2), col_valid (B, P),
    zmask (B, P, Z)). Columns beyond col_cap drop by sorted BEV linear
    index (largest y·nx+x first) — caps are expected non-binding; the
    module header documents the overflow deviation vs the gather path.
    """
    v = feats.shape[1]
    z = grid.nz

    def one(f, cd, vl):
        lin = jnp.where(
            vl
            & (cd[:, 0] >= 0) & (cd[:, 0] < grid.nx)
            & (cd[:, 1] >= 0) & (cd[:, 1] < grid.ny),
            cd[:, 1] * grid.nx + cd[:, 0],
            grid.nx * grid.ny,
        )
        order = jnp.argsort(lin)
        slin = lin[order]
        ok = slin < grid.nx * grid.ny
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), slin[1:] != slin[:-1]]) & ok
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        seg = jnp.where(ok & (seg < col_cap), seg, col_cap)
        col_of_voxel = jnp.zeros((v,), jnp.int32).at[order].set(seg)
        n_cols = jnp.minimum(jnp.sum(is_start.astype(jnp.int32)), col_cap)
        col_xy = (
            jnp.zeros((col_cap, 2), jnp.int32)
            .at[jnp.where(is_start, seg, col_cap)]
            .set(cd[order][:, :2], mode="drop")
        )
        col_valid = jnp.arange(col_cap) < n_cols
        iz = jnp.clip(cd[:, 2], 0, z - 1)
        dest = jnp.where(
            vl & (col_of_voxel < col_cap) & (cd[:, 2] >= 0) & (cd[:, 2] < z),
            col_of_voxel * z + iz, col_cap * z,
        )
        colf = (
            jnp.zeros((col_cap * z + 1, f.shape[-1]), f.dtype)
            .at[dest].set(f, mode="drop")
        )[: col_cap * z].reshape(col_cap, z, f.shape[-1])
        zm = (
            jnp.zeros((col_cap * z + 1,), bool).at[dest].set(True, mode="drop")
        )[: col_cap * z].reshape(col_cap, z)
        return colf, col_xy, col_valid, zm

    return jax.vmap(one)(feats, coords, valid)


def _col_neighbors(grid: SparseGrid, q_xy, q_valid, col_xy, col_valid):
    """(B, Q, 9) BEV-neighbor column indices (sentinel = P) via the 2D dense
    cell map — the nx·ny-cell twin of sparse_backbone._batched_neighbors.
    `q_xy` is in the INPUT grid's cell units."""
    g2 = _bev_grid(grid)
    p = col_xy.shape[1]
    pad = jnp.zeros(col_xy.shape[:-1] + (1,), col_xy.dtype)
    cmap = jax.lax.optimization_barrier(build_cell_map_batched(
        g2, jnp.concatenate([col_xy, pad], axis=-1), col_valid,
        with_pair=False))
    padq = jnp.zeros(q_xy.shape[:-1] + (1,), q_xy.dtype)
    q3 = jnp.concatenate([q_xy, padq], axis=-1)
    bases = map_bases(g2, q_xy.shape[0])
    return jax.lax.optimization_barrier(jax.vmap(
        lambda qc, qv, base: find_neighbors_via_map(
            g2, qc, qv, cmap, p, OFFSETS_2D, base)
    )(q3, q_valid, bases))


def _gather_columns(colf, valid, nbr):
    """(B, P, Z, C), (B, Q, 9) → (B, Q, 9, Z, C); sentinel rows → zeros."""
    b, p, z, c = colf.shape
    masked = jnp.where(valid[..., None, None], colf, 0.0)
    padded = jnp.concatenate(
        [masked, jnp.zeros((b, 1, z, c), colf.dtype)], axis=1
    ).reshape(b * (p + 1), z, c)
    base = (jnp.arange(b, dtype=jnp.int32) * (p + 1))[:, None, None]
    idx = (nbr + base).reshape(-1)
    q, k = nbr.shape[1], nbr.shape[2]
    return jnp.take(padded, idx, axis=0).reshape(b, q, k, z, c)


def _gather_one_column_tap(colf_padded, nbr, tap, b, p):
    """One tap's neighbor columns: (B, Q, Z, C). colf_padded is the
    (B·(P+1), Z, C) zero-row-padded table from _padded_column_table."""
    base = (jnp.arange(b, dtype=jnp.int32) * (p + 1))[:, None]
    idx = (nbr[:, :, tap] + base).reshape(-1)
    q = nbr.shape[1]
    return jnp.take(colf_padded, idx, axis=0).reshape(
        b, q, colf_padded.shape[1], colf_padded.shape[2])


def _padded_column_table(colf, valid):
    b, p, z, c = colf.shape
    masked = jnp.where(valid[..., None, None], colf, 0.0)
    return jnp.concatenate(
        [masked, jnp.zeros((b, 1, z, c), colf.dtype)], axis=1
    ).reshape(b * (p + 1), z, c)


@jax.checkpoint
def column_subm_conv(colf, col_valid, zmask, nbr, kernel27):
    """3×3×3 submanifold conv over dense-z columns; output masked to zmask.

    colf (B, P, Z, Cin); nbr (B, P, 9); kernel27 (27, Cin, Cout) in
    kernel_offsets(3, 3, 3) order. Rematerialized (jax.checkpoint): the
    backward re-runs the cheap gathers instead of saving 9 (B, P, Z, C)
    tap tensors per layer (~1.4 GB/layer at the 60k-voxel KITTI stage-1 —
    the stacked one-GEMM form OOMed at 26 GB).
    """
    b, p, z, cin = colf.shape
    cout = kernel27.shape[-1]
    w = kernel27.reshape(9, 3, cin, cout)
    padded = _padded_column_table(colf, col_valid)
    out = jnp.zeros((b, p, z, cout), jnp.float32)
    for t in range(9):
        g = _gather_one_column_tap(padded, nbr, t, b, p)  # (B, P, Z, Cin)
        gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (0, 0)))
        for dz in range(3):
            out = out + jax.lax.dot_general(
                gp[:, :, dz:dz + z, :], w[t, dz],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return jnp.where(zmask[..., None], out.astype(colf.dtype), 0.0)


def downsample_columns(grid: SparseGrid, col_xy, col_valid, out_cap: int):
    """Unique BEV parent columns (2D twin of sparse_ops.downsample_coords)."""
    g2x, g2y = -(-grid.nx // 2), -(-grid.ny // 2)

    def one(xy, vl):
        par = xy // 2
        lin = jnp.where(vl, par[:, 1] * g2x + par[:, 0], g2x * g2y)
        order = jnp.argsort(lin)
        slin = lin[order]
        ok = slin < g2x * g2y
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), slin[1:] != slin[:-1]]) & ok
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        seg = jnp.where(ok & (seg < out_cap), seg, out_cap)
        n_out = jnp.minimum(jnp.sum(is_start.astype(jnp.int32)), out_cap)
        oxy = (
            jnp.zeros((out_cap, 2), jnp.int32)
            .at[jnp.where(is_start, seg, out_cap)]
            .set(par[order], mode="drop")
        )
        return oxy, jnp.arange(out_cap) < n_out

    return jax.vmap(one)(col_xy, col_valid)


def column_down_conv(colf, col_valid, zmask, col_xy, grid: SparseGrid,
                     out_cap: int, kernel27):
    """Strided-2 (xyz) 3×3×3 conv over columns.

    Output column set = unique BEV parents of active columns; output z
    extent = ceil(Z/2); out voxel (q, zo) is active iff any child voxel of
    the 2×2×2 block is active (downsample_coords' voxel-level contract).
    Returns (out_feats, out_xy, out_valid, out_zmask).
    """
    b, p, z, cin = colf.shape
    cout = kernel27.shape[-1]
    zo = -(-z // 2)
    out_xy, out_valid = downsample_columns(grid, col_xy, col_valid, out_cap)

    nbr = _col_neighbors(grid, out_xy * 2, out_valid, col_xy, col_valid)
    q = out_xy.shape[1]
    w = kernel27.reshape(9, 3, cin, cout)
    padded = _padded_column_table(colf, col_valid)

    @jax.checkpoint
    def conv(padded, nbr, w):
        out = jnp.zeros((b, q, zo, cout), jnp.float32)
        for t in range(9):
            g = _gather_one_column_tap(padded, nbr, t, b, p)  # (B, Q, Z, Cin)
            # out zo reads input z = 2·zo + (dz − 1); pad front, stride-2
            gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1 + z % 2), (0, 0)))
            for dz in range(3):
                out = out + jax.lax.dot_general(
                    gp[:, :, dz:dz + 2 * zo:2, :], w[t, dz],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        return out

    out = conv(padded, nbr, w).astype(colf.dtype)

    # child columns sit at taps (ox, oy) ∈ {0, 1}² → tap2d 3(ox+1)+(oy+1)
    child_taps = jnp.asarray([4, 5, 7, 8], jnp.int32)
    zm_g = _gather_columns(
        zmask[..., None].astype(jnp.float32), col_valid, nbr)[..., 0] > 0.5
    zm_children = jnp.take(zm_g, child_taps, axis=2)     # (B, Q, 4, Z)
    zm_pad = jnp.pad(zm_children, ((0, 0), (0, 0), (0, 0), (0, z % 2)))
    out_zmask = jnp.any(
        zm_pad.reshape(b, q, 4, zo, 2), axis=(2, 4)) & out_valid[..., None]
    out = jnp.where(out_zmask[..., None], out, 0.0)
    return out, out_xy, out_valid, out_zmask


def column_zdown_conv(colf, col_valid, zmask, kernel3):
    """conv_out: kernel (1,1,3) stride (1,1,2) — per-column dense, no
    gathers. kernel3 (3, Cin, Cout). Active out (q, zo) iff either child
    z-slot active."""
    b, p, z, cin = colf.shape
    cout = kernel3.shape[-1]
    zo = -(-z // 2)
    x = jnp.where(zmask[..., None] & col_valid[..., None, None], colf, 0.0)
    gp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + z % 2), (0, 0)))
    shifted = jnp.stack(
        [gp[:, :, dz:dz + 2 * zo:2, :] for dz in range(3)], axis=3
    )  # (B, P, Zo, 3, Cin)
    out = jax.lax.dot_general(
        shifted.reshape(b, p, zo, 3 * cin), kernel3.reshape(3 * cin, cout),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(colf.dtype)
    zm_pad = jnp.pad(zmask, ((0, 0), (0, 0), (0, z % 2)))
    out_zmask = jnp.any(zm_pad.reshape(b, p, zo, 2), axis=-1)
    out_zmask = out_zmask & col_valid[..., None]
    return jnp.where(out_zmask[..., None], out, 0.0), out_zmask


class ColumnSubMConv3d(nn.Module):
    """Param twin of sparse_backbone.SubMConv3d (kernel (27, Cin, Cout))."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, colf, col_valid, zmask, nbr):
        assert tuple(self.kernel_size) == (3, 3, 3)
        cin = colf.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (27, cin, self.out_channels), jnp.float32,
        )
        return column_subm_conv(colf.astype(self.dtype), col_valid, zmask,
                                nbr, w.astype(self.dtype))


class ColumnConvBlock(nn.Module):
    """Param twin of sparse_backbone.SparseConvBlock (SubMConv3d_0 +
    SparseBatchNorm_0) executing column-sparse."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, colf, col_valid, zmask, nbr, train: bool):
        out = ColumnSubMConv3d(self.out_channels, dtype=self.dtype,
                               name="SubMConv3d_0")(colf, col_valid, zmask,
                                                    nbr)
        b, p, z, c = out.shape
        x = nn.relu(SparseBatchNorm(dtype=self.dtype,
                                    name="SparseBatchNorm_0")(
            out.reshape(b, p * z, c), zmask.reshape(b, p * z), train))
        return jnp.where(zmask[..., None], x.reshape(b, p, z, c), 0.0)


class ColumnDownConv(nn.Module):
    """Param twin of sparse_backbone.SparseConv3dDown (param "kernel")."""

    out_channels: int
    out_cap: int
    z_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, colf, col_valid, zmask, col_xy, grid: SparseGrid):
        cin = colf.shape[-1]
        k = 3 if self.z_only else 27
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, cin, self.out_channels), jnp.float32,
        )
        wk = w.astype(self.dtype)
        if self.z_only:
            out, ozm = column_zdown_conv(colf.astype(self.dtype), col_valid,
                                         zmask, wk)
            return out, col_xy, col_valid, ozm, SparseGrid(
                grid.nx, grid.ny, -(-grid.nz // 2))
        out, oxy, ovalid, ozm = column_down_conv(
            colf.astype(self.dtype), col_valid, zmask, col_xy, grid,
            self.out_cap, wk)
        return out, oxy, ovalid, ozm, SparseGrid(
            -(-grid.nx // 2), -(-grid.ny // 2), -(-grid.nz // 2))


class ColumnVoxelBackBone8x(nn.Module):
    """VoxelBackBone8x executed column-sparse; the flax param tree matches
    sparse_backbone.VoxelBackBone8x module-for-module (conv_input/conv1/
    down2/.../conv_out + *_bn) so checkpoints and converter mappings interop.
    Returns a SparseTensor of the final active voxels (capacity
    voxel_cap // 8 — same contract as the gather-GEMM path)."""

    grid: SparseGrid
    voxel_cap: int
    channels: Sequence[int] = (16, 16, 32, 64, 64)
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, coords, valid, train: bool) -> SparseTensor:
        ch = tuple(self.channels)
        cap = self.voxel_cap
        colf, col_xy, col_valid, zmask = columns_from_voxels(
            self.grid, features.astype(self.dtype), coords, valid, cap)
        grid = self.grid

        def bn_relu(colf, zmask, name):
            b, p, z, c = colf.shape
            x = nn.relu(SparseBatchNorm(dtype=self.dtype, name=name)(
                colf.reshape(b, p * z, c), zmask.reshape(b, p * z), train))
            return jnp.where(zmask[..., None], x.reshape(b, p, z, c), 0.0)

        nbr = _col_neighbors(grid, col_xy, col_valid, col_xy, col_valid)
        colf = ColumnConvBlock(ch[0], dtype=self.dtype, name="conv_input")(
            colf, col_valid, zmask, nbr, train)
        colf = ColumnConvBlock(ch[1], dtype=self.dtype, name="conv1")(
            colf, col_valid, zmask, nbr, train)

        def down_stage(colf, col_xy, col_valid, zmask, grid, c, cap_out,
                       z_only, name):
            colf, col_xy, col_valid, zmask, grid = ColumnDownConv(
                c, out_cap=cap_out, z_only=z_only, dtype=self.dtype,
                name=name)(colf, col_valid, zmask, col_xy, grid)
            colf = bn_relu(colf, zmask, f"{name}_bn")
            return colf, col_xy, col_valid, zmask, grid

        for i, (c_sub, nm) in enumerate(
                [(ch[2], "2"), (ch[3], "3"), (ch[4], "4")]):
            colf, col_xy, col_valid, zmask, grid = down_stage(
                colf, col_xy, col_valid, zmask, grid, c_sub,
                max(cap // 2 ** (i + 1), 16), False, f"down{i + 2}")
            nbr = _col_neighbors(grid, col_xy, col_valid, col_xy, col_valid)
            colf = ColumnConvBlock(c_sub, dtype=self.dtype,
                                   name=f"conv{i + 2}a")(
                colf, col_valid, zmask, nbr, train)
            colf = ColumnConvBlock(c_sub, dtype=self.dtype,
                                   name=f"conv{i + 2}b")(
                colf, col_valid, zmask, nbr, train)

        colf, col_xy, col_valid, zmask, grid = down_stage(
            colf, col_xy, col_valid, zmask, grid, self.out_channels,
            max(cap // 8, 16), True, "conv_out")

        # flatten the dense columns back into the (B, V8, C) voxel-list
        # contract for height_compression / downstream heads
        b, p, z, c = colf.shape
        vcap = max(self.voxel_cap // 8, 16)
        feats_flat = colf.reshape(b, p * z, c)
        iz = jnp.broadcast_to(jnp.arange(z, dtype=jnp.int32)[None, None, :],
                              (b, p, z))
        coords3 = jnp.concatenate([
            jnp.broadcast_to(col_xy[:, :, None, :], (b, p, z, 2)),
            iz[..., None],
        ], axis=-1).reshape(b, p * z, 3)
        valid_flat = (zmask & col_valid[..., None]).reshape(b, p * z)

        def compact(f, cd, vl):
            order = jnp.argsort(~vl, stable=True)  # valid first
            keep = order[:vcap]
            return (jnp.take(f, keep, axis=0), jnp.take(cd, keep, axis=0),
                    jnp.take(vl, keep))

        f8, c8, v8 = jax.vmap(compact)(feats_flat, coords3, valid_flat)
        f8 = jnp.where(v8[..., None], f8, 0.0)
        c8 = jnp.where(v8[..., None], c8, 0)
        return SparseTensor(f8, c8, v8, grid)


def select_backbone8x(bb3d_cfg=None):
    """Formulation dispatch for VoxelBackBone8x call sites.

    `BACKBONE_3D.FORMULATION: column|gather` in the config, else the
    DFU3D_SPARSE_FORMULATION env var, else gather (flip pending the on-chip
    A/B — tools/dev/ab_column.py). The two classes share one param tree, so
    switching is checkpoint-compatible.
    """
    import os

    from .sparse_backbone import VoxelBackBone8x

    form = None
    if bb3d_cfg is not None:
        form = bb3d_cfg.get("FORMULATION")
    if form is None:
        form = os.environ.get("DFU3D_SPARSE_FORMULATION", "gather")
    if form not in ("column", "gather"):
        raise ValueError(
            f"FORMULATION must be 'column' or 'gather', got {form!r}")
    return ColumnVoxelBackBone8x if form == "column" else VoxelBackBone8x
