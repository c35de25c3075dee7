"""Sparse 3D convolution backbone — TPU-native VoxelBackBone8x.

Replaces spconv's submanifold/strided sparse convolutions (reference:
pcdet/models/backbones_3d/spconv_backbone.py:70-180 VoxelBackBone8x) with a
gather-GEMM formulation: neighbor indices come from sort + searchsorted over
linearized coords (core/voxel/sparse_ops.py), and each kernel offset
contributes a (B·V, Cin) gather followed by a (Cin, Cout) matmul on the MXU —
27 skinny matmuls accumulated, no hash tables, fully static shapes. All
tensors are batched (B, V, …); per-element neighbor search is vmapped pure
functions while the flax modules (params/BN) see the whole batch, so BN stats
are global (and cross-device-synced under pjit).

Deliberate deviations from spconv (documented; shapes configurable):
* strided conv output set = unique parent cells of active inputs (coords // 2),
  not spconv's full receptive-field output set — a tight common approximation
  (torchsparse-style) that keeps per-stage capacity caps meaningful.
* spatial dims halve as ceil(n/2) at every stage (spconv's per-layer padding
  arithmetic differs by ±1 on some dims).

Stage layout matches VoxelBackBone8x: 16 → 32 → 64 → 64 channels at strides
1/2/4/8, plus a z-compressing conv_out to 128 channels; `height_compression`
then reshapes (nz_out × C) into BEV channels (reference HeightCompression,
backbones_2d/map_to_bev/height_compression.py:4-20).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.voxel.sparse_ops import (
    COLUMN_MAP_MAX_NZ,
    DENSE_MAP_MAX_CELLS,
    ColumnMap,
    SparseGrid,
    _is_x_packable,
    build_cell_map_batched,
    build_column_map_batched,
    build_lookup,
    column_map_bases,
    downsample_coords,
    find_neighbors,
    find_neighbors_via_column_map,
    find_neighbors_via_map,
    find_neighbors_via_map_packed,
    kernel_offsets,
    map_bases,
    transpose_down_neighbors,
    transpose_down_neighbors_column,
    transpose_down_neighbors_packed,
)


class SparseTensor(NamedTuple):
    features: jnp.ndarray  # (B, V, C)
    coords: jnp.ndarray    # (B, V, 3) int32 (ix, iy, iz)
    valid: jnp.ndarray     # (B, V)
    grid: SparseGrid       # static


class SparseBatchNorm(nn.Module):
    """BN over valid voxels of the whole batch (spconv backbone: eps 1e-3,
    momentum 0.01 ⇒ ema keep 0.99)."""

    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if train:
            m = mask.astype(jnp.float32)[..., None]
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x.astype(jnp.float32) * m, axis=(0, 1)) / count
            var = jnp.sum(
                jnp.square(x.astype(jnp.float32) - mean) * m, axis=(0, 1)
            ) / count
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def _batched_cell_map(grid: SparseGrid, coords, valid):
    """(B, num_cells+3) dense cell→slot maps (None for oversized grids).

    Wrapped in an optimization barrier: tables are saved as VJP residuals,
    and without the barrier XLA rematerializes the scatter for every
    backward consumer (measured round 2: the same table build appearing 3×
    per step)."""
    if grid.num_cells > DENSE_MAP_MAX_CELLS:
        return None
    return jax.lax.optimization_barrier(
        build_cell_map_batched(grid, coords, valid)
    )


def _stage_map(grid: SparseGrid, coords, valid):
    """Per-stage coordinate map: COLUMNAR when nz fits the 64-bit occupancy
    mask (the fast path — ~40× smaller tables than the dense 3D maps, see
    sparse_ops.ColumnMap), else the dense map. ONLY valid for coordinate
    sets in column-major slot order (dynamic_voxelize / downsample_coords
    outputs) — callers with re-ordered sets (FocalSparseConv dilation) must
    keep `_batched_cell_map`."""
    if grid.nz <= COLUMN_MAP_MAX_NZ:
        return jax.lax.optimization_barrier(
            build_column_map_batched(grid, coords, valid)
        )
    return _batched_cell_map(grid, coords, valid)


def _batched_grouped_neighbors(grid: SparseGrid, query_coords, query_valid,
                               nvox: int, cmap):
    """Grouped (packed-row) 3×3×3 neighbor tables from a columnar map."""
    from ..core.voxel.sparse_ops import grouped_column_neighbors

    offsets = kernel_offsets(3, 3, 3)
    bases = column_map_bases(grid, query_coords.shape[0])
    idx, p = jax.lax.optimization_barrier(jax.vmap(
        lambda qc, qv, base: grouped_column_neighbors(
            grid, qc, qv, cmap, nvox, offsets, base)
    )(query_coords, query_valid, bases))
    return GroupedNbr(idx, p)


def _batched_neighbors(grid: SparseGrid, query_coords, query_valid, coords,
                       valid, offsets, cmap=None, grouped=False):
    """(B, Q, K) neighbor indices into each element's (V,) voxel list —
    or a GroupedNbr (packed-row form) when `grouped` and the map is
    columnar and the kernel is 3×3×3.

    Dense cell→slot map (one scatter + one gather) when the grid fits the
    DENSE_MAP_MAX_CELLS budget — ~100× faster than the searchsorted path on
    TPU (see core/voxel/sparse_ops.build_cell_map) — else sort+searchsorted.
    Pass a precomputed `cmap` (from `_batched_cell_map`) to share one map
    across every conv touching the same coordinate set (the spconv
    indice_key reuse, one map build per stage instead of three).
    """
    nvox = coords.shape[1]

    if isinstance(cmap, ColumnMap):
        if grouped:
            off = np.asarray(offsets)
            assert off.shape[0] == 27 and np.all(np.abs(off) <= 1)
            return _batched_grouped_neighbors(
                grid, query_coords, query_valid, nvox, cmap)
        # columnar lookup: one BEV row gather per (ox, oy) tap group + VPU
        # popcount ranking for the z taps (sparse_ops.ColumnMap)
        bases = column_map_bases(grid, query_coords.shape[0])
        return jax.lax.optimization_barrier(jax.vmap(
            lambda qc, qv, base: find_neighbors_via_column_map(
                grid, qc, qv, cmap, nvox, offsets, base)
        )(query_coords, query_valid, bases))

    if grid.num_cells <= DENSE_MAP_MAX_CELLS:
        if cmap is None:
            cmap = _batched_cell_map(grid, coords, valid)
        # x-packed window lookup (3 consecutive cells per fetch) when the
        # offset layout allows — random gathers cost ~constant time per ROW,
        # so 9 window rows beat 27 element rows ~3× on the big stage-1 maps.
        # Maps are FLAT (B·stride,) — vmap broadcasts the map and maps the
        # per-element base offset (no (B, stride) relayout, sparse_ops
        # CellMap docstring)
        fn = (find_neighbors_via_map_packed if _is_x_packable(offsets)
              else find_neighbors_via_map)
        bases = map_bases(grid, query_coords.shape[0])
        return jax.lax.optimization_barrier(jax.vmap(
            lambda qc, qv, base: fn(grid, qc, qv, cmap, nvox, offsets, base)
        )(query_coords, query_valid, bases))

    def one(qc, qv, c, v):
        sorted_lin, order = build_lookup(grid, c, v)
        return find_neighbors(grid, qc, qv, sorted_lin, order, offsets)

    return jax.lax.optimization_barrier(
        jax.vmap(one)(query_coords, query_valid, coords, valid)
    )


# Gather-GEMM formulation switch. "fused" issues ONE (B·Q·K)-row gather and
# ONE dot_general contracting (K, Cin); "loop" issues K row-gathers each
# feeding a skinny (Cin, Cout) matmul accumulated elementwise. A/B on chip
# (round 3, SECOND 60k voxels B=2, same session, 2× repeated): loop 308 ms,
# fused 361 ms — XLA fuses each per-k gather into its GEMM and keeps the
# accumulator live, while the fused form must materialize the (B, Q, K, Cin)
# gather output through HBM before the contraction. Loop stays the default;
# the fused path is kept (equivalence-tested, test_sparse_vjp.py
# TestGatherGemmForms) as the documented losing arm so it isn't re-explored.
GATHER_GEMM_FORM = "loop"  # "loop" | "fused"


def _padded_rows(feats, valid):
    """Mask invalid rows, append one zero row per element, flatten to
    (B·(V+1), C) so batched sentinel indices hit the zero row."""
    b, v, c = feats.shape
    feats_masked = jnp.where(valid[..., None], feats, 0.0)
    return jnp.concatenate(
        [feats_masked, jnp.zeros((b, 1, c), feats.dtype)], axis=1
    ).reshape(b * (v + 1), c)


def _gather_gemm(feats, valid, neighbor_idx, kernel):
    """Σ_k gather(feats, nbr[..., k]) @ W[k]; sentinel index V → zero row.

    Args:
        feats: (B, V, Cin); valid: (B, V); neighbor_idx: (B, Q, K) int32 with
        sentinel V; kernel: (K, Cin, Cout).
    Returns:
        (B, Q, Cout)
    """
    b, v, cin = feats.shape
    q, k = neighbor_idx.shape[1], neighbor_idx.shape[2]
    padded = _padded_rows(feats, valid)
    if GATHER_GEMM_FORM == "fused":
        base = (jnp.arange(b, dtype=jnp.int32) * (v + 1))[:, None, None]
        idx = (neighbor_idx + base).reshape(-1)  # (B·Q·K,)
        g = jnp.take(padded, idx, axis=0).reshape(b, q, k, cin)
        return jax.lax.dot_general(
            g, kernel, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(feats.dtype)
    base = (jnp.arange(b, dtype=jnp.int32) * (v + 1))[:, None]
    out = None
    for j in range(k):
        idx_j = (neighbor_idx[:, :, j] + base).reshape(-1)  # (B*Q,)
        g = jnp.take(padded, idx_j, axis=0).reshape(b, q, cin)
        contrib = jnp.einsum("bqc,cd->bqd", g, kernel[j])
        out = contrib if out is None else out + contrib
    return out


@jax.custom_vjp
def subm_gather_gemm(feats, valid, nbr, kernel):
    """Submanifold gather-GEMM with a gather-only backward.

    XLA's automatic transpose of the forward gathers is a scatter-add — ~6×
    slower than a gather on TPU (measured round 2: 65 ms vs 11 ms for 3.24M
    rows). Because the kernel-offset list is centrosymmetric
    (offsets[K-1-k] = -offsets[k]), the transpose of the neighbor relation is
    the SAME table with the offset axis reversed:
        nbr_k(q) = p  ⟺  nbr_{K-1-k}(p) = q,
    so d feats can be computed as another gather-GEMM over nbr with the
    kernel reversed on K and transposed — no scatter anywhere. (This mirrors
    how spconv reuses the rulebook for its backward, reference
    pcdet/ops/.../spconv; here it is the static-shape XLA formulation.)
    """
    return _gather_gemm(feats, valid, nbr, kernel)


def _subm_fwd(feats, valid, nbr, kernel):
    return _gather_gemm(feats, valid, nbr, kernel), (feats, valid, nbr, kernel)


def _shared_gather_bwd(feats, valid, nbr, kernel, g, flip: bool):
    """One gather pass serving BOTH dX and dW.

    With t_j(p) denoting the transpose relation (nbr with the offset axis
    reversed for SubM — centrosymmetry — or the explicit tnbr table for
    strided convs):
        dX[p]  = Σ_j g[t_j(p)] · Wᵀ[K-1-j  (SubM) / j (strided)]
        dW[k]  = Σ_q feats[nbr_k(q)] gᵀ[q] = Σ_p feats[p] gᵀ[t_{K-1-k}(p)]
    so the 27 gathered g-row tensors are shared — eliminating the second
    27-row-gather pass (`_gather_outer`), which at ~3.7 ns/row dominates the
    backward on TPU (measured round 2: ~12 ms per 60k-voxel layer).
    """
    b, v, cin = feats.shape
    k = nbr.shape[2]
    d = g.shape[-1]
    qdim = g.shape[1]
    g_padded = jnp.concatenate(
        [g, jnp.zeros((b, 1, d), g.dtype)], axis=1
    ).reshape(b * (qdim + 1), d)
    feats_masked = jnp.where(valid[..., None], feats, 0.0)
    if GATHER_GEMM_FORM == "fused":
        base = (jnp.arange(b, dtype=jnp.int32) * (qdim + 1))[:, None, None]
        idx = (nbr + base).reshape(-1)
        gt = jnp.take(g_padded, idx, axis=0).reshape(b, v, k, d)
        # per-j weight: kernel[K-1-j]ᵀ (flip) / kernel[j]ᵀ — fold the flip
        # into the weight's K axis so both dX and dW are single contractions
        kern_j = (kernel[::-1] if flip else kernel).transpose(0, 2, 1)
        dx = jax.lax.dot_general(  # contract (k, d) → (B, V, Cin)
            gt, kern_j, dimension_numbers=(((2, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dW[wk] = Σ_{b,v} feats[b,v,:] ⊗ gt[b,v,j,:]; wk = flip(j)
        dw = jnp.einsum("bvc,bvkd->kcd", feats_masked, gt,
                        preferred_element_type=jnp.float32)
        if flip:
            dw = dw[::-1]
        dx = jnp.where(valid[..., None], dx, 0.0).astype(feats.dtype)
        return dx, dw.astype(kernel.dtype)
    base = (jnp.arange(b, dtype=jnp.int32) * (qdim + 1))[:, None]
    dx = None
    dws = [None] * k
    for j in range(k):
        idx_j = (nbr[:, :, j] + base).reshape(-1)
        gt = jnp.take(g_padded, idx_j, axis=0).reshape(b, v, d)
        wk = k - 1 - j if flip else j
        contrib = jnp.einsum("bvd,cd->bvc", gt, kernel[wk])
        dx = contrib if dx is None else dx + contrib
        # dW[K-1-j] (flip) / dW[j-as-transposed] — fp32 accumulation
        dws[wk] = jnp.einsum("bvc,bvd->cd", feats_masked, gt,
                             preferred_element_type=jnp.float32)
    dx = jnp.where(valid[..., None], dx, 0.0).astype(feats.dtype)
    return dx, jnp.stack(dws).astype(kernel.dtype)


def _subm_bwd(res, g):
    feats, valid, nbr, kernel = res
    # (invalid rows of g are already zero — the layer masks its output — and
    # sentinel rows gather the zero pad row)
    dx, dw = _shared_gather_bwd(feats, valid, nbr, kernel, g, flip=True)
    return dx, None, None, dw


subm_gather_gemm.defvjp(_subm_fwd, _subm_bwd)


# ---------------------------------------------------------------------------
# Packed-row (grouped) submanifold gather-GEMM
#
# Column-contiguous voxel slots (z fastest — the round-5 voxelizer order)
# put a voxel's z∓1 neighbors at ADJACENT table rows, so each BEV tap
# group's three z taps arrive in ONE 3C-wide packed-row gather: 9 gathered
# rows per query instead of 27. Random gathers cost ~constant time per row,
# so this cuts the sparse conv's dominant feature-fetch cost ~3×. Row
# arithmetic (sparse_ops.grouped_column_neighbors): row(z−1) = idx−p₀ →
# packed block 0 when present; row(z) = idx → block 1; row(z+1) = idx+p₁ →
# block 1+p₁. GEMM count and FLOPs are unchanged (27 skinny matmuls); only
# the fetch rows shrink. Backward reuses the SAME (idx, p) tables by
# centrosymmetry with the kernel reversed+transposed, and dW shares the
# gathered cotangent rows (the _shared_gather_bwd trick, grouped).
# ---------------------------------------------------------------------------


def _padded_rows3(feats, valid):
    """(B, V, C) → (B·(V+1), 3C) packed table: per element, row s holds
    [T[s−1], T[s], T[s+1]] with T the zero-padded feature table (T[−1] =
    T[V] = 0), s ∈ [0, V] (s = V is the sentinel row [T[V−1], 0, 0] — its
    garbage block 0 is always masked by p bits)."""
    b, v, c = feats.shape
    fm = jnp.where(valid[..., None], feats, 0.0)
    tp = jnp.concatenate(
        [jnp.zeros((b, 1, c), feats.dtype), fm,
         jnp.zeros((b, 2, c), feats.dtype)], axis=1)  # (B, V+3, C)
    packed = jnp.concatenate(
        [tp[:, :-2], tp[:, 1:-1], tp[:, 2:]], axis=-1)  # (B, V+1, 3C)
    return packed.reshape(b * (v + 1), 3 * c)


def _grouped_gather_gemm(feats, valid, idx, p, kernel27):
    """Σ_k masked-block(packed_gather) @ W[k]; idx (B, Q, 9), p (B, Q, 9, 3),
    kernel27 (27, Cin, Cout) in kernel_offsets(3,3,3) order."""
    b, v, c = feats.shape
    q = idx.shape[1]
    packed = _padded_rows3(feats, valid)
    base = (jnp.arange(b, dtype=jnp.int32) * (v + 1))[:, None]
    out = None
    for g in range(9):
        rows = jnp.take(
            packed, (idx[:, :, g] + base).reshape(-1), axis=0
        ).reshape(b, q, 3, c)
        pm = p[:, :, g, 0:1]
        pc = p[:, :, g, 1:2]
        pp = p[:, :, g, 2:3]
        f_m = jnp.where(pm, rows[:, :, 0], 0)
        f_c = jnp.where(pc, rows[:, :, 1], 0)
        f_p = jnp.where(pp, jnp.where(pc, rows[:, :, 2], rows[:, :, 1]), 0)
        # one 3C-contraction GEMM per group (9 MXU calls instead of 27)
        fg = jnp.concatenate([f_m, f_c, f_p], axis=-1)
        wg = kernel27[g * 3:g * 3 + 3].reshape(3 * c, -1)
        contrib = jnp.einsum("bqc,cd->bqd", fg, wg)
        out = contrib if out is None else out + contrib
    return out


@jax.custom_vjp
def subm_gather_gemm_grouped(feats, valid, idx, p, kernel):
    """Packed-row submanifold gather-GEMM (grouped 9-row fetch form)."""
    return _grouped_gather_gemm(feats, valid, idx, p, kernel)


def _gg_fwd(feats, valid, idx, p, kernel):
    return (_grouped_gather_gemm(feats, valid, idx, p, kernel),
            (feats, valid, idx, p, kernel))


def _gg_bwd(res, g):
    feats, valid, idx, p, kernel = res
    b, v, c = feats.shape
    d = g.shape[-1]
    # centrosymmetry: for subm the query set == the voxel set, so the SAME
    # (idx, p) tables serve the transpose pass; tap k applies Wᵀ[26−k]
    kernel_t = kernel[::-1].transpose(0, 2, 1)  # (27, D, Cin)
    g_packed = _padded_rows3(g, valid)
    base = (jnp.arange(b, dtype=jnp.int32) * (v + 1))[:, None]
    feats_masked = jnp.where(valid[..., None], feats, 0.0)
    dx = None
    dws = [None] * 27
    for gr in range(9):
        rows = jnp.take(
            g_packed, (idx[:, :, gr] + base).reshape(-1), axis=0
        ).reshape(b, v, 3, d)
        pm = p[:, :, gr, 0:1]
        pc = p[:, :, gr, 1:2]
        pp = p[:, :, gr, 2:3]
        taps = (
            jnp.where(pm, rows[:, :, 0], 0),
            jnp.where(pc, rows[:, :, 1], 0),
            jnp.where(pp, jnp.where(pc, rows[:, :, 2], rows[:, :, 1]), 0),
        )
        for dz in range(3):
            j = gr * 3 + dz
            gt = taps[dz]
            contrib = jnp.einsum("bvd,dc->bvc", gt, kernel_t[j])
            dx = contrib if dx is None else dx + contrib
            # dW[26−j] = Σ_p feats[p] ⊗ g[t_j(p)] (fp32 accumulation)
            dws[26 - j] = jnp.einsum("bvc,bvd->cd", feats_masked, gt,
                                     preferred_element_type=jnp.float32)
    dx = jnp.where(valid[..., None], dx, 0.0).astype(feats.dtype)
    return dx, None, None, None, jnp.stack(dws).astype(kernel.dtype)


subm_gather_gemm_grouped.defvjp(_gg_fwd, _gg_bwd)


class GroupedNbr(NamedTuple):
    """Grouped neighbor tables for the packed-row subm path."""

    idx: jnp.ndarray  # (B, Q, 9) int32, sentinel V
    p: jnp.ndarray    # (B, Q, 9, 3) bool


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def down_gather_gemm(feats, valid, nbr, tnbr, kernel):
    """Strided-conv gather-GEMM with a gather-only backward via a transpose
    neighbor table.

    `nbr` (B, Q, K) maps output q → input slots; `tnbr` (B, V, K) maps input
    p → the output q for which nbr_k(q) = p (sentinel Q where none: parity
    mismatch or inactive output). dX then is a gather over tnbr with Wᵀ —
    same trick as subm_gather_gemm but with an explicitly built transpose
    table because input and output coordinate sets differ.
    """
    return _gather_gemm(feats, valid, nbr, kernel)


def _down_fwd(feats, valid, nbr, tnbr, kernel):
    return _gather_gemm(feats, valid, nbr, kernel), (feats, valid, nbr, tnbr,
                                                     kernel)


def _down_bwd(res, g):
    feats, valid, nbr, tnbr, kernel = res
    # dW[k] = Σ_q x[nbr_k(q)] gᵀ[q] = Σ_p x[p] gᵀ[tnbr_k(p)] — shares the
    # gathered g rows with dX (same k-index as tnbr: no flip)
    dx, dw = _shared_gather_bwd(feats, valid, tnbr, kernel, g, flip=False)
    return dx, None, None, None, dw


down_gather_gemm.defvjp(_down_fwd, _down_bwd)


@jax.custom_vjp
def down_gather_gemm_grouped(feats, valid, idx, p, t_idx, t_pz, t_sel, t_ok,
                             kernel):
    """Strided-conv gather-GEMM, fully packed: the FORWARD fetches 9 packed
    rows/query (vs 27), and the BACKWARD fetches 4 packed g-rows per input
    voxel — the 2×2 BEV parent window (sparse_ops.grouped_transpose_tables)
    — routing each of the 27 taps to one of the 8 candidate parents with
    VPU selects (vs 27 element gathers per voxel)."""
    return _grouped_gather_gemm(feats, valid, idx, p, kernel)


def _down_g_fwd(feats, valid, idx, p, t_idx, t_pz, t_sel, t_ok, kernel):
    return (_grouped_gather_gemm(feats, valid, idx, p, kernel),
            (feats, valid, t_idx, t_pz, t_sel, t_ok, kernel))


def _down_g_bwd(res, g):
    feats, valid, t_idx, t_pz, t_sel, t_ok, kernel = res
    b, v, c = feats.shape
    q, d = g.shape[1], g.shape[-1]
    # conv output rows at invalid slots are already zero (the layer masks)
    g_packed = _padded_rows3(g, jnp.ones(g.shape[:2], bool))
    base = (jnp.arange(b, dtype=jnp.int32) * (q + 1))[:, None]
    feats_masked = jnp.where(valid[..., None], feats, 0.0)
    cand = []
    for j in range(4):
        rows = jnp.take(
            g_packed, (t_idx[:, :, j] + base).reshape(-1), axis=0
        ).reshape(b, v, 3, d)
        p0 = t_pz[:, :, j, 0:1]
        p1 = t_pz[:, :, j, 1:2]
        cand.append(jnp.where(p0, rows[:, :, 1], 0))
        cand.append(jnp.where(
            p1, jnp.where(p0, rows[:, :, 2], rows[:, :, 1]), 0))
    dx = None
    dws = [None] * 27
    for k in range(27):
        selk = t_sel[:, :, k][..., None]
        okk = t_ok[:, :, k][..., None]
        gt = jnp.zeros_like(cand[0])
        for cidx in range(8):
            gt = jnp.where(okk & (selk == cidx), cand[cidx], gt)
        contrib = jnp.einsum("bvd,cd->bvc", gt, kernel[k])
        dx = contrib if dx is None else dx + contrib
        dws[k] = jnp.einsum("bvc,bvd->cd", feats_masked, gt,
                            preferred_element_type=jnp.float32)
    dx = jnp.where(valid[..., None], dx, 0.0).astype(feats.dtype)
    return (dx, None, None, None, None, None, None, None,
            jnp.stack(dws).astype(kernel.dtype))


down_gather_gemm_grouped.defvjp(_down_g_fwd, _down_g_bwd)


class SubMConv3d(nn.Module):
    """Submanifold sparse conv: output set == input set.

    Accepts a precomputed neighbor table (`nbr`) so stacked SubM layers on the
    same coordinate set share one sort+searchsorted pass (the spconv
    `indice_key` reuse, spconv_backbone.py post_act_block)."""

    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, nbr=None):
        offsets = kernel_offsets(*self.kernel_size)
        if nbr is None:
            nbr = _batched_neighbors(
                st.grid, st.coords, st.valid, st.coords, st.valid, offsets
            )
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (len(offsets), cin, self.out_channels), jnp.float32,
        )
        if isinstance(nbr, GroupedNbr):
            assert tuple(self.kernel_size) == (3, 3, 3)
            out = subm_gather_gemm_grouped(
                st.features.astype(self.dtype), st.valid, nbr.idx, nbr.p,
                w.astype(self.dtype))
        else:
            out = subm_gather_gemm(
                st.features.astype(self.dtype), st.valid, nbr,
                w.astype(self.dtype))
        out = jnp.where(st.valid[..., None], out, 0.0)
        return SparseTensor(out, st.coords, st.valid, st.grid)


class SparseConv3dDown(nn.Module):
    """Strided (2×) sparse conv; output set = parent cells of active inputs.

    `return_out_cmap=True` additionally returns the output coordinate set's
    dense cell map so the caller's next stage reuses it instead of rebuilding
    the same map (the spconv indice_key handoff across strides — one map
    build per coordinate set per step)."""

    out_channels: int
    out_cap: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    z_only: bool = False  # stride (1,1,2): the z-compressing conv_out layer
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, in_cmap=None, train: bool = True,
                 return_out_cmap: bool = False):
        down = st.grid.down_z() if self.z_only else st.grid.down()

        def one(c, v):
            return downsample_coords(down, c, v, self.out_cap, z_only=self.z_only)

        out_coords, out_valid, _ = jax.vmap(one)(st.coords, st.valid)

        if self.z_only:
            centers = jnp.stack(
                [out_coords[..., 0], out_coords[..., 1], out_coords[..., 2] * 2],
                axis=-1,
            )
            ks = (1, 1, self.kernel_size[2])
        else:
            centers = out_coords * 2
            ks = self.kernel_size
        offsets = kernel_offsets(*ks)
        use_grouped = (isinstance(in_cmap, ColumnMap)
                       and not self.z_only and tuple(ks) == (3, 3, 3))
        nbr = _batched_neighbors(
            st.grid, centers, out_valid, st.coords, st.valid, offsets,
            cmap=in_cmap, grouped=use_grouped,
        )
        cin = st.features.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (len(offsets), cin, self.out_channels), jnp.float32,
        )
        feats = st.features.astype(self.dtype)
        wk = w.astype(self.dtype)
        out_cmap = None
        if down.num_cells <= DENSE_MAP_MAX_CELLS or down.nz <= COLUMN_MAP_MAX_NZ:
            if train or return_out_cmap:
                # downsample_coords outputs are always column-sorted, so the
                # columnar map is valid here regardless of the input set
                out_cmap = _stage_map(down, out_coords, out_valid)
        if train and out_cmap is not None:
            # gather-only backward: the output cell map + transpose table
            # (cheap scatters / element takes) make dX a gather too.
            # Columnar transpose when the output map is columnar (4 BEV rows
            # per input voxel full-3D, 1 row z_only); else packed 2×2×2
            # windows for 3³ strides / the element path for wider kernels
            # (SPCONV_KERNEL_SIZES 5 in voxelnext_ioubranch_large)
            if isinstance(nbr, GroupedNbr) and isinstance(out_cmap, ColumnMap):
                from ..core.voxel.sparse_ops import grouped_transpose_tables

                bases = column_map_bases(down, st.coords.shape[0])
                tt = jax.lax.optimization_barrier(jax.vmap(
                    lambda ic, iv, base: grouped_transpose_tables(
                        down, ic, iv, out_cmap, self.out_cap, base)
                )(st.coords, st.valid, bases))
                out = down_gather_gemm_grouped(
                    feats, st.valid, nbr.idx, nbr.p, *tt, wk)
                out = jnp.where(out_valid[..., None], out, 0.0)
                st_out = SparseTensor(out, out_coords, out_valid, down)
                if return_out_cmap:
                    return st_out, out_cmap
                return st_out
            if isinstance(out_cmap, ColumnMap):
                bases = column_map_bases(down, st.coords.shape[0])
                t_fn = lambda ic, iv, base: transpose_down_neighbors_column(  # noqa: E731
                    down, ic, iv, out_cmap, self.out_cap, offsets,
                    z_only=self.z_only, base=base)
            else:
                bases = map_bases(down, st.coords.shape[0])
                if self.z_only:
                    t_fn = lambda ic, iv, base: transpose_down_neighbors(  # noqa: E731
                        down, ic, iv, out_cmap, self.out_cap, offsets,
                        z_only=True, base=base)
                elif tuple(ks) == (3, 3, 3):
                    t_fn = lambda ic, iv, base: transpose_down_neighbors_packed(  # noqa: E731
                        down, ic, iv, out_cmap, self.out_cap, offsets, base=base)
                else:
                    t_fn = lambda ic, iv, base: transpose_down_neighbors(  # noqa: E731
                        down, ic, iv, out_cmap, self.out_cap, offsets, base=base)
            tnbr = jax.lax.optimization_barrier(
                jax.vmap(t_fn)(st.coords, st.valid, bases)
            )
            out = down_gather_gemm(feats, st.valid, nbr, tnbr, wk)
        elif isinstance(nbr, GroupedNbr):
            out = _grouped_gather_gemm(feats, st.valid, nbr.idx, nbr.p, wk)
        else:
            out = _gather_gemm(feats, st.valid, nbr, wk)
        out = jnp.where(out_valid[..., None], out, 0.0)
        st_out = SparseTensor(out, out_coords, out_valid, down)
        if return_out_cmap:
            return st_out, out_cmap
        return st_out


class SparseConvBlock(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool, nbr=None):
        st = SubMConv3d(self.out_channels, self.kernel_size, dtype=self.dtype)(st, nbr)
        x = nn.relu(SparseBatchNorm(dtype=self.dtype)(st.features, st.valid, train))
        x = jnp.where(st.valid[..., None], x, 0.0)
        return SparseTensor(x, st.coords, st.valid, st.grid)


class VoxelBackBone8x(nn.Module):
    """16 → 32 → 64 → 64 @ strides 1/2/4/8 + z-compressing conv_out (128 ch)."""

    grid: SparseGrid          # input sparse grid (nx, ny, nz)
    voxel_cap: int            # stage-0 per-element capacity
    channels: Sequence[int] = (16, 16, 32, 64, 64)
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, coords, valid, train: bool) -> SparseTensor:
        st = SparseTensor(features.astype(self.dtype), coords, valid, self.grid)
        offsets = kernel_offsets(3, 3, 3)

        def stage_tables(st, cmap=None):
            # one cell map + one neighbor table per coordinate set, shared by
            # every conv at that resolution (spconv indice_key reuse); a
            # strided conv's out_cmap is handed in so the map is built ONCE
            # per coordinate set per step
            if cmap is None:
                cmap = _stage_map(st.grid, st.coords, st.valid)
            nbr = _batched_neighbors(
                st.grid, st.coords, st.valid, st.coords, st.valid, offsets,
                cmap=cmap, grouped=True,
            )
            return cmap, nbr

        def down_bn_relu(st, ch, cap, cmap, z_only=False, name=None):
            st, out_cmap = SparseConv3dDown(
                ch, out_cap=cap, z_only=z_only, dtype=self.dtype, name=name
            )(st, in_cmap=cmap, train=train, return_out_cmap=True)
            x = nn.relu(
                SparseBatchNorm(dtype=self.dtype, name=f"{name}_bn")(
                    st.features, st.valid, train
                )
            )
            x = jnp.where(st.valid[..., None], x, 0.0)
            return SparseTensor(x, st.coords, st.valid, st.grid), out_cmap

        cmap, nbr = stage_tables(st)
        st = SparseConvBlock(self.channels[0], dtype=self.dtype, name="conv_input")(st, train, nbr)
        st = SparseConvBlock(self.channels[1], dtype=self.dtype, name="conv1")(st, train, nbr)
        st, cmap = down_bn_relu(st, self.channels[2], max(self.voxel_cap // 2, 16), cmap, name="down2")
        cmap, nbr = stage_tables(st, cmap)
        st = SparseConvBlock(self.channels[2], dtype=self.dtype, name="conv2a")(st, train, nbr)
        st = SparseConvBlock(self.channels[2], dtype=self.dtype, name="conv2b")(st, train, nbr)
        st, cmap = down_bn_relu(st, self.channels[3], max(self.voxel_cap // 4, 16), cmap, name="down3")
        cmap, nbr = stage_tables(st, cmap)
        st = SparseConvBlock(self.channels[3], dtype=self.dtype, name="conv3a")(st, train, nbr)
        st = SparseConvBlock(self.channels[3], dtype=self.dtype, name="conv3b")(st, train, nbr)
        st, cmap = down_bn_relu(st, self.channels[4], max(self.voxel_cap // 8, 16), cmap, name="down4")
        cmap, nbr = stage_tables(st, cmap)
        st = SparseConvBlock(self.channels[4], dtype=self.dtype, name="conv4a")(st, train, nbr)
        st = SparseConvBlock(self.channels[4], dtype=self.dtype, name="conv4b")(st, train, nbr)
        st, _ = down_bn_relu(
            st, self.out_channels, max(self.voxel_cap // 8, 16), cmap,
            z_only=True, name="conv_out",
        )
        return st


def height_compression(st: SparseTensor):
    """Sparse → dense BEV: (B, ny, nx, nz_out * C) (reference HeightCompression)."""
    g = st.grid
    b = st.features.shape[0]
    c = st.features.shape[-1]
    cells = g.nx * g.ny * g.nz
    lin = (
        (st.coords[..., 2] * g.ny + st.coords[..., 1]) * g.nx + st.coords[..., 0]
    )
    batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    lin = jnp.where(st.valid, lin + batch_idx * cells, b * cells)
    dense = jax.ops.segment_sum(
        st.features.astype(jnp.float32).reshape(-1, c), lin.reshape(-1),
        num_segments=b * cells,
    )
    dense = dense.reshape(b, g.nz, g.ny, g.nx, c)
    return dense.transpose(0, 2, 3, 1, 4).reshape(b, g.ny, g.nx, g.nz * c)


class SparseEncoder(nn.Module):
    """VoxelBackBone8x stage layout, returning per-stage tensors (for UNet
    decoders and PV-RCNN's VoxelSetAbstraction)."""

    grid: SparseGrid
    voxel_cap: int
    channels: Sequence[int] = (16, 16, 32, 64, 64)
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, coords, valid, train: bool):
        """Returns (bev_st, [s1, s2, s4, s8]) with s_k at stride k."""
        cap = self.voxel_cap
        offsets = kernel_offsets(3, 3, 3)
        st = SparseTensor(features.astype(self.dtype), coords, valid, self.grid)

        def stage_tables(st, cmap=None):
            if cmap is None:
                cmap = _stage_map(st.grid, st.coords, st.valid)
            nbr = _batched_neighbors(
                st.grid, st.coords, st.valid, st.coords, st.valid, offsets,
                cmap=cmap, grouped=True,
            )
            return cmap, nbr

        cmap, nbr = stage_tables(st)
        st = SparseConvBlock(self.channels[0], dtype=self.dtype, name="conv_in")(st, train, nbr)
        s1 = SparseConvBlock(self.channels[1], dtype=self.dtype, name="conv1")(st, train, nbr)

        def down(st, in_cmap, ch, cap, name):
            st, out_cmap = SparseConv3dDown(
                ch, out_cap=cap, dtype=self.dtype, name=name
            )(st, in_cmap=in_cmap, train=train, return_out_cmap=True)
            cmap, nbr = stage_tables(st, out_cmap)
            st = SparseConvBlock(ch, dtype=self.dtype, name=f"{name}_refine")(st, train, nbr)
            return st, cmap

        s2, cmap2 = down(s1, cmap, self.channels[2], max(cap // 2, 16), "down2")
        s4, cmap4 = down(s2, cmap2, self.channels[3], max(cap // 4, 16), "down3")
        s8, cmap8 = down(s4, cmap4, self.channels[4], max(cap // 8, 16), "down4")
        bev_st = SparseConv3dDown(
            self.out_channels, out_cap=max(cap // 8, 16), z_only=True,
            dtype=self.dtype, name="conv_out",
        )(s8, in_cmap=cmap8, train=train)
        return bev_st, [s1, s2, s4, s8]


def voxel_centers_of(st: SparseTensor, base_grid_size, point_cloud_range,
                     base_voxel_size, stride: int):
    """World-frame centers of a sparse tensor's voxels at the given stride."""
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(base_voxel_size, jnp.float32) * stride
    return (st.coords.astype(jnp.float32) + 0.5) * vs + pcr[0:3]


class VoxelResBackBone8xVoxelNeXt(nn.Module):
    """The VoxelNeXt residual encoder (reference
    spconv_backbone_voxelnext.py:69-200): conv_input SubM + 2 res blocks,
    then five (strided down + 2 res blocks) stages at strides 2/4/8/16/32
    with per-stage SPCONV_KERNEL_SIZES on the down convs. Returns the
    stride-8/16/32 stages — the detector scales conv5/conv6 coords back onto
    the stride-8 grid, row-concatenates and z-collapses (bev_out)."""

    grid: "SparseGrid"
    voxel_cap: int
    channels: Sequence[int] = (16, 32, 64, 128, 128)
    kernel_sizes: Sequence[int] = (3, 3, 3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, coords, valid, train: bool):
        st = SparseTensor(features.astype(self.dtype), coords, valid, self.grid)
        offsets3 = kernel_offsets(3, 3, 3)

        def stage_tables(st, cmap=None):
            if cmap is None:
                cmap = _stage_map(st.grid, st.coords, st.valid)
            nbr = _batched_neighbors(
                st.grid, st.coords, st.valid, st.coords, st.valid, offsets3,
                cmap=cmap,
            )
            return cmap, nbr

        def down_bn_relu(st, ch, cap, cmap, k, name):
            st, out_cmap = SparseConv3dDown(
                ch, out_cap=cap, kernel_size=(k, k, k), dtype=self.dtype,
                name=name,
            )(st, in_cmap=cmap if k == 3 else None, train=train,
              return_out_cmap=True)
            x = nn.relu(SparseBatchNorm(dtype=self.dtype, name=f"{name}_bn")(
                st.features, st.valid, train))
            x = jnp.where(st.valid[..., None], x, 0.0)
            return SparseTensor(x, st.coords, st.valid, st.grid), out_cmap

        ch = tuple(self.channels)
        ks = tuple(self.kernel_sizes)
        cap = self.voxel_cap
        cmap, nbr = stage_tables(st)
        st = SparseConvBlock(ch[0], dtype=self.dtype, name="conv_input")(
            st, train, nbr)
        st = SparseResBlock(ch[0], dtype=self.dtype, name="res1a")(st, train, nbr)
        st = SparseResBlock(ch[0], dtype=self.dtype, name="res1b")(st, train, nbr)

        stages = {}
        caps = (max(cap // 2, 16), max(cap // 4, 16), max(cap // 8, 16),
                max(cap // 16, 16), max(cap // 32, 16))
        for i in range(5):  # conv2..conv6 at strides 2/4/8/16/32
            c = ch[min(i + 1, len(ch) - 1)]
            st, cmap = down_bn_relu(st, c, caps[i], cmap,
                                    ks[min(i, len(ks) - 1)],
                                    name=f"down{i + 2}")
            cmap, nbr = stage_tables(st, cmap)
            st = SparseResBlock(c, dtype=self.dtype, name=f"res{i + 2}a")(
                st, train, nbr)
            st = SparseResBlock(c, dtype=self.dtype, name=f"res{i + 2}b")(
                st, train, nbr)
            if i >= 2:
                stages[f"st{2 ** (i + 1)}"] = st
        return stages["st8"], stages["st16"], stages["st32"]


class SparseResBlock(nn.Module):
    """Residual submanifold block: SubM→BN→ReLU→SubM→BN (+skip) → ReLU
    (reference SparseBasicBlock, spconv_backbone.py:14-60)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool, nbr=None):
        identity = st.features
        st1 = SubMConv3d(self.channels, dtype=self.dtype, name="conv1")(st, nbr)
        x = nn.relu(SparseBatchNorm(dtype=self.dtype, name="bn1")(
            st1.features, st1.valid, train))
        st2 = SubMConv3d(self.channels, dtype=self.dtype, name="conv2")(
            SparseTensor(x, st.coords, st.valid, st.grid), nbr)
        x = SparseBatchNorm(dtype=self.dtype, name="bn2")(
            st2.features, st2.valid, train)
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name="downsample")(identity)
        x = nn.relu(x + identity.astype(x.dtype))
        x = jnp.where(st.valid[..., None], x, 0.0)
        return SparseTensor(x, st.coords, st.valid, st.grid)


class VoxelResBackBone8x(nn.Module):
    """Residual-block variant of VoxelBackBone8x (reference
    spconv_backbone.VoxelResBackBone8x:184-260: channels 16→32→64→128, two
    SparseBasicBlocks per stage, strided downs between)."""

    grid: SparseGrid
    voxel_cap: int
    channels: Sequence[int] = (16, 32, 64, 128)
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, coords, valid, train: bool) -> SparseTensor:
        st = SparseTensor(features.astype(self.dtype), coords, valid, self.grid)
        offsets = kernel_offsets(3, 3, 3)

        def stage_tables(st, cmap=None):
            if cmap is None:
                cmap = _stage_map(st.grid, st.coords, st.valid)
            nbr = _batched_neighbors(
                st.grid, st.coords, st.valid, st.coords, st.valid, offsets,
                cmap=cmap, grouped=True,
            )
            return cmap, nbr

        def down_bn_relu(st, ch, cap, cmap, z_only=False, name=None):
            st, out_cmap = SparseConv3dDown(
                ch, out_cap=cap, z_only=z_only, dtype=self.dtype, name=name
            )(st, in_cmap=cmap, train=train, return_out_cmap=True)
            x = nn.relu(SparseBatchNorm(dtype=self.dtype, name=f"{name}_bn")(
                st.features, st.valid, train))
            x = jnp.where(st.valid[..., None], x, 0.0)
            return SparseTensor(x, st.coords, st.valid, st.grid), out_cmap

        cap = self.voxel_cap
        cmap, nbr = stage_tables(st)
        st = SparseConvBlock(self.channels[0], dtype=self.dtype,
                             name="conv_input")(st, train, nbr)
        st = SparseResBlock(self.channels[0], dtype=self.dtype, name="res1a")(st, train, nbr)
        st = SparseResBlock(self.channels[0], dtype=self.dtype, name="res1b")(st, train, nbr)
        st, cmap = down_bn_relu(st, self.channels[1], max(cap // 2, 16), cmap, name="down2")
        cmap, nbr = stage_tables(st, cmap)
        st = SparseResBlock(self.channels[1], dtype=self.dtype, name="res2a")(st, train, nbr)
        st = SparseResBlock(self.channels[1], dtype=self.dtype, name="res2b")(st, train, nbr)
        st, cmap = down_bn_relu(st, self.channels[2], max(cap // 4, 16), cmap, name="down3")
        cmap, nbr = stage_tables(st, cmap)
        st = SparseResBlock(self.channels[2], dtype=self.dtype, name="res3a")(st, train, nbr)
        st = SparseResBlock(self.channels[2], dtype=self.dtype, name="res3b")(st, train, nbr)
        st, cmap = down_bn_relu(st, self.channels[3], max(cap // 8, 16), cmap, name="down4")
        cmap, nbr = stage_tables(st, cmap)
        st = SparseResBlock(self.channels[3], dtype=self.dtype, name="res4a")(st, train, nbr)
        st = SparseResBlock(self.channels[3], dtype=self.dtype, name="res4b")(st, train, nbr)
        st, _ = down_bn_relu(
            st, self.out_channels, max(cap // 8, 16), cmap,
            z_only=True, name="conv_out",
        )
        return st
