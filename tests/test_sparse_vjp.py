"""Custom-VJP correctness: gather-only backwards == autodiff of the plain op.

subm_gather_gemm relies on the centrosymmetry of kernel_offsets and
down_gather_gemm on the transpose_down_neighbors table; both must produce
exactly the gradients XLA derives for the unadorned _gather_gemm.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu3d_tpu.core.voxel.sparse_ops import (
    SparseGrid,
    kernel_offsets,
    map_bases,
    transpose_down_neighbors,
)
from dfu3d_tpu.models.sparse_backbone import (
    _batched_cell_map,
    _batched_neighbors,
    _gather_gemm,
    down_gather_gemm,
    subm_gather_gemm,
)


def _random_sparse(rng, b, v, grid, n_valid):
    coords = np.stack([
        rng.randint(0, grid.nx, (b, v)),
        rng.randint(0, grid.ny, (b, v)),
        rng.randint(0, grid.nz, (b, v)),
    ], axis=-1).astype(np.int32)
    # dedupe within each element so the cell map is a bijection
    for i in range(b):
        lin = (coords[i, :, 2] * grid.ny + coords[i, :, 1]) * grid.nx + coords[i, :, 0]
        _, first = np.unique(lin, return_index=True)
        mask = np.zeros(v, bool)
        mask[first] = True
        coords[i, ~mask] = 0  # duplicates collapse; mark invalid below
        valid_i = mask
        if i == 0:
            valid = np.zeros((b, v), bool)
        valid[i] = valid_i
    valid[:, n_valid:] = False
    return jnp.asarray(coords), jnp.asarray(valid)


class TestSubmVJP:
    def test_grads_match_autodiff(self):
        rng = np.random.RandomState(0)
        b, v, cin, cout = 2, 96, 5, 7
        grid = SparseGrid(12, 10, 6)
        coords, valid = _random_sparse(rng, b, v, grid, 80)
        offsets = kernel_offsets(3, 3, 3)
        nbr = _batched_neighbors(grid, coords, valid, coords, valid, offsets)
        feats = jnp.asarray(rng.randn(b, v, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.randn(b, v, cout).astype(np.float32))

        def loss_ref(f, k):
            return jnp.sum(_gather_gemm(f, valid, nbr, k) * cot)

        def loss_new(f, k):
            return jnp.sum(subm_gather_gemm(f, valid, nbr, k) * cot)

        gf_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
        gf_new, gk_new = jax.grad(loss_new, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gf_new), np.asarray(gf_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk_new), np.asarray(gk_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_forward_identical(self):
        rng = np.random.RandomState(1)
        b, v = 1, 64
        grid = SparseGrid(8, 8, 8)
        coords, valid = _random_sparse(rng, b, v, grid, 50)
        offsets = kernel_offsets(3, 3, 3)
        nbr = _batched_neighbors(grid, coords, valid, coords, valid, offsets)
        feats = jnp.asarray(rng.randn(b, v, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(27, 4, 6).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(subm_gather_gemm(feats, valid, nbr, w)),
            np.asarray(_gather_gemm(feats, valid, nbr, w)),
        )


class TestDownVJP:
    @pytest.mark.parametrize("z_only", [False, True])
    def test_grads_match_autodiff(self, z_only):
        rng = np.random.RandomState(2)
        b, v, cin, cout = 2, 96, 4, 6
        grid = SparseGrid(12, 10, 6)
        down = grid.down_z() if z_only else grid.down()
        coords, valid = _random_sparse(rng, b, v, grid, 80)

        from dfu3d_tpu.core.voxel.sparse_ops import downsample_coords

        q_cap = 64
        out_coords, out_valid, _ = jax.vmap(
            lambda c, m: downsample_coords(down, c, m, q_cap, z_only=z_only)
        )(coords, valid)
        if z_only:
            centers = jnp.stack(
                [out_coords[..., 0], out_coords[..., 1], out_coords[..., 2] * 2],
                axis=-1,
            )
            offsets = kernel_offsets(1, 1, 3)
        else:
            centers = out_coords * 2
            offsets = kernel_offsets(3, 3, 3)
        nbr = _batched_neighbors(grid, centers, out_valid, coords, valid, offsets)
        out_cmap = _batched_cell_map(down, out_coords, out_valid)
        tnbr = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors(
                down, ic, iv, out_cmap, q_cap, offsets, z_only=z_only,
                base=base)
        )(coords, valid, map_bases(down, b))

        feats = jnp.asarray(rng.randn(b, v, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(len(offsets), cin, cout).astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.randn(b, q_cap, cout).astype(np.float32))
        # the layer masks its output by out_valid — grads arriving for invalid
        # outputs are zero; bake that into the cotangent like the real model
        cot = jnp.where(out_valid[..., None], cot, 0.0)

        def loss_ref(f, k):
            return jnp.sum(_gather_gemm(f, valid, nbr, k) * cot)

        def loss_new(f, k):
            return jnp.sum(down_gather_gemm(f, valid, nbr, tnbr, k) * cot)

        gf_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
        gf_new, gk_new = jax.grad(loss_new, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gf_new), np.asarray(gf_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk_new), np.asarray(gk_ref),
                                   rtol=1e-5, atol=1e-5)


class TestPackedTables:
    """Packed window-gather table builders == their element-gather oracles."""

    def test_batched_cell_map_matches_vmap(self):
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_cell_map, build_cell_map_batched)

        rng = np.random.RandomState(3)
        grid = SparseGrid(9, 7, 5)
        coords, valid = _random_sparse(rng, 3, 64, grid, 50)
        want = jax.vmap(lambda c, v: build_cell_map(grid, c, v))(coords, valid)
        got = build_cell_map_batched(grid, coords, valid)
        # batched maps are FLAT (B·stride,) — no (B, stride) relayout
        np.testing.assert_array_equal(
            np.asarray(got.slots).reshape(want.shape), np.asarray(want))
        # pair companion: pair[i] = slots[i] | slots[i+1] << 16 over the
        # flat layout (cross-element +1 reads the next leading zero pad)
        flat = np.asarray(got.slots).reshape(-1).astype(np.uint32)
        nxt = np.roll(flat, -1)
        np.testing.assert_array_equal(
            np.asarray(got.pair).reshape(-1), flat | (nxt << 16))

    def test_transpose_packed_matches_element(self):
        from dfu3d_tpu.core.voxel.sparse_ops import (
            downsample_coords, transpose_down_neighbors_packed)

        rng = np.random.RandomState(4)
        b, v, q_cap = 2, 128, 96
        # odd dims exercise the ceil-halving edges
        grid = SparseGrid(13, 11, 7)
        down = grid.down()
        coords, valid = _random_sparse(rng, b, v, grid, 100)
        out_coords, out_valid, _ = jax.vmap(
            lambda c, m: downsample_coords(down, c, m, q_cap)
        )(coords, valid)
        out_cmap = _batched_cell_map(down, out_coords, out_valid)
        offsets = kernel_offsets(3, 3, 3)
        bases = map_bases(down, b)
        want = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors(
                down, ic, iv, out_cmap, q_cap, offsets, base=base)
        )(coords, valid, bases)
        got = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors_packed(
                down, ic, iv, out_cmap, q_cap, offsets, base=base)
        )(coords, valid, bases)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_transpose_packed_origin_voxels(self):
        """x=0/y=0/z=0 voxels have parent-window starts at −1 per axis —
        clipped window rows must still resolve the valid taps."""
        from dfu3d_tpu.core.voxel.sparse_ops import (
            downsample_coords, transpose_down_neighbors_packed)

        grid = SparseGrid(6, 6, 6)
        down = grid.down()
        coords = jnp.asarray(np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 1], [5, 5, 5], [2, 3, 1]]],
            np.int32))
        valid = jnp.ones((1, 5), bool)
        q_cap = 8
        out_coords, out_valid, _ = jax.vmap(
            lambda c, m: downsample_coords(down, c, m, q_cap)
        )(coords, valid)
        out_cmap = _batched_cell_map(down, out_coords, out_valid)
        offsets = kernel_offsets(3, 3, 3)
        bases = map_bases(down, 1)
        want = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors(
                down, ic, iv, out_cmap, q_cap, offsets, base=base)
        )(coords, valid, bases)
        got = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors_packed(
                down, ic, iv, out_cmap, q_cap, offsets, base=base)
        )(coords, valid, bases)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestGatherGemmForms:
    """The fused gather-GEMM (one B·Q·K-row gather + one (K, Cin)-contracting
    dot_general) must match the K-loop accumulate form in forward and in both
    shared-gather backward variants (SubM flip / strided transpose-table)."""

    def test_fused_equals_loop(self):
        import dfu3d_tpu.models.sparse_backbone as sb

        rng = np.random.RandomState(0)
        b, v, q, k, cin, cout = 2, 50, 40, 27, 16, 32
        feats = jnp.asarray(rng.randn(b, v, cin).astype(np.float32))
        valid = jnp.asarray(rng.rand(b, v) > 0.2)
        nbr_f = jnp.asarray(rng.randint(0, v + 1, (b, q, k)).astype(np.int32))
        nbr_s = jnp.asarray(rng.randint(0, v + 1, (b, v, k)).astype(np.int32))
        tnbr = jnp.asarray(rng.randint(0, q + 1, (b, v, k)).astype(np.int32))
        kern = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32))
        g_sub = jnp.asarray(rng.randn(b, v, cout).astype(np.float32))
        g_str = jnp.asarray(rng.randn(b, q, cout).astype(np.float32))

        prev = sb.GATHER_GEMM_FORM
        try:
            outs = {}
            for form in ("loop", "fused"):
                sb.GATHER_GEMM_FORM = form
                outs[form] = (
                    np.asarray(sb._gather_gemm(feats, valid, nbr_f, kern)),
                    *map(np.asarray, sb._shared_gather_bwd(
                        feats, valid, nbr_s, kern, g_sub, True)),
                    *map(np.asarray, sb._shared_gather_bwd(
                        feats, valid, tnbr, kern, g_str, False)),
                )
        finally:
            sb.GATHER_GEMM_FORM = prev
        for a, bb in zip(outs["loop"], outs["fused"]):
            # tolerance absorbs summation-order rounding between the forms
            np.testing.assert_allclose(a, bb, rtol=2e-4, atol=5e-5)


class TestPairPackedFetch:
    """The u32 pair-map fetch (2 gathers) must agree with the element path
    on both the SubM 3-window lookup and the strided transpose table."""

    def test_pair_window_fetch_matches_element(self):
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_cell_map_batched, find_neighbors_via_map,
            find_neighbors_via_map_packed, kernel_offsets)

        rng = np.random.RandomState(5)
        grid = SparseGrid(17, 13, 9)
        b, v = 2, 200
        coords, valid = _random_sparse(rng, b, v, grid, 160)
        offsets = kernel_offsets(3, 3, 3)
        cmap = build_cell_map_batched(grid, coords, valid)
        assert cmap.pair is not None
        bases = map_bases(grid, b)
        want = jax.vmap(
            lambda c, vd, base: find_neighbors_via_map(
                grid, c, vd, cmap.slots, v, offsets, base)
        )(coords, valid, bases)
        got = jax.vmap(
            lambda c, vd, base: find_neighbors_via_map_packed(
                grid, c, vd, cmap, v, offsets, base)
        )(coords, valid, bases)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_pair_transpose_matches_element(self):
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_cell_map_batched, downsample_coords, kernel_offsets,
            transpose_down_neighbors, transpose_down_neighbors_packed)

        rng = np.random.RandomState(6)
        grid = SparseGrid(13, 11, 7)
        down = grid.down()
        b, v, q_cap = 2, 128, 96
        coords, valid = _random_sparse(rng, b, v, grid, 100)
        out_c, out_v, _ = jax.vmap(
            lambda c, vd: downsample_coords(down, c, vd, q_cap)
        )(coords, valid)
        offsets = kernel_offsets(3, 3, 3)
        cmap = build_cell_map_batched(down, out_c, out_v)
        bases = map_bases(down, b)
        want = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors(
                down, ic, iv, cmap.slots, q_cap, offsets, base=base)
        )(coords, valid, bases)
        got = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors_packed(
                down, ic, iv, cmap, q_cap, offsets, base=base)
        )(coords, valid, bases)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _random_column_sorted(rng, b, v, grid, n_valid):
    """Random unique sparse set in COLUMN-MAJOR slot order (valid first, z
    fastest) — the dynamic_voxelize / downsample_coords compaction invariant
    the ColumnMap relies on."""
    coords, valid = _random_sparse(rng, b, v, grid, n_valid)
    coords, valid = np.asarray(coords), np.asarray(valid)
    out_c = np.zeros_like(coords)
    out_v = np.zeros_like(valid)
    for i in range(b):
        key = (coords[i, :, 1] * grid.nx + coords[i, :, 0]) * grid.nz + coords[i, :, 2]
        key = np.where(valid[i], key, grid.num_cells)
        order = np.argsort(key, kind="stable")
        out_c[i] = coords[i][order]
        out_v[i] = valid[i][order]
    return jnp.asarray(out_c), jnp.asarray(out_v)


class TestColumnarMap:
    """Columnar BEV map (occupancy bitmask + popcount ranking) must agree
    exactly with the dense 3D cell map on every lookup shape the backbone
    issues (sparse_ops.ColumnMap; round-5 table-machinery redesign)."""

    @pytest.mark.parametrize("nz,ks", [(6, (3, 3, 3)), (40, (3, 3, 3)),
                                       (64, (3, 3, 3)), (40, (1, 1, 3)),
                                       (7, (5, 5, 5))])
    def test_column_lookup_matches_element(self, nz, ks):
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_cell_map_batched, build_column_map_batched,
            column_map_bases, find_neighbors_via_column_map,
            find_neighbors_via_map)

        rng = np.random.RandomState(nz)
        grid = SparseGrid(9, 8, nz)
        b, v = 2, 160
        coords, valid = _random_column_sorted(rng, b, v, grid, 120)
        offsets = kernel_offsets(*ks)
        dmap = build_cell_map_batched(grid, coords, valid)
        want = jax.vmap(
            lambda c, vd, base: find_neighbors_via_map(
                grid, c, vd, dmap.slots, v, offsets, base)
        )(coords, valid, map_bases(grid, b))
        colmap = build_column_map_batched(grid, coords, valid)
        got = jax.vmap(
            lambda c, vd, base: find_neighbors_via_column_map(
                grid, c, vd, colmap, v, offsets, base)
        )(coords, valid, column_map_bases(grid, b))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_column_lookup_strided_centers(self):
        """Down-conv forward lookups query EVEN centers of the input grid."""
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_cell_map_batched, build_column_map_batched,
            column_map_bases, downsample_coords,
            find_neighbors_via_column_map, find_neighbors_via_map)

        rng = np.random.RandomState(3)
        grid = SparseGrid(12, 10, 40)
        down = grid.down()
        b, v, q_cap = 2, 160, 128
        coords, valid = _random_column_sorted(rng, b, v, grid, 130)
        out_c, out_v, _ = jax.vmap(
            lambda c, vd: downsample_coords(down, c, vd, q_cap)
        )(coords, valid)
        centers = out_c * 2
        offsets = kernel_offsets(3, 3, 3)
        dmap = build_cell_map_batched(grid, coords, valid)
        want = jax.vmap(
            lambda qc, qv, base: find_neighbors_via_map(
                grid, qc, qv, dmap.slots, v, offsets, base)
        )(centers, out_v, map_bases(grid, b))
        colmap = build_column_map_batched(grid, coords, valid)
        got = jax.vmap(
            lambda qc, qv, base: find_neighbors_via_column_map(
                grid, qc, qv, colmap, v, offsets, base)
        )(centers, out_v, column_map_bases(grid, b))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("z_only", [False, True])
    def test_column_transpose_matches_element(self, z_only):
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_cell_map_batched, build_column_map_batched,
            column_map_bases, downsample_coords,
            transpose_down_neighbors, transpose_down_neighbors_column)

        rng = np.random.RandomState(11)
        grid = SparseGrid(13, 11, 40)
        down = grid.down_z() if z_only else grid.down()
        b, v, q_cap = 2, 160, 128
        coords, valid = _random_column_sorted(rng, b, v, grid, 120)
        out_c, out_v, _ = jax.vmap(
            lambda c, vd: downsample_coords(down, c, vd, q_cap,
                                            z_only=z_only)
        )(coords, valid)
        offsets = kernel_offsets(1, 1, 3) if z_only else kernel_offsets(3, 3, 3)
        dmap = build_cell_map_batched(down, out_c, out_v)
        want = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors(
                down, ic, iv, dmap.slots, q_cap, offsets, z_only=z_only,
                base=base)
        )(coords, valid, map_bases(down, b))
        colmap = build_column_map_batched(down, out_c, out_v)
        got = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors_column(
                down, ic, iv, colmap, q_cap, offsets, z_only=z_only,
                base=base)
        )(coords, valid, column_map_bases(down, b))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_voxelizer_order_is_column_major(self):
        """The slot-contiguity invariant itself: dynamic_voxelize compacts
        columns into consecutive slots with z ascending."""
        from dfu3d_tpu.core.voxel import VoxelGrid, dynamic_voxelize

        rng = np.random.RandomState(0)
        g = VoxelGrid.create([0, 0, 0, 8, 8, 8], [1, 1, 1])
        pts = rng.uniform(0, 8, (600, 3)).astype(np.float32)
        out = dynamic_voxelize(g, jnp.asarray(pts),
                               jnp.ones(600, bool), max_voxels=600)
        vc = np.asarray(out.voxel_coords)[: int(out.num_voxels)]
        key = (vc[:, 1] * 8 + vc[:, 0]) * 8 + vc[:, 2]
        assert np.all(np.diff(key) > 0)


class TestGroupedSubm:
    """Packed-row (grouped) subm/down gather-GEMM == the element-form ops,
    forward AND gradients (round-5: 9 packed 3C-wide fetch rows replace 27
    C-wide rows using the column-contiguity invariant)."""

    def _setup(self, seed=0, nz=12):
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_column_map_batched, column_map_bases,
            grouped_column_neighbors)

        rng = np.random.RandomState(seed)
        grid = SparseGrid(11, 9, nz)
        b, v, cin, cout = 2, 128, 5, 7
        coords, valid = _random_column_sorted(rng, b, v, grid, 100)
        offsets = kernel_offsets(3, 3, 3)
        colmap = build_column_map_batched(grid, coords, valid)
        idx, p = jax.vmap(
            lambda qc, qv, base: grouped_column_neighbors(
                grid, qc, qv, colmap, v, offsets, base)
        )(coords, valid, column_map_bases(grid, b))
        nbr = _batched_neighbors(grid, coords, valid, coords, valid, offsets)
        feats = jnp.asarray(rng.randn(b, v, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        return grid, coords, valid, feats, w, nbr, idx, p

    def test_forward_equal(self):
        from dfu3d_tpu.models.sparse_backbone import subm_gather_gemm_grouped

        for seed, nz in ((0, 12), (1, 40), (2, 64)):
            _g, _c, valid, feats, w, nbr, idx, p = self._setup(seed, nz)
            want = np.asarray(subm_gather_gemm(feats, valid, nbr, w))
            got = np.asarray(subm_gather_gemm_grouped(feats, valid, idx, p, w))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grads_equal(self):
        from dfu3d_tpu.models.sparse_backbone import subm_gather_gemm_grouped

        _g, _c, valid, feats, w, nbr, idx, p = self._setup(3)
        cot = jnp.asarray(
            np.random.RandomState(9).randn(*feats.shape[:2], 7).astype(
                np.float32))

        def loss_el(f, k):
            return jnp.sum(subm_gather_gemm(f, valid, nbr, k) * cot)

        def loss_gr(f, k):
            return jnp.sum(
                subm_gather_gemm_grouped(f, valid, idx, p, k) * cot)

        gf_e, gk_e = jax.grad(loss_el, argnums=(0, 1))(feats, w)
        gf_g, gk_g = jax.grad(loss_gr, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gf_g), np.asarray(gf_e),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk_g), np.asarray(gk_e),
                                   rtol=1e-4, atol=1e-4)

    def test_down_forward_equal(self):
        """Grouped fetch at strided-2 centers == element fetch."""
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_column_map_batched, column_map_bases, downsample_coords,
            grouped_column_neighbors)
        from dfu3d_tpu.models.sparse_backbone import _grouped_gather_gemm

        rng = np.random.RandomState(5)
        grid = SparseGrid(12, 10, 40)
        down = grid.down()
        b, v, cin, cout, q_cap = 2, 160, 4, 6, 128
        coords, valid = _random_column_sorted(rng, b, v, grid, 130)
        out_c, out_v, _ = jax.vmap(
            lambda c, vd: downsample_coords(down, c, vd, q_cap)
        )(coords, valid)
        centers = out_c * 2
        offsets = kernel_offsets(3, 3, 3)
        feats = jnp.asarray(rng.randn(b, v, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        nbr = _batched_neighbors(grid, centers, out_v, coords, valid, offsets)
        want = np.asarray(_gather_gemm(feats, valid, nbr, w))
        colmap = build_column_map_batched(grid, coords, valid)
        idx, p = jax.vmap(
            lambda qc, qv, base: grouped_column_neighbors(
                grid, qc, qv, colmap, v, offsets, base)
        )(centers, out_v, column_map_bases(grid, b))
        got = np.asarray(_grouped_gather_gemm(feats, valid, idx, p, w))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_down_grouped_grads_equal(self):
        """down_gather_gemm_grouped (packed fwd + 4-row packed transpose
        bwd) grads == the element-form down_gather_gemm grads."""
        from dfu3d_tpu.core.voxel.sparse_ops import (
            build_column_map_batched, column_map_bases, downsample_coords,
            grouped_column_neighbors, grouped_transpose_tables)
        from dfu3d_tpu.models.sparse_backbone import (
            _batched_cell_map, down_gather_gemm, down_gather_gemm_grouped)
        from dfu3d_tpu.core.voxel.sparse_ops import transpose_down_neighbors

        rng = np.random.RandomState(7)
        grid = SparseGrid(12, 10, 40)
        down = grid.down()
        b, v, cin, cout, q_cap = 2, 160, 4, 6, 128
        coords, valid = _random_column_sorted(rng, b, v, grid, 130)
        out_c, out_v, _ = jax.vmap(
            lambda c, vd: downsample_coords(down, c, vd, q_cap)
        )(coords, valid)
        centers = out_c * 2
        offsets = kernel_offsets(3, 3, 3)
        feats = jnp.asarray(rng.randn(b, v, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.randn(b, q_cap, cout).astype(np.float32))
        cot = jnp.where(out_v[..., None], cot, 0.0)

        # element reference
        nbr = _batched_neighbors(grid, centers, out_v, coords, valid, offsets)
        dmap = _batched_cell_map(down, out_c, out_v)
        tnbr = jax.vmap(
            lambda ic, iv, base: transpose_down_neighbors(
                down, ic, iv, dmap, q_cap, offsets, base=base)
        )(coords, valid, map_bases(down, b))

        def loss_el(f, k):
            return jnp.sum(down_gather_gemm(f, valid, nbr, tnbr, k) * cot)

        # grouped
        colmap = build_column_map_batched(grid, coords, valid)
        idx, p = jax.vmap(
            lambda qc, qv, base: grouped_column_neighbors(
                grid, qc, qv, colmap, v, offsets, base)
        )(centers, out_v, column_map_bases(grid, b))
        ocolmap = build_column_map_batched(down, out_c, out_v)
        tt = jax.vmap(
            lambda ic, iv, base: grouped_transpose_tables(
                down, ic, iv, ocolmap, q_cap, base)
        )(coords, valid, column_map_bases(down, b))

        def loss_gr(f, k):
            return jnp.sum(
                down_gather_gemm_grouped(f, valid, idx, p, *tt, k) * cot)

        f_e = float(loss_el(feats, w))
        f_g = float(loss_gr(feats, w))
        np.testing.assert_allclose(f_g, f_e, rtol=1e-5)
        gf_e, gk_e = jax.grad(loss_el, argnums=(0, 1))(feats, w)
        gf_g, gk_g = jax.grad(loss_gr, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gf_g), np.asarray(gf_e),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk_g), np.asarray(gk_e),
                                   rtol=1e-4, atol=1e-4)
