"""Column-sparse (dense-z) backbone equivalence vs the gather-GEMM path.

The column formulation (models/column_sparse.py) must be an EXECUTION
strategy, not a different model: same param tree, same active sets, same
features. These tests initialize sparse_backbone.VoxelBackBone8x, feed the
identical variables to ColumnVoxelBackBone8x, and assert the dense BEV
output (height_compression — a canonical order-free form) matches, forward
and backward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfu3d_tpu.core.voxel.sparse_ops import SparseGrid
from dfu3d_tpu.models.column_sparse import ColumnVoxelBackBone8x
from dfu3d_tpu.models.sparse_backbone import (
    VoxelBackBone8x,
    height_compression,
)

B, V, CIN = 2, 512, 4
GRID = SparseGrid(32, 32, 8)


def _scene(rng, b=B, v=V):
    coords = np.stack([
        rng.randint(0, GRID.nx, (b, v)),
        rng.randint(0, GRID.ny, (b, v)),
        rng.randint(0, GRID.nz, (b, v)),
    ], axis=-1).astype(np.int32)
    # dedupe cells per element (duplicate voxel cells are a voxelizer
    # invariant both paths assume)
    valid = np.zeros((b, v), bool)
    for e in range(b):
        lin = (coords[e, :, 2] * GRID.ny + coords[e, :, 1]) * GRID.nx \
            + coords[e, :, 0]
        _, first = np.unique(lin, return_index=True)
        valid[e, first] = True
        valid[e, rng.rand(v) < 0.1] = False
        # column-major slot order, valid first (the dynamic_voxelize
        # compaction invariant the gather path's ColumnMap relies on)
        key = (coords[e, :, 1].astype(np.int64) * GRID.nx
               + coords[e, :, 0]) * GRID.nz + coords[e, :, 2]
        order = np.argsort(np.where(valid[e], key, GRID.num_cells),
                           kind="stable")
        coords[e] = coords[e][order]
        valid[e] = valid[e][order]
    feats = rng.randn(b, v, CIN).astype(np.float32)
    feats[~valid] = 0.0
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


@pytest.fixture(scope="module")
def models_and_vars():
    rng = np.random.RandomState(0)
    feats, coords, valid = _scene(rng)
    # voxel_cap 2·V keeps every stage's capacity non-binding: the paths'
    # truncation semantics differ under overflow (the gather path caps
    # VOXELS per stage in linear-id order, the column path caps COLUMNS)
    # — a documented deviation; equivalence is defined where caps don't bind
    sparse = VoxelBackBone8x(grid=GRID, voxel_cap=2 * V, dtype=jnp.float32)
    column = ColumnVoxelBackBone8x(grid=GRID, voxel_cap=2 * V,
                                   dtype=jnp.float32)
    vs = sparse.init(jax.random.PRNGKey(0), feats, coords, valid, False)
    vc = column.init(jax.random.PRNGKey(0), feats, coords, valid, False)
    return sparse, column, vs, vc, (feats, coords, valid)


class TestColumnEquivalence:
    def test_param_trees_match(self, models_and_vars):
        _, _, vs, vc, _ = models_and_vars
        ps = jax.tree_util.tree_map(lambda x: x.shape, vs["params"])
        pc = jax.tree_util.tree_map(lambda x: x.shape, vc["params"])
        assert jax.tree_util.tree_structure(ps) == \
            jax.tree_util.tree_structure(pc)
        assert ps == pc

    def test_forward_dense_equal(self, models_and_vars):
        sparse, column, vs, _, (feats, coords, valid) = models_and_vars
        st_s = sparse.apply(vs, feats, coords, valid, False)
        st_c = column.apply(vs, feats, coords, valid, False)
        assert st_s.grid == st_c.grid
        d_s = np.asarray(height_compression(st_s))
        d_c = np.asarray(height_compression(st_c))
        # same active cells
        assert ((np.abs(d_s).sum(-1) > 0) == (np.abs(d_c).sum(-1) > 0)).all()
        np.testing.assert_allclose(d_c, d_s, rtol=1e-4, atol=1e-4)

    def test_forward_train_mode_equal(self, models_and_vars):
        sparse, column, vs, _, (feats, coords, valid) = models_and_vars
        st_s, mut_s = sparse.apply(vs, feats, coords, valid, True,
                                   mutable=["batch_stats"])
        st_c, mut_c = column.apply(vs, feats, coords, valid, True,
                                   mutable=["batch_stats"])
        d_s = np.asarray(height_compression(st_s))
        d_c = np.asarray(height_compression(st_c))
        np.testing.assert_allclose(d_c, d_s, rtol=1e-4, atol=2e-4)
        # BN running stats advance identically (same masked statistics)
        key = jax.tree_util.keystr
        for ks, kc in zip(
            sorted(jax.tree_util.tree_leaves_with_path(mut_s["batch_stats"]),
                   key=lambda t: key(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(mut_c["batch_stats"]),
                   key=lambda t: key(t[0])),
        ):
            np.testing.assert_allclose(np.asarray(kc[1]), np.asarray(ks[1]),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=key(ks[0]))

    def test_grads_equal(self, models_and_vars):
        sparse, column, vs, _, (feats, coords, valid) = models_and_vars

        def loss(params, model):
            st, _ = model.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                feats, coords, valid, True, mutable=["batch_stats"])
            return jnp.sum(height_compression(st) ** 2)

        ls, gs = jax.value_and_grad(loss)(vs["params"], sparse)
        lc, gc = jax.value_and_grad(loss)(vs["params"], column)
        np.testing.assert_allclose(float(lc), float(ls), rtol=1e-4)
        flat_s = jax.tree_util.tree_leaves_with_path(gs)
        flat_c = dict(
            (jax.tree_util.keystr(p), g)
            for p, g in jax.tree_util.tree_leaves_with_path(gc))
        for path, g_ref in flat_s:
            g_col = flat_c[jax.tree_util.keystr(path)]
            np.testing.assert_allclose(
                np.asarray(g_col), np.asarray(g_ref), rtol=1e-3, atol=1e-3,
                err_msg=jax.tree_util.keystr(path))
