"""A/B: gather-GEMM vs column-sparse VoxelBackBone8x on the real chip.

Times a full backbone train step (fwd + grads) at the SECOND bench shapes
(60k voxels, B=2, KITTI 0.05 m grid — bench.py's second_60kvox target) for
both formulations. One JSON line per arm.

Usage: python tools/dev/ab_column.py [--voxels 60000] [--batch 2] [--arms column,gather]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=60000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--arms", type=str, default="column,gather")
    ap.add_argument("--nx", type=int, default=1408)
    ap.add_argument("--ny", type=int, default=1600)
    ap.add_argument("--nz", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dfu3d_tpu.core.voxel.sparse_ops import SparseGrid
    from dfu3d_tpu.models.column_sparse import ColumnVoxelBackBone8x
    from dfu3d_tpu.models.sparse_backbone import (
        VoxelBackBone8x, height_compression)

    grid = SparseGrid(args.nx, args.ny, args.nz)
    b, v = args.batch, args.voxels
    rng = np.random.RandomState(0)
    # unique cells per element (voxelizer invariant)
    coords = np.zeros((b, v, 3), np.int32)
    for e in range(b):
        # oversample-and-unique: exact uniqueness at 60k of ~90M cells is
        # nearly free this way, vs rng.choice(replace=False) permuting the
        # whole 90M-cell index space (~720 MB) per element
        lin = np.unique(rng.randint(0, grid.num_cells, size=2 * v))
        rng.shuffle(lin)
        lin = lin[:v]
        assert lin.size == v, "oversample produced too few unique cells"
        coords[e, :, 0] = lin % grid.nx
        coords[e, :, 1] = (lin // grid.nx) % grid.ny
        coords[e, :, 2] = lin // (grid.nx * grid.ny)
        # column-major slot order (z fastest) — the voxelizer invariant the
        # columnar cell maps rely on (sparse_ops.ColumnMap)
        key = (coords[e, :, 1].astype(np.int64) * grid.nx
               + coords[e, :, 0]) * grid.nz + coords[e, :, 2]
        coords[e] = coords[e][np.argsort(key)]
    feats = rng.randn(b, v, 4).astype(np.float32)
    valid = np.ones((b, v), bool)
    feats_d = jax.device_put(jnp.asarray(feats))
    coords_d = jax.device_put(jnp.asarray(coords))
    valid_d = jax.device_put(jnp.asarray(valid))

    for arm in args.arms.split(","):
        cls = ColumnVoxelBackBone8x if arm == "column" else VoxelBackBone8x
        model = cls(grid=grid, voxel_cap=v, dtype=jnp.bfloat16)
        t0 = time.time()
        variables = jax.jit(
            lambda f, c, vl: model.init(jax.random.PRNGKey(0), f, c, vl, True)
        )(feats_d, coords_d, valid_d)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready(), variables)
        init_s = time.time() - t0

        def loss_fn(params, bs, f, c, vl):
            st, mut = model.apply(
                {"params": params, "batch_stats": bs}, f, c, vl, True,
                mutable=["batch_stats"])
            return jnp.sum(
                height_compression(st).astype(jnp.float32) ** 2), mut

        @jax.jit
        def step(params, bs, f, c, vl):
            (loss, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bs, f, c, vl)
            gn = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                     for x in jax.tree_util.tree_leaves(g))
            return loss, gn

        t0 = time.time()
        loss, gn = step(variables["params"], variables["batch_stats"],
                        feats_d, coords_d, valid_d)
        jax.device_get(loss)
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(8):
                loss, gn = step(variables["params"],
                                variables["batch_stats"],
                                feats_d, coords_d, valid_d)
            jax.device_get(loss)
            times.append((time.time() - t0) / 8)
        print(json.dumps({
            "arm": arm, "voxels": v, "batch": b,
            "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "step_ms_best": round(min(times) * 1e3, 1),
            "step_ms_median": round(float(np.median(times)) * 1e3, 1),
            "loss": float(jax.device_get(loss)),
            "grad_l1": float(jax.device_get(gn)),
        }), flush=True)


if __name__ == "__main__":
    main()
