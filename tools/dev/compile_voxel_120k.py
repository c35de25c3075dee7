"""Compile + run voxel-CenterPoint at the reference's 120k-voxel train cap.

The reference trains cbgs_voxel0075_res3d_centerpoint with
MAX_NUMBER_OF_VOXELS train=120000 (reference
tools/cfgs/nuscenes_models/cbgs_voxel0075_res3d_centerpoint.yaml and
nuscenes2kitti_dataset_centerpoint.yaml:76-83). This tool proves the TPU
sparse path (VoxelResBackBone8x gather-GEMM, models/sparse_backbone.py)
compiles and steps at that capacity on real hardware: it builds the model
from the shipped YAML at max_voxels=120000 over the true 0.075 m grid,
jits the full train step (loss + grads + optimizer update), runs it, and
prints compile time / step wall / XLA cost analysis as one JSON line.

Usage: python tools/dev/compile_voxel_120k.py [--batch 2] [--voxels 120000]
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--voxels", type=int, default=120000)
    ap.add_argument("--points", type=int, default=200000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dfu3d_tpu.core.voxel import VoxelGrid
    from dfu3d_tpu.data.dataset import PointBatch
    from dfu3d_tpu.models import build_network
    from dfu3d_tpu.train import build_optimizer, create_train_state
    from dfu3d_tpu.train.train_state import make_train_step
    from dfu3d_tpu.utils.config import CfgDict, cfg_from_yaml_file

    root = Path(__file__).resolve().parents[2]
    cfg = CfgDict()
    cfg_from_yaml_file(
        root / "tools/cfgs/nuscenes_models/cbgs_voxel0075_res3d_centerpoint.yaml",
        cfg,
    )
    pcr = [float(v) for v in cfg.DATA_CONFIG.POINT_CLOUD_RANGE]
    # Derive the voxel size from the config's own processor entry (like
    # tools/train.py) so this probe always measures the training grid.
    voxel_size = [0.075, 0.075, 0.2]
    for proc in cfg.DATA_CONFIG.get("DATA_PROCESSOR", []):
        if str(proc.get("NAME", "")).startswith("transform_points_to_voxels"):
            voxel_size = [float(v) for v in proc["VOXEL_SIZE"]]
    grid = VoxelGrid.create(pcr, voxel_size)
    model = build_network(cfg.MODEL, cfg.CLASS_NAMES, grid,
                          dtype=jnp.bfloat16, max_voxels=args.voxels)

    b, n, m = args.batch, args.points, 128
    nc = len(cfg.CLASS_NAMES)
    rng = np.random.RandomState(0)
    pts = np.zeros((b, n, 5), np.float32)
    for i in range(3):
        pts[..., i] = rng.uniform(pcr[i], pcr[3 + i], (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    pts[..., 4] = rng.randint(0, 4, (b, n)).astype(np.float32) * 0.05
    gt = np.zeros((b, m, 10), np.float32)  # velocity head → 10-wide gt
    for i in range(2):
        gt[..., i] = rng.uniform(pcr[i] + 3, pcr[3 + i] - 3, (b, m))
    gt[..., 2] = rng.uniform(-2, 0, (b, m))
    gt[..., 3:6] = rng.uniform(0.5, 5, (b, m, 3))
    gt[..., 6] = rng.uniform(-3, 3, (b, m))
    gt[..., 7:9] = rng.uniform(-3, 3, (b, m, 2))
    gt[..., 9] = rng.randint(1, nc + 1, (b, m))
    batch = jax.device_put(PointBatch(
        pts, np.ones((b, n), bool), gt, np.ones((b, m), bool)))

    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000)
    state = create_train_state(model, batch, tx)
    t0 = time.time()
    lowered = jax.jit(make_train_step(model, tx), donate_argnums=0).lower(
        state, batch)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        cost = compiled.cost_analysis()
    except Exception:
        cost = {}
    state, metrics = compiled(state, batch)
    loss0 = float(jax.device_get(metrics["loss"]))
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(4):
            state, metrics = compiled(state, batch)
        jax.device_get(metrics["loss"])
        times.append((time.time() - t0) / 4)
    print(json.dumps({
        "config": "cbgs_voxel0075_res3d_centerpoint",
        "max_voxels": args.voxels,
        "batch": b,
        "grid": list(grid.grid_size),
        "compile_s": round(compile_s, 1),
        "step_ms_best": round(min(times) * 1e3, 1),
        "step_ms_median": round(float(np.median(times)) * 1e3, 1),
        "loss": round(loss0, 3),
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
    }))


if __name__ == "__main__":
    main()
