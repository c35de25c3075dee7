"""Per-op device profile of the SECOND sparse-path train step (dev tool).

Captures a jax.profiler trace of the compiled step at the bench shapes
(60k voxels, B=2, tools/cfgs/kitti_models/second.yaml) and aggregates
device-plane op durations via jax.profiler.ProfileData — the op-level
breakdown that guides the sparse-path optimization work (VERDICT r3 item 1).

Usage: python tools/dev/profile_second.py [--voxels 60000] [--batch 2] [--top 50]
"""
import argparse
import collections
import glob
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[2]))


def build_step(voxels: int, batch: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from dfu3d_tpu.core.voxel import VoxelGrid
    from dfu3d_tpu.models import build_network
    from dfu3d_tpu.train import build_optimizer, create_train_state
    from dfu3d_tpu.train.train_state import make_train_step
    from dfu3d_tpu.utils.config import CfgDict, cfg_from_yaml_file

    cfg = CfgDict()
    cfg_from_yaml_file(
        Path(__file__).parents[2] / "tools/cfgs/kitti_models/second.yaml", cfg
    )
    grid = VoxelGrid.create(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, [0.05, 0.05, 0.1])
    model = build_network(cfg.MODEL, cfg.CLASS_NAMES, grid,
                          dtype=jnp.bfloat16, max_voxels=voxels)
    b = jax.device_put(_synthetic_batch(batch, 120000, 128, 60.0))
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000)
    state = create_train_state(model, b, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    return step, state, b


def profile(step, state, batch, iters=3):
    import jax

    state, metrics = step(state, batch)
    jax.device_get(metrics["loss"])  # compile + fence
    tmp = tempfile.mkdtemp(prefix="prof_second_")
    jax.profiler.start_trace(tmp)
    for _ in range(iters):
        state, metrics = step(state, batch)
    jax.device_get(metrics["loss"])
    jax.profiler.stop_trace()
    return tmp, iters


def aggregate(tmpdir: str, iters: int, top: int):
    import jax

    files = glob.glob(f"{tmpdir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {tmpdir}"
    data = jax.profiler.ProfileData.from_file(files[0])
    per_op = collections.Counter()
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step lines / annotations skipped
            if "step" in lname or "framework" in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6 / iters
                per_op[ev.name] += dur
                total += dur
    print(f"\n== device op time (ms/step, {iters} steps averaged) ==")
    print(f"{'ms':>9}  {'%':>5}  op")
    for name, ms in per_op.most_common(top):
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}  {name[:150]}")
    print(f"{total:9.3f}  total device op time")
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxels", type=int, default=60000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--top", type=int, default=50)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    step, state, batch = build_step(args.voxels, args.batch)
    tmp, iters = profile(step, state, batch, args.iters)
    per_op, total = aggregate(tmp, iters, args.top)

    from profile_flagship import categorize

    by_cat = collections.Counter()
    for name, ms in per_op.items():
        if name.startswith("jit_"):
            continue
        by_cat[categorize(name)] += ms
    print("\n== by category (ms/step, async copies double-counted) ==")
    for cat, ms in by_cat.most_common():
        print(f"{ms:9.3f}  {cat}")


if __name__ == "__main__":
    main()
