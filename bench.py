"""Benchmark: CenterPoint train samples/sec/chip + SECOND sparse path + MFU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
measured against this repo's own pinned first benchmark (bench_baseline.json,
recorded round 1 = 517 samples/s); later rounds show speedup over round 1.

Methodology: batches live on device (host transfer overlaps compute in real
training), state buffers are donated, and 25-step chained loops are timed.
The headline `value` times the trainer's steps_per_dispatch scan path (25
real train steps inside one device program — trainer.py's production loop);
`dispatched_value` times one dispatch per step, which on the tunneled chip
pays ~10 ms/step of host round-trip. The axon-tunneled chip shows large
run-to-run variance (~2.5×), so BOTH the best and the median of the trials
are reported; `value` is the best (the achievable-throughput estimator),
`median_value` bounds the variance story.
`mfu_pct` is XLA's own cost-analysis flops for the compiled step divided by
wall time and the v5e bf16 peak (197 TFLOP/s) — a roofline sanity figure, not
a marketing number (the flagship step is scatter/BW-bound, not MXU-bound).
"""
import json
import time
from pathlib import Path

import numpy as np

BASELINE_FILE = Path(__file__).parent / "bench_baseline.json"
V5E_BF16_PEAK = 197e12
V5E_HBM_PEAK = 819e9  # bytes/s


def _time_step(step, state, batch, trials=4, iters=25):
    import jax

    state, metrics = step(state, batch)
    # device_get, NOT block_until_ready: the axon tunnel's block_until_ready
    # returns early; fetching the scalar is the only reliable fence
    jax.device_get(metrics["loss"])
    times = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            state, metrics = step(state, batch)
        jax.device_get(metrics["loss"])
        times.append((time.time() - t0) / iters)
    return min(times), float(np.median(times)), state


def _time_multi_step(model, tx, state, batch, trials=4, iters=25):
    """Time the trainer's steps_per_dispatch scan path (one dispatch = iters
    real train steps over per-step batch copies — the production loop)."""
    import jax

    from dfu3d_tpu.train.train_state import make_multi_train_step

    stacked = jax.tree_util.tree_map(
        lambda x: jax.numpy.broadcast_to(x[None], (iters,) + x.shape), batch
    )
    mstep = jax.jit(make_multi_train_step(model, tx, iters), donate_argnums=0)
    state, metrics = mstep(state, stacked)
    jax.device_get(metrics["loss"])
    times = []
    for _ in range(trials):
        t0 = time.time()
        state, metrics = mstep(state, stacked)
        jax.device_get(metrics["loss"])
        times.append((time.time() - t0) / iters)
    return min(times), float(np.median(times)), state


def bench_flagship():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _synthetic_batch
    from dfu3d_tpu.train import build_optimizer, create_train_state
    from dfu3d_tpu.train.train_state import make_train_step

    cfg, grid, model = _flagship(dtype=jnp.bfloat16)
    B, N, M = 4, 60000, 256
    batch = jax.device_put(_synthetic_batch(B, N, M, 50.0))
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000)
    state = create_train_state(model, batch, tx)
    step_fn = make_train_step(model, tx)
    lowered = jax.jit(step_fn, donate_argnums=0).lower(state, batch)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        flops = float(cost["flops"])
    except Exception:
        cost, flops = {}, float("nan")
    # "bytes accessed" is XLA's post-fusion HBM operand+output traffic estimate
    # for the whole step — bytes/wall vs the v5e HBM peak (819 GB/s) is the
    # memory-roofline twin of mfu_pct (VERDICT r2: "BW-bound" must be measured)
    hbm_bytes = float(cost.get("bytes accessed", float("nan")))
    step = jax.jit(step_fn, donate_argnums=0)
    disp_best, _, state = _time_step(step, state, batch, trials=2, iters=10)
    best, median, _ = _time_multi_step(model, tx, state, batch)
    return (B / best, B / median, flops / best if np.isfinite(flops) else None,
            B / disp_best,
            hbm_bytes / best if np.isfinite(hbm_bytes) else None)


def bench_second():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from dfu3d_tpu.core.voxel import VoxelGrid
    from dfu3d_tpu.models import build_network
    from dfu3d_tpu.train import build_optimizer, create_train_state
    from dfu3d_tpu.utils.config import CfgDict, cfg_from_yaml_file

    cfg = CfgDict()
    cfg_from_yaml_file(
        Path(__file__).parent / "tools/cfgs/kitti_models/second.yaml", cfg
    )
    grid = VoxelGrid.create(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, [0.05, 0.05, 0.1])
    model = build_network(cfg.MODEL, cfg.CLASS_NAMES, grid,
                          dtype=jnp.bfloat16, max_voxels=60000)
    B = 2
    batch = jax.device_put(_synthetic_batch(B, 120000, 128, 60.0))
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000)
    state = create_train_state(model, batch, tx)
    # same methodology as the flagship headline: time the trainer's
    # steps_per_dispatch scan path (the production loop), which amortizes the
    # tunneled chip's per-dispatch host round trip
    best, median, _ = _time_multi_step(model, tx, state, batch,
                                       trials=3, iters=8)
    return best, median


def main():
    import gc
    import sys
    import traceback

    sps_best, sps_median, flops_per_sec, sps_dispatched, bytes_per_sec = (
        bench_flagship()
    )
    # drop the flagship state/compiled-step before the SECOND bench: the 60k
    # sparse step's compile needs headroom on the 16 GB chip, and jit caches
    # keep donated buffers alive until cleared
    import jax

    jax.clear_caches()
    gc.collect()
    try:
        sec_best, sec_median = bench_second()
    except Exception:
        # keep stdout as the single JSON line; failures must be visible
        traceback.print_exc(file=sys.stderr)
        sec_best = sec_median = None

    if BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text())["samples_per_sec"]
    else:
        baseline = sps_best
        BASELINE_FILE.write_text(json.dumps({"samples_per_sec": sps_best}))

    out = {
        "metric": "centerpoint_train_samples_per_sec_per_chip",
        "value": round(sps_best, 2),
        "unit": "samples/s",
        "vs_baseline": round(sps_best / baseline, 3),
        "median_value": round(sps_median, 2),
        "dispatched_value": round(sps_dispatched, 2),
        "second_60kvox_ms_per_step_best": (
            round(sec_best * 1e3, 1) if sec_best else None
        ),
        "second_60kvox_ms_per_step_median": (
            round(sec_median * 1e3, 1) if sec_median else None
        ),
    }
    if flops_per_sec:
        out["mfu_pct"] = round(100 * flops_per_sec / V5E_BF16_PEAK, 2)
    if bytes_per_sec:
        out["bw_pct"] = round(100 * bytes_per_sec / V5E_HBM_PEAK, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
