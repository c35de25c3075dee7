"""Per-op device profile of the FLAGSHIP (CenterPoint-pillar) train step.

Same harness as profile_second.py but at bench.py's flagship shapes
(B=4, 60k points/frame, centerpoint_nuscenes2kitti.yaml). Guides the
VFE-compaction byte-reduction work (VERDICT r4 item 2): the flagship is
memory-bound (bw_pct ~90), so the per-op time breakdown IS the byte budget
up to the HBM bandwidth constant.

With --bytes, also emits BYTES_r*.json-style per-op rows: measured ms/step,
implied bytes at the v5e HBM peak, and the op category.

Usage: python tools/dev/profile_flagship.py [--batch 4] [--top 60] [--json out.json]
"""
import argparse
import collections
import glob
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[2]))

V5E_HBM_PEAK = 819e9  # bytes/s


def build_step(batch: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship, _synthetic_batch
    from dfu3d_tpu.train import build_optimizer, create_train_state
    from dfu3d_tpu.train.train_state import make_train_step

    cfg, grid, model = _flagship(dtype=jnp.bfloat16)
    b = jax.device_put(_synthetic_batch(batch, 60000, 256, 50.0))
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000)
    state = create_train_state(model, b, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    lowered = step.lower(state, b)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
    except Exception:
        cost = {}
    return step, state, b, cost


def profile(step, state, batch, iters=3):
    import jax

    state, metrics = step(state, batch)
    jax.device_get(metrics["loss"])  # compile + fence
    tmp = tempfile.mkdtemp(prefix="prof_flagship_")
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


CATEGORIES = (
    ("sort", "sort"),
    ("gather", "gather"),
    ("scatter", "scatter"),
    ("convolution", "conv"),
    ("conv", "conv"),
    ("dot", "matmul"),
    ("reduce", "reduce"),
    ("dynamic-update", "scatter"),
    ("dynamic_update", "scatter"),
    ("copy", "copy"),
    ("transpose", "copy"),
    ("all-reduce", "collective"),
)


def categorize(name: str) -> str:
    low = name.lower()
    for key, cat in CATEGORIES:
        if key in low:
            return cat
    return "fusion/other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()
    step, state, batch, cost = build_step(args.batch)
    tmp, iters = profile(step, state, batch, args.iters)
    per_op, total = aggregate(tmp, iters, args.top)

    by_cat = collections.Counter()
    for name, ms in per_op.items():
        by_cat[categorize(name)] += ms
    print("\n== by category (ms/step) ==")
    for cat, ms in by_cat.most_common():
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}%  {cat}")

    if args.json:
        rows = [
            {
                "op": name,
                "ms_per_step": round(ms, 4),
                "category": categorize(name),
                "implied_bytes_at_hbm_peak": int(ms / 1e3 * V5E_HBM_PEAK),
            }
            for name, ms in per_op.most_common(args.top)
        ]
        out = {
            "shapes": {"batch": args.batch, "points": 60000},
            "total_device_ms_per_step": round(total, 3),
            "xla_cost_analysis": {
                k: float(v)
                for k, v in cost.items()
                if k in ("flops", "bytes accessed", "transcendentals")
            },
            "by_category_ms": {k: round(v, 3) for k, v in by_cat.items()},
            "ops": rows,
        }
        Path(args.json).write_text(json.dumps(out, indent=1))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
