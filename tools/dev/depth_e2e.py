"""Depth-completion leg wired into the factory e2e (VERDICT r4 item 6).

On one synthetic KITTI set, measures pseudo-box factory quality
(tools/e2e_synthetic.factory_quality: per-class precision/recall at BEV
IoU 0.5) under three depth sources:

  gt        — the synthesizer's dense depth (the factory's upper bound)
  sparse    — raw LiDAR-projected sparse depth (no completion; what the
              factory sees if the depth leg is skipped)
  completed — tools/train_depth.py-trained ENet run through
              tools/complete_depth.py --ckpt (the reference pipeline's
              PENet pass, tools/PENet/main.py train→evaluate)

Emits one JSON line per arm + writes DEPTH_E2E_r05.json at the repo root.

Usage: python tools/dev/depth_e2e.py [--frames 24] [--epochs 12]
"""
import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def run_factory(root, env):
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "generate_pseudo_boxes.py"),
         "--detpath", str(root), "--ground_z", "-1.7", "--z_offset", "0.0",
         "--classes", "Car"],
        capture_output=True, text=True, timeout=3600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]


def main():
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--workdir", type=str, default="/tmp/dfu3d_depth_e2e")
    args = ap.parse_args()

    from e2e_synthetic import factory_quality

    from dfu3d_tpu.pseudo.synthetic import make_dataset

    work = Path(args.workdir)
    root = work / "data"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + ":" + env.get("PYTHONPATH", "")

    if not (root / "ImageSets" / "train.txt").exists():
        make_dataset(root, n_train=args.frames, n_val=2,
                     class_names=("Car",))
    ids = sorted(p.stem for p in (root / "velodyne").glob("*.bin"))

    # preserve the GT depth (arms overwrite depth/)
    gt_dir = root / "depth_gt"
    if not gt_dir.exists():
        shutil.copytree(root / "depth", gt_dir)

    results = {}

    def arm(name):
        run_factory(root, env)
        q = factory_quality(root, ["Car"])
        results[name] = q
        print(json.dumps({"arm": name, **q}), flush=True)

    # 1. GT dense depth
    for i in ids:
        shutil.copy(gt_dir / f"{i}.npy", root / "depth" / f"{i}.npy")
    arm("gt_depth")

    # 2. sparse LiDAR-projected depth (no completion)
    from complete_depth import sparse_depth_from_lidar

    from dfu3d_tpu.data import kitti_io
    from dfu3d_tpu.core.geometry.calibration import Calibration

    for i in ids:
        lidar = kitti_io.read_velodyne_bin(root / "velodyne" / f"{i}.bin")
        calib = Calibration(str(root / "calib" / f"{i}.txt"))
        h, w = np.load(gt_dir / f"{i}.npy").shape
        np.save(root / "depth" / f"{i}.npy",
                sparse_depth_from_lidar(lidar, calib, h, w))
    arm("sparse_depth")

    # 3. trained ENet completion (train on matched synthetic frames, then
    #    complete this set's frames from sparse input)
    out = work / "depth_run"
    if not (out / "best_ckpt").exists():
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "train_depth.py"),
             "--synthetic", str(max(32, 2 * args.frames)),
             "--epochs", str(args.epochs), "--model", "enet",
             "--out", str(out)],
            capture_output=True, text=True, timeout=7200, env=env)
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
        print(r.stdout.strip().splitlines()[-3:], flush=True)
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "complete_depth.py"),
         "--detpath", str(root), "--ckpt", str(out / "best_ckpt")],
        capture_output=True, text=True, timeout=3600, env=env)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    arm("completed_depth")

    summary = {
        "date": "2026-08-21",
        "protocol": (
            "tools/dev/depth_e2e.py: one synthetic KITTI set "
            f"({args.frames} frames, Car), factory quality (precision/"
            "recall @ BEV IoU 0.5) per depth source; completed = in-repo "
            "ENet trained via tools/train_depth.py --synthetic, applied "
            "via tools/complete_depth.py --ckpt"),
        "epochs": args.epochs,
        "arms": results,
    }
    (REPO / "DEPTH_E2E_r05.json").write_text(json.dumps(summary, indent=1))
    print("wrote DEPTH_E2E_r05.json", flush=True)


if __name__ == "__main__":
    main()
