"""Depth-completion metric suite (reference tools/PENet/metrics.py:13-180 +
helper.py:9-14 csv fieldnames).

The reference evaluates completed depth with a `Result` object computing
RMSE/MAE (mm), iRMSE/iMAE (1/km), absrel, squared_rel, lg10, delta1-3 and
silog over valid (gt > 0.1 m) pixels, accumulated by an `AverageMeter` and
logged to train.csv/val.csv by `helper.logger`. This is the TPU-native
equivalent: one jit-friendly masked-reduction function plus a host-side
accumulator and csv writer. Semantics are pinned against the reference's own
torch implementation in tests/test_depth_completion.py.
"""
from __future__ import annotations

import csv
import math
from pathlib import Path

import jax.numpy as jnp
import numpy as np

# csv schema from reference helper.py:9-14 (fieldnames), minus the photometric
# / timing entries the reference itself leaves at 0 in depth-only training
DEPTH_CSV_FIELDS = [
    "epoch", "rmse", "photo", "mae", "irmse", "imae", "mse", "absrel",
    "lg10", "silog", "squared_rel", "delta1", "delta2", "delta3",
    "data_time", "gpu_time",
]

METRIC_KEYS = [
    "irmse", "imae", "mse", "rmse", "mae", "absrel", "squared_rel", "lg10",
    "delta1", "delta2", "delta3", "silog",
]


def evaluate_depth(pred, target):
    """Masked depth metrics (reference metrics.py Result.evaluate:65-102).

    pred/target: arrays of identical shape, metres; valid = target > 0.1 m.
    Returns a dict of scalars (jnp inside jit, floats after device_get):
    mse/rmse/mae in mm, irmse/imae in 1/km, absrel/squared_rel/lg10/deltas
    dimensionless, silog in log(m)*100.
    """
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    valid = target > 0.1
    n = jnp.maximum(jnp.sum(valid), 1)

    def vmean(x):
        return jnp.sum(jnp.where(valid, x, 0.0)) / n

    out_mm = 1e3 * pred
    tgt_mm = 1e3 * target
    abs_diff = jnp.abs(out_mm - tgt_mm)

    mse = vmean(abs_diff ** 2)
    mae = vmean(abs_diff)
    # log/ratio terms are only read under the mask; clamp to keep them finite
    safe_out = jnp.maximum(out_mm, 1e-6)
    lg10 = vmean(jnp.abs(jnp.log10(safe_out) - jnp.log10(jnp.maximum(tgt_mm, 1e-6))))
    absrel = vmean(abs_diff / jnp.maximum(tgt_mm, 1e-6))
    squared_rel = vmean((abs_diff / jnp.maximum(tgt_mm, 1e-6)) ** 2)

    ratio = jnp.maximum(safe_out / jnp.maximum(tgt_mm, 1e-6),
                        tgt_mm / safe_out)
    delta1 = vmean((ratio < 1.25).astype(jnp.float32))
    delta2 = vmean((ratio < 1.25 ** 2).astype(jnp.float32))
    delta3 = vmean((ratio < 1.25 ** 3).astype(jnp.float32))

    err_log = jnp.log(jnp.maximum(target, 1e-9)) - jnp.log(
        jnp.maximum(pred, 1e-9))
    nsl = vmean(err_log ** 2)
    log_mean = vmean(err_log)
    silog = jnp.sqrt(jnp.maximum(nsl - log_mean ** 2, 0.0)) * 100.0

    inv_out_km = 1.0 / jnp.maximum(1e-3 * pred, 1e-9)
    inv_tgt_km = 1.0 / jnp.maximum(1e-3 * target, 1e-9)
    abs_inv = jnp.abs(inv_out_km - inv_tgt_km)
    irmse = jnp.sqrt(vmean(abs_inv ** 2))
    imae = vmean(abs_inv)

    return {
        "irmse": irmse, "imae": imae, "mse": mse, "rmse": jnp.sqrt(mse),
        "mae": mae, "absrel": absrel, "squared_rel": squared_rel,
        "lg10": lg10, "delta1": delta1, "delta2": delta2, "delta3": delta3,
        "silog": silog,
    }


class DepthAverageMeter:
    """Count-weighted accumulator (reference metrics.py AverageMeter:105-150,
    without the gpu-timing warmup machinery — timing is tracked separately)."""

    def __init__(self):
        self.count = 0.0
        self.sums = {k: 0.0 for k in METRIC_KEYS}

    def update(self, result: dict, n: int = 1):
        self.count += n
        for k in METRIC_KEYS:
            self.sums[k] += n * float(result[k])

    def average(self) -> dict:
        if self.count == 0:
            return {k: math.inf for k in METRIC_KEYS}
        return {k: self.sums[k] / self.count for k in METRIC_KEYS}


class DepthCsvLogger:
    """train.csv / val.csv / best.txt writer (reference helper.logger:17-143).

    Keeps the reference's csv schema so downstream tooling reading PENet run
    directories keeps working; `is_best` uses the reference's rmse criterion
    (helper.rank_conditional_save_best)."""

    def __init__(self, output_dir):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.best_rmse = math.inf
        for split in ("train", "val"):
            p = self.output_dir / f"{split}.csv"
            if not p.exists():
                with open(p, "w", newline="") as f:
                    csv.DictWriter(f, fieldnames=DEPTH_CSV_FIELDS).writeheader()

    def append(self, split: str, epoch: int, avg: dict,
               data_time: float = 0.0, gpu_time: float = 0.0) -> bool:
        row = {"epoch": epoch, "photo": 0.0,
               "data_time": round(data_time, 4), "gpu_time": round(gpu_time, 4)}
        row.update({k: round(avg[k], 6) for k in METRIC_KEYS})
        with open(self.output_dir / f"{split}.csv", "a", newline="") as f:
            csv.DictWriter(f, fieldnames=DEPTH_CSV_FIELDS).writerow(row)
        is_best = split == "val" and avg["rmse"] < self.best_rmse
        if is_best:
            self.best_rmse = avg["rmse"]
            (self.output_dir / "best.txt").write_text(
                "epoch={}\nrmse={:.3f}\nmae={:.3f}\nirmse={:.3f}\nimae={:.3f}\n"
                "silog={:.3f}\nsquared_rel={:.6f}\ndelta1={:.4f}\nabsrel={:.6f}\n"
                "lg10={:.6f}\n".format(
                    epoch, avg["rmse"], avg["mae"], avg["irmse"], avg["imae"],
                    avg["silog"], avg["squared_rel"], avg["delta1"],
                    avg["absrel"], avg["lg10"]))
        return is_best


def evaluate_depth_np(pred: np.ndarray, target: np.ndarray) -> dict:
    """Host/numpy convenience wrapper returning plain floats."""
    return {k: float(v) for k, v in evaluate_depth(pred, target).items()}


# ---------------------------------------------------------------------------
# Image-comparison logger (reference helper.logger.conditional_save_img_
# comparison + vis_utils.merge_into_row, tools/PENet/helper.py:129-154 /
# vis_utils.py:23-90): per val epoch, up to 8 rows of
# [rgb | colorized sparse input | colorized prediction | colorized gt]
# written as comparison_<epoch>.png, re-saved as comparison_best.png when
# the epoch sets a new best. jet colormap like the reference's plt.cm.jet;
# PIL instead of cv2 (absent here).
# ---------------------------------------------------------------------------


def _depth_colorize(depth: np.ndarray) -> np.ndarray:
    """(H, W) metric depth → (H, W, 3) uint8 jet (vis_utils.depth_colorize)."""
    from matplotlib import cm

    d = np.asarray(depth, np.float32)
    lo, hi = float(np.min(d)), float(np.max(d))
    d = (d - lo) / max(hi - lo, 1e-6)
    return (255 * cm.jet(d)[:, :, :3]).astype(np.uint8)


def comparison_row(rgb, sparse_d, pred, gt) -> np.ndarray:
    """One comparison row (vis_utils.merge_into_row: rgb, d, pred, gt)."""
    rgb8 = np.asarray(rgb)
    if rgb8.dtype != np.uint8:
        rgb8 = np.clip(rgb8 * (255.0 if rgb8.max() <= 1.5 else 1.0),
                       0, 255).astype(np.uint8)
    parts = [rgb8, _depth_colorize(np.asarray(sparse_d)),
             _depth_colorize(np.asarray(pred)),
             _depth_colorize(np.asarray(gt))]
    return np.hstack(parts)


def save_img_comparison(path, rows) -> None:
    """Stack rows (vis_utils.add_row) and write a png (save_image)."""
    from PIL import Image

    if not rows:
        return
    Image.fromarray(np.vstack(rows)).save(str(path))
