"""Depth-completion training driver (reference tools/PENet/main.py train mode).

Trains the in-repo ENet / PENetC1 / PENetC2 nets so `complete_depth.py --ckpt`
has something to load. Mirrors the reference protocol:

* criterion: masked L2 (default) or masked L1 (main.py:199-200,
  criteria.py:6-30);
* ENet stage supervision: loss = (1-w1-w2)*fused + w1*cd + w2*dd with the
  reference's epoch schedule w=(0.2,0.2) for epoch<=1, (0.05,0.05) for
  epoch<=3, then fused-only (main.py:296-315);
* PENet (CSPN-refined) supervision on the refined output only, with optional
  frozen backbone (main.py:145-146, 432);
* LR: Adam with the reference's step decay (helper.py:216-239 — the 'pe'
  schedule when training a CSPN variant, the 'e' schedule otherwise);
* metrics/logging: RMSE/MAE/iRMSE/iMAE/... accumulated per epoch and written
  to train.csv / val.csv / best.txt in the reference's schema
  (eval/depth_metrics.py ~ metrics.py Result + helper.logger).

Supervision source (this container mounts no KITTI depth GT): `--gt_dir` uses
dense GT maps when available (reference KITTI depth-completion groundtruth);
otherwise each frame's LiDAR depth pixels are randomly split into input
(keep_frac) and held-out supervision — the sparse-GT regime the KITTI
completion benchmark itself approximates with accumulated sweeps.

Usage:
  python tools/train_depth.py --detpath data/.../train_28130 --epochs 5
  python tools/train_depth.py --synthetic 32 --epochs 3   # no data needed
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dfu3d_tpu.utils.common import maybe_force_platform

maybe_force_platform()


def stage_weights(epoch: int):
    """ENet deep-supervision weights (reference main.py:296-303)."""
    if epoch <= 1:
        return 0.2, 0.2
    if epoch <= 3:
        return 0.05, 0.05
    return 0.0, 0.0


def lr_for_epoch(lr_init: float, epoch: int, cspn: bool) -> float:
    """Step decay (reference helper.adjust_learning_rate:216-239)."""
    lr = lr_init
    if cspn:
        for e, f in ((10, 0.5), (20, 0.1), (30, 0.01), (40, 5e-4), (50, 1e-5)):
            if epoch >= e:
                lr = lr_init * f
    else:
        for e, f in ((10, 0.5), (15, 0.1), (25, 0.01)):
            if epoch >= e:
                lr = lr_init * f
    return lr


def synthetic_frame(rng, h, w):
    """Piecewise-planar depth + shaded rgb: a cheap scene with real structure
    (planes at varied slopes) so completion from sparse samples is learnable."""
    vv, uu = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    depth = np.full((h, w), 20.0, np.float32)
    depth += 10.0 * vv / h * rng.uniform(0.5, 1.5)
    for _ in range(4):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        rw, rh = rng.uniform(w * 0.1, w * 0.4), rng.uniform(h * 0.1, h * 0.4)
        box = (np.abs(uu - cx) < rw) & (np.abs(vv - cy) < rh)
        depth[box] = rng.uniform(3.0, 15.0)
    rgb = np.stack([depth / 30.0] * 3, axis=-1)
    rgb += rng.normal(0, 0.02, rgb.shape).astype(np.float32)
    return rgb.astype(np.float32), depth


def load_kitti_frame(root: Path, idx: str, h: int, w: int, gt_dir):
    from PIL import Image

    from dfu3d_tpu.core.geometry.calibration import Calibration
    from dfu3d_tpu.data import kitti_io
    from tools.complete_depth import sparse_depth_from_lidar

    calib = Calibration(root / "calib" / f"{idx}.txt")
    lidar = kitti_io.read_velodyne_bin(root / "velodyne" / f"{idx}.bin")
    img = Image.open(root / "image_2" / f"{idx}.png").convert("RGB")
    full_w, full_h = img.size
    left, top = max((full_w - w) // 2, 0), max(full_h - h, 0)
    rgb = np.asarray(img.crop((left, top, left + w, top + h)),
                     np.float32) / 255.0
    sd = sparse_depth_from_lidar(lidar, calib, full_h, full_w)[
        top:top + h, left:left + w]
    gt = None
    if gt_dir is not None:
        p = Path(gt_dir) / f"{idx}.npy"
        if p.exists():
            gt = np.load(p)[top:top + h, left:left + w].astype(np.float32)
    intr = (calib.cu - left, calib.cv - top, calib.fu, calib.fv)
    return rgb, sd, gt, intr


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--detpath", type=str, default=None)
    ap.add_argument("--gt_dir", type=str, default=None,
                    help="dense GT depth maps <idx>.npy (KITTI depth-"
                         "completion groundtruth); default: held-out LiDAR")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train on N synthetic piecewise-planar frames")
    ap.add_argument("--model", type=str, default="enet",
                    choices=["enet", "penet_c1", "penet_c2"])
    ap.add_argument("--criterion", type=str, default="l2",
                    choices=["l1", "l2"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--keep_frac", type=float, default=0.8,
                    help="fraction of LiDAR pixels fed as input; the rest "
                         "supervise (ignored with --gt_dir)")
    ap.add_argument("--val_frac", type=float, default=0.1)
    ap.add_argument("--freeze_backbone", action="store_true",
                    help="freeze the ENet backbone when training a CSPN "
                         "variant (reference main.py --freeze-backbone)")
    ap.add_argument("--out", type=str, default="output/depth_runs/run0")
    ap.add_argument("--widths", type=int, nargs="+", default=None,
                    help="override encoder widths (small nets for tests)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from dfu3d_tpu.eval.depth_metrics import (
        DepthAverageMeter, DepthCsvLogger, evaluate_depth)
    from dfu3d_tpu.models.depth_completion import (
        ENet, PENetC1, PENetC2, masked_l1_loss, masked_l2_loss)
    from dfu3d_tpu.utils.common import create_logger

    logger = create_logger()
    rng = np.random.RandomState(args.seed)
    h, w = args.height, args.width

    # ------------------------------------------------------------------ data
    frames = []  # (rgb, sparse_in, supervision, intrinsics)
    if args.synthetic:
        for _ in range(args.synthetic):
            rgb, dense = synthetic_frame(rng, h, w)
            keep = rng.rand(h, w) < 0.05  # LiDAR-like 5% coverage
            sd = np.where(keep, dense, 0.0).astype(np.float32)
            sup = np.where(~keep, dense, 0.0).astype(np.float32)
            frames.append((rgb, sd, sup,
                           (w / 2.0, h / 2.0, 720.0, 720.0)))
    else:
        assert args.detpath, "--detpath or --synthetic required"
        root = Path(args.detpath)
        ids = sorted(p.stem for p in (root / "velodyne").glob("*.bin"))
        for idx in ids:
            rgb, sd_full, gt, intr = load_kitti_frame(
                root, idx, h, w, args.gt_dir)
            if gt is not None:
                frames.append((rgb, sd_full, gt, intr))
            else:
                keep = rng.rand(h, w) < args.keep_frac
                sd = np.where(keep & (sd_full > 0), sd_full, 0.0)
                sup = np.where(~keep & (sd_full > 0), sd_full, 0.0)
                frames.append((rgb, sd.astype(np.float32),
                               sup.astype(np.float32), intr))
    n_val = max(1, int(round(len(frames) * args.val_frac)))
    val_frames, train_frames = frames[:n_val], frames[n_val:]
    logger.info(f"depth train: {len(train_frames)} train / {n_val} val "
                f"frames @ {h}x{w}")

    # ----------------------------------------------------------------- model
    widths = tuple(args.widths) if args.widths else (32, 64, 128, 256)
    cls = {"enet": ENet, "penet_c1": PENetC1, "penet_c2": PENetC2}[args.model]
    model = cls(widths=widths, dtype=jnp.bfloat16)
    cspn = args.model != "enet"
    criterion = masked_l2_loss if args.criterion == "l2" else masked_l1_loss

    rgb0, sd0, _, (cu, cv, fu, fv) = frames[0]
    variables = model.init({"params": jax.random.PRNGKey(args.seed)},
                           jnp.asarray(rgb0[None]),
                           jnp.asarray(sd0[None, ..., None]),
                           cu, cv, fu, fv, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    # frozen-backbone mask: zero updates on the ENet trunk (reference
    # freezes `backbone` params when fine-tuning the CSPN stage)
    def trainable(path):
        return not (args.freeze_backbone and cspn and path[0] == "backbone")

    label_tree = jax.tree_util.tree_map_with_path(
        lambda p, _: "train" if trainable([k.key for k in p]) else "frozen",
        params)
    # the reference's per-epoch step decay as a per-step optax schedule;
    # the 'pe' curve applies only when training the full PENet (reference
    # helper.adjust_learning_rate:221 falls back to the 'e' curve when the
    # backbone is frozen)
    pe_decay = cspn and not args.freeze_backbone
    spe = max(1, len(train_frames))
    decay = ({10: 0.5, 20: 0.2, 30: 0.1, 40: 0.05, 50: 0.02} if pe_decay
             else {10: 0.5, 15: 0.2, 25: 0.1})
    sched = optax.piecewise_constant_schedule(
        args.lr, {e * spe: f for e, f in decay.items()})
    tx = optax.multi_transform(
        {"train": optax.adam(sched), "frozen": optax.set_to_zero()},
        label_tree)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, rgb, sd, sup, intr, w1, w2):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            rgb, sd, *intr, train=True, mutable=["batch_stats"])
        if cspn:
            refined, coarse, (cd, dd) = out
            loss = criterion(refined, sup)
            pred = refined
        else:
            fused, cd, dd = out
            loss = ((1.0 - w1 - w2) * criterion(fused, sup)
                    + w1 * criterion(cd, sup) + w2 * criterion(dd, sup))
            pred = fused
        return loss, (updates["batch_stats"], pred)

    @jax.jit
    def train_step(params, batch_stats, opt_state, rgb, sd, sup, intr,
                   w1, w2):
        (loss, (bs, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, rgb, sd, sup, intr,
                                   w1, w2)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss, pred

    @jax.jit
    def eval_step(params, batch_stats, rgb, sd, intr):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          rgb, sd, *intr, train=False)
        return out[0]

    csvlog = DepthCsvLogger(args.out)
    for epoch in range(args.epochs):
        lr = lr_for_epoch(args.lr, epoch, pe_decay)
        w1, w2 = stage_weights(epoch) if not cspn else (0.0, 0.0)
        meter, t0 = DepthAverageMeter(), time.time()
        order = rng.permutation(len(train_frames))
        for i in order:
            rgb, sd, sup, intr = train_frames[i]
            params, batch_stats, opt_state, loss, pred = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(rgb[None]), jnp.asarray(sd[None, ..., None]),
                jnp.asarray(sup[None, ..., None]), intr, w1, w2)
            meter.update(jax.device_get(
                evaluate_depth(pred[0, ..., 0], sup)))
        avg = meter.average()
        csvlog.append("train", epoch, avg, gpu_time=time.time() - t0)
        logger.info(f"epoch {epoch} lr={lr:.2e} train rmse={avg['rmse']:.1f}mm"
                    f" mae={avg['mae']:.1f}mm delta1={avg['delta1']:.3f}")

        meter = DepthAverageMeter()
        comp_rows = []
        for rgb, sd, sup, intr in val_frames:
            pred = eval_step(params, batch_stats, jnp.asarray(rgb[None]),
                             jnp.asarray(sd[None, ..., None]), intr)
            meter.update(jax.device_get(
                evaluate_depth(pred[0, ..., 0], sup)))
            if len(comp_rows) < 8:
                # reference conditional_save_img_comparison (helper.py:139):
                # up to 8 [rgb|sparse|pred|gt] rows per val epoch
                from dfu3d_tpu.eval.depth_metrics import comparison_row

                comp_rows.append(comparison_row(
                    rgb, sd, np.asarray(pred[0, ..., 0]), sup))
        from dfu3d_tpu.eval.depth_metrics import save_img_comparison

        comp_png = Path(args.out) / f"comparison_{epoch}.png"
        save_img_comparison(comp_png, comp_rows)
        avg = meter.average()
        if csvlog.append("val", epoch, avg):
            if comp_rows:
                save_img_comparison(
                    Path(args.out) / "comparison_best.png", comp_rows)
            import orbax.checkpoint as ocp

            ckpt_dir = (Path(args.out) / "best_ckpt").absolute()
            ocp.PyTreeCheckpointer().save(
                ckpt_dir,
                jax.device_get({"params": params, "batch_stats": batch_stats}),
                force=True)
            logger.info(f"  new best (val rmse {avg['rmse']:.1f}mm) → "
                        f"{ckpt_dir}")
        logger.info(f"epoch {epoch} val rmse={avg['rmse']:.1f}mm "
                    f"irmse={avg['irmse']:.2f} imae={avg['imae']:.2f}")
    return csvlog.best_rmse


if __name__ == "__main__":
    main()
