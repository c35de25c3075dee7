"""Demo: run a trained detector on raw point-cloud files and visualize BEV.

Reference: tools/demo.py (globs a dir of .bin/.npy, runs the model, open3d
visualization). open3d is not in this image; the visualization is a matplotlib
BEV rendering (points + predicted boxes) written to PNG.

Usage:
    python tools/demo.py --cfg_file cfgs/kitti_models/centerpoint_nuscenes2kitti.yaml \
        --ckpt output/.../ckpt/checkpoint_epoch_20 --data_path data/demo_bins \
        --out_dir demo_out
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def draw_bev(points, boxes, scores, labels, class_names, out_png,
             xlim=(0, 60), ylim=(-40, 40)):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dfu3d_tpu.data.np_geometry import boxes_to_corners_bev

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c=points[:, 2], cmap="viridis")
    if len(boxes):
        corners = boxes_to_corners_bev(boxes.astype(np.float32))
        for c, s, l in zip(corners, scores, labels):
            poly = np.concatenate([c, c[:1]], axis=0)
            ax.plot(poly[:, 0], poly[:, 1], "-r", linewidth=1.2)
            name = class_names[int(l) - 1] if 0 < int(l) <= len(class_names) else "?"
            ax.text(c[0, 0], c[0, 1], f"{name} {s:.2f}", color="red", fontsize=7)
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect("equal")
    ax.set_title(Path(out_png).stem)
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--data_path", type=str, required=True,
                        help="dir of .bin/.npy point clouds, or a single file")
    parser.add_argument("--out_dir", type=str, default="demo_out")
    parser.add_argument("--ext", type=str, default=".bin")
    parser.add_argument("--view", type=str, default="bev",
                        choices=["bev", "3d"],
                        help="bev: top-down PNG; 3d: visual_utils.draw_scenes "
                        "(reference tools/visual_utils rendering)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dfu3d_tpu.core.voxel import VoxelGrid
    from dfu3d_tpu.data.dataset import PointBatch
    from dfu3d_tpu.models import build_network
    from dfu3d_tpu.train import build_optimizer, create_train_state
    from dfu3d_tpu.train.checkpoint import load_checkpoint
    from dfu3d_tpu.train.train_state import make_eval_step
    from dfu3d_tpu.utils.common import create_logger
    from dfu3d_tpu.utils.config import cfg, cfg_from_yaml_file

    logger = create_logger()
    cfg_from_yaml_file(args.cfg_file, cfg)

    data_path = Path(args.data_path)
    files = sorted(data_path.glob(f"*{args.ext}")) if data_path.is_dir() else [data_path]
    logger.info(f"{len(files)} files")

    voxel_cfg = [p for p in cfg.DATA_CONFIG.DATA_PROCESSOR
                 if p.NAME.startswith("transform_points_to_voxels")][-1]
    grid = VoxelGrid.create(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, voxel_cfg.VOXEL_SIZE)
    model = build_network(cfg.MODEL, cfg.CLASS_NAMES, grid, dtype=jnp.bfloat16)
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1)

    n_max = int(cfg.DATA_CONFIG.get("MAX_POINTS_PER_FRAME", 65536))
    m_max = int(cfg.DATA_CONFIG.get("MAX_GT_PER_FRAME", 256))

    def load_points(f):
        if f.suffix == ".npy":
            pts = np.load(f).astype(np.float32)
        else:
            pts = np.fromfile(f, dtype=np.float32).reshape(-1, 4)
        return pts[:, :4]

    example = load_points(files[0])
    batch_of = lambda pts: PointBatch(
        points=np.pad(pts[:n_max], ((0, max(0, n_max - len(pts))), (0, 0)))[None],
        points_valid=(np.arange(n_max) < len(pts))[None],
        gt_boxes=np.zeros((1, m_max, 8), np.float32),
        gt_valid=np.zeros((1, m_max), bool),
    )
    state = create_train_state(model, batch_of(example), tx)
    if args.ckpt:
        state, epoch = load_checkpoint(args.ckpt, state)
        logger.info(f"loaded ckpt epoch {epoch}")
    eval_step = jax.jit(make_eval_step(model))

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for f in files:
        pts = load_points(f)
        boxes, scores, labels, valid = jax.device_get(
            eval_step(state, batch_of(pts))
        )
        v = valid[0]
        logger.info(f"{f.name}: {int(v.sum())} boxes")
        if args.view == "3d":
            from visual_utils import draw_scenes

            draw_scenes(
                pts, ref_boxes=boxes[0][v], ref_scores=scores[0][v],
                ref_labels=labels[0][v], class_names=cfg.CLASS_NAMES,
                out_png=str(out_dir / f"{f.stem}.png"), backend="mpl",
            )
            continue
        draw_bev(
            pts, boxes[0][v], scores[0][v], labels[0][v], cfg.CLASS_NAMES,
            out_dir / f"{f.stem}.png",
            xlim=(cfg.DATA_CONFIG.POINT_CLOUD_RANGE[0],
                  cfg.DATA_CONFIG.POINT_CLOUD_RANGE[3]),
            ylim=(cfg.DATA_CONFIG.POINT_CLOUD_RANGE[1],
                  cfg.DATA_CONFIG.POINT_CLOUD_RANGE[4]),
        )
    logger.info(f"wrote {len(files)} renderings to {out_dir}")


if __name__ == "__main__":
    main()
