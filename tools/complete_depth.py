"""Depth-completion CLI: produce `depth/<idx>.npy` artifacts for the pseudo-box
factory from LiDAR + image, using the in-repo ENet (reference: the PENet path
of tools/PENet/main.py, superseded at runtime there by DepthAnything — external
metric-depth models can drop their outputs into the same artifact layout).

Usage:
    python tools/complete_depth.py --detpath data/.../train_28130 \
        [--ckpt <orbax dir>] [--height 352 --width 1216]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dfu3d_tpu.utils.common import maybe_force_platform

maybe_force_platform()


def sparse_depth_from_lidar(lidar, calib, h, w):
    """Project LiDAR into a sparse depth image (PENet my_loader.load_depth_input)."""
    pts_img, depth = calib.lidar_to_img(lidar[:, :3])
    pix = np.round(pts_img).astype(int)
    ok = (
        (pix[:, 0] >= 0) & (pix[:, 0] < w)
        & (pix[:, 1] >= 0) & (pix[:, 1] < h) & (depth > 0)
    )
    out = np.zeros((h, w), np.float32)
    out[pix[ok, 1], pix[ok, 0]] = depth[ok]
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--detpath", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="trained ENet orbax checkpoint, e.g. "
                             "tools/train_depth.py's <out>/best_ckpt "
                             "(untrained weights give placeholder depth)")
    parser.add_argument("--model", type=str, default="enet",
                        choices=["enet", "enet_ref"],
                        help="enet: compact TPU-first net; enet_ref: the "
                             "reference-exact PENet ENet (models/penet_ref) "
                             "that loads released e.pth.tar/pe.pth.tar "
                             "checkpoints via --torch_ckpt")
    parser.add_argument("--torch_ckpt", type=str, default=None,
                        help="released PENet torch checkpoint to convert "
                             "through train/torch_convert.enet_mapping "
                             "(requires --model enet_ref)")
    parser.add_argument("--height", type=int, default=352)
    parser.add_argument("--width", type=int, default=1216)
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--end", type=int, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dfu3d_tpu.core.geometry.calibration import Calibration
    from dfu3d_tpu.data import kitti_io
    from dfu3d_tpu.models.depth_completion import ENet
    from dfu3d_tpu.utils.common import create_logger

    logger = create_logger()
    root = Path(args.detpath)
    (root / "depth").mkdir(exist_ok=True)
    ids = sorted(p.stem for p in (root / "velodyne").glob("*.bin"))
    ids = ids[args.start : args.end]

    h, w = args.height, args.width
    use_ref = args.model == "enet_ref"
    if use_ref:
        from dfu3d_tpu.models.penet_ref import ENetRef

        model = ENetRef(dtype=jnp.bfloat16)
        # CoordConv position plane (reference CoordConv.AddCoordsNp: u then
        # v, each normalized to [-1, 1] over the crop)
        uu, vv = np.meshgrid(np.linspace(-1, 1, w, dtype=np.float32),
                             np.linspace(-1, 1, h, dtype=np.float32))
        position = jnp.asarray(np.stack([uu, vv], axis=-1)[None])
    else:
        model = ENet(dtype=jnp.bfloat16)
    variables = None

    @jax.jit
    def run(variables, rgb, sd, cu, cv, fu, fv):
        if use_ref:
            K = jnp.asarray(
                [[[fu, 0.0, cu], [0.0, fv, cv], [0.0, 0.0, 1.0]]],
                jnp.float32,
            )
            out = model.apply(variables, rgb, sd, position, K, train=False)
            return out["output"]  # (B, H, W, 1), like the compact net
        fused, _, _ = model.apply(variables, rgb, sd, cu, cv, fu, fv,
                                  train=False)
        return fused

    for idx in ids:
        calib = Calibration(root / "calib" / f"{idx}.txt")
        lidar = kitti_io.read_velodyne_bin(root / "velodyne" / f"{idx}.bin")
        img = Image.open(root / "image_2" / f"{idx}.png").convert("RGB")
        full_w, full_h = img.size
        # bottom crop to (h, w) (PENet val_transform BottomCrop)
        left = max((full_w - w) // 2, 0)
        top = max(full_h - h, 0)
        img_c = np.asarray(img.crop((left, top, left + w, top + h)),
                           np.float32) / 255.0
        sd_full = sparse_depth_from_lidar(lidar, calib, full_h, full_w)
        sd = sd_full[top : top + h, left : left + w]

        rgb_in = jnp.asarray(img_c[None])
        sd_in = jnp.asarray(sd[None, ..., None])
        if variables is None:
            if use_ref:
                K0 = jnp.asarray(
                    [[[calib.fu, 0.0, calib.cu - left],
                      [0.0, calib.fv, calib.cv - top],
                      [0.0, 0.0, 1.0]]], jnp.float32)
                variables = jax.jit(
                    lambda r, s: model.init({"params": jax.random.PRNGKey(0)},
                                            r, s, position, K0, train=False)
                )(rgb_in, sd_in)
            else:
                variables = model.init(
                    {"params": jax.random.PRNGKey(0)}, rgb_in, sd_in,
                    calib.cu, calib.cv, calib.fu, calib.fv, train=False,
                )
            if args.torch_ckpt:
                assert use_ref, "--torch_ckpt needs --model enet_ref"
                from dfu3d_tpu.train import torch_convert as tc

                state = tc.load_torch_checkpoint(args.torch_ckpt)
                variables, report = tc.apply_mapping(
                    variables, state, tc.enet_mapping()
                )
                logger.info(
                    f"converted {len(report['converted'])} tensors from "
                    f"{args.torch_ckpt} "
                    f"(missing: {len(report['missing_in_torch'])})"
                )
            elif args.ckpt:
                import orbax.checkpoint as ocp

                restored = ocp.PyTreeCheckpointer().restore(
                    Path(args.ckpt).absolute(), item=jax.device_get(variables)
                )
                variables = restored
        fused = np.asarray(
            run(variables, rgb_in, sd_in, calib.cu - left, calib.cv - top,
                calib.fu, calib.fv)
        )[0, ..., 0]
        # place back into the full-frame depth map the factory expects
        out = np.zeros((full_h, full_w), np.float32)
        out[top : top + h, left : left + w] = fused
        np.save(root / "depth" / f"{idx}.npy", out)
    logger.info(f"wrote {len(ids)} depth maps to {root / 'depth'}")


if __name__ == "__main__":
    main()
