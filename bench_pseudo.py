"""Pseudo-box factory throughput benchmark (the BASELINE.md north star).

Prints ONE JSON line with frames/sec/chip for PseudoBoxFactory.process_frame
on a realistic synthetic nuScenes-format frame (352×1216 crop, ~35k LiDAR
points, 8 SEEM instances), plus the projected wall-clock for the reference's
full 28,130-frame train split on 8 chips (target < 1 hr, BASELINE.md).

Synthetic rather than real data because the container ships no nuScenes; the
frame is shaped to the reference pipeline's actual sizes (KittiDepth crop
352×1216, tools/PENet/kitti_loader.py:199-296; train_28130 split,
main.py:227).
"""
import json
import time

import numpy as np


def make_frame(seed=0, n_instances=8):
    from dfu3d_tpu.core.geometry.calibration import Calibration
    from dfu3d_tpu.pseudo.factory import FrameInputs

    rng = np.random.RandomState(seed)
    img_h, img_w = 352, 1216
    P2 = np.array(
        [[700.0, 0, img_w / 2, 0], [0, 700.0, 180, 0], [0, 0, 1, 0]], np.float32
    )
    R0 = np.eye(3, dtype=np.float32)
    V2C = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], np.float32)
    calib = Calibration({"P2": P2, "R0": R0, "Tr_velo2cam": V2C})

    # ground + objects
    n_ground = 30000
    pts = [np.stack([
        rng.uniform(2, 60, n_ground), rng.uniform(-25, 25, n_ground),
        rng.normal(-1.7, 0.03, n_ground)], axis=1)]
    centers = []
    for i in range(n_instances):
        cx, cy = rng.uniform(8, 45), rng.uniform(-12, 12)
        l, w, h = rng.uniform(3.5, 5), rng.uniform(1.6, 2.0), rng.uniform(1.4, 1.8)
        th = rng.uniform(-np.pi, np.pi)
        n = 600
        t = rng.uniform(0, 1, n)
        side = rng.randint(0, 4, n)
        xs = np.where(side == 0, -l / 2 + t * l, np.where(side == 1, l / 2,
             np.where(side == 2, -l / 2 + t * l, -l / 2)))
        ys = np.where(side == 0, -w / 2, np.where(side == 1, -w / 2 + t * w,
             np.where(side == 2, w / 2, -w / 2 + t * w)))
        c, s = np.cos(th), np.sin(th)
        pts.append(np.stack([
            xs * c - ys * s + cx, xs * s + ys * c + cy,
            rng.uniform(-1.6, h - 1.7, n)], axis=1))
        centers.append((cx, cy))
    lidar = np.concatenate(pts).astype(np.float32)
    lidar = np.concatenate(
        [lidar, rng.uniform(0, 1, (len(lidar), 1)).astype(np.float32)], axis=1
    )

    image = rng.randint(0, 255, (img_h, img_w, 3)).astype(np.uint8)
    # dense depth everywhere (DepthAnything produces full-frame metric depth)
    depth = rng.uniform(4, 70, (img_h, img_w)).astype(np.float32)

    masks = np.zeros((n_instances, img_h, img_w), bool)
    boxes2d = np.zeros((n_instances, 4), np.float32)
    for i, (cx, cy) in enumerate(centers):
        pix, dv = calib.lidar_to_img(pts[i + 1])
        pix = np.round(pix).astype(int)
        ok = ((pix[:, 0] >= 0) & (pix[:, 0] < img_w)
              & (pix[:, 1] >= 0) & (pix[:, 1] < img_h) & (dv > 0))
        if ok.sum() < 10:
            continue
        x1, y1 = pix[ok].min(0)
        x2, y2 = pix[ok].max(0)
        masks[i, y1:y2 + 1, x1:x2 + 1] = True
        boxes2d[i] = [x1, y1, x2, y2]
        # render object depth into the dense map so densify produces
        # in-instance pseudo points
        depth[pix[ok][:, 1], pix[ok][:, 0]] = dv[ok]

    return FrameInputs(
        frame_id="bench", lidar=lidar, image=image, depth=depth, calib=calib,
        masks=masks, classes=np.zeros(n_instances, int),
        scores=rng.uniform(0.7, 1.0, n_instances).astype(np.float32),
        boxes2d=boxes2d,
    )


def main():
    from dfu3d_tpu.pseudo.factory import PseudoBoxFactory

    factory = PseudoBoxFactory()
    frames = [make_frame(seed=s) for s in range(4)]

    # warmup/compile
    out = factory.process_frame(frames[0])
    n_boxes = len(out.boxes_lidar)

    trials, best = 3, 0.0
    for _ in range(trials):
        t0 = time.time()
        n = 0
        for f in frames * 2:
            factory.process_frame(f)
            n += 1
        fps = n / (time.time() - t0)
        best = max(best, fps)

    total_frames = 28130
    chips = 8
    projected_min = total_frames / (best * chips) / 60.0
    print(json.dumps({
        "metric": "pseudo_box_frames_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "frames/s",
        "boxes_on_warmup_frame": n_boxes,
        "projected_train28130_on_8chips_min": round(projected_min, 1),
        "target_min": 60.0,
    }))


if __name__ == "__main__":
    main()
