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
    from dfu3d_tpu.pseudo.synthetic import make_scene

    frame, _gt, _names = make_scene(seed=seed, n_instances=n_instances)
    return frame


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
