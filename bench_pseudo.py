"""Pseudo-box factory throughput benchmark (the BASELINE.md north star).

Sustained measurement (round-3 hardening): a host producer thread streams
**fresh** synthetic frames (distinct seeds — no warm-cache reuse, no
best-of-N) through each stage for ≥500 frames, and the reported figure is
frames / total wall of the sustained loop. Two stages are measured, matching
the reference's two-pass structure (tools/PENet/main.py runs depth completion
as its own pass; the box factory consumes the completed depth):

1. `depth`: ENet depth completion per frame (tools/complete_depth.py path)
2. `factory`: PseudoBoxFactory.process_frame per frame

The combined projection for the reference's full 28,130-frame train split on
8 chips (target < 1 hr, BASELINE.md) charges BOTH stages:
1 / (1/fps_depth + 1/fps_factory).

Synthetic rather than real data because the container ships no nuScenes; the
frame is shaped to the reference pipeline's actual sizes (KittiDepth crop
352×1216, tools/PENet/kitti_loader.py:199-296; train_28130 split,
main.py:227). One-time jit compile is excluded from the sustained loops and
reported separately as compile_s.
"""
import json
import os
import queue
import threading
import time

import numpy as np

# ≥500 sustained frames by default; overridable for time-boxed runs
# (PSEUDO_BENCH artifacts record the actual count used)
N_FRAMES = int(os.environ.get("PSEUDO_BENCH_FRAMES", "512"))


def _producer(q, n, start_seed, n_instances=8):
    from dfu3d_tpu.pseudo.synthetic import make_scene

    for s in range(start_seed, start_seed + n):
        frame, _gt, _names = make_scene(seed=s, n_instances=n_instances)
        q.put(frame)
    q.put(None)


def _stream(n, start_seed):
    q = queue.Queue(maxsize=32)
    t = threading.Thread(target=_producer, args=(q, n, start_seed), daemon=True)
    t.start()
    while True:
        f = q.get()
        if f is None:
            return
        yield f


def _sparse_depth(frame):
    """Project the frame's LiDAR into a sparse depth image (the PENet
    my_loader.load_depth_input contract)."""
    h, w = frame.depth.shape[:2]
    pix, d = frame.calib.lidar_to_img(frame.lidar[:, :3])
    u = np.round(pix[:, 0]).astype(int)
    v = np.round(pix[:, 1]).astype(int)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (d > 0)
    sd = np.zeros((h, w), np.float32)
    sd[v[ok], u[ok]] = d[ok]
    return sd


def bench_depth(n):
    import jax
    import jax.numpy as jnp

    from dfu3d_tpu.models.depth_completion import ENet

    model = ENet(dtype=jnp.bfloat16)

    @jax.jit
    def run(variables, rgb, sd, cu, cv, fu, fv):
        fused, _, _ = model.apply(variables, rgb, sd, cu, cv, fu, fv,
                                  train=False)
        return fused

    variables = None
    compile_s = n_done = 0
    t0 = None
    for frame in _stream(n, start_seed=0):
        rgb = jnp.asarray(frame.image[None].astype(np.float32) / 255.0)
        sd = jnp.asarray(_sparse_depth(frame)[None, ..., None])
        c = frame.calib
        if variables is None:
            tc = time.time()
            variables = jax.jit(
                lambda r, s: model.init({"params": jax.random.PRNGKey(0)}, r,
                                        s, c.cu, c.cv, c.fu, c.fv, train=False)
            )(rgb, sd)
            out = run(variables, rgb, sd, c.cu, c.cv, c.fu, c.fv)
            jax.device_get(jnp.sum(out))  # fence (tunnel: block_until_ready lies)
            compile_s = time.time() - tc
            t0 = time.time()  # sustained clock starts after compile
            continue
        out = run(variables, rgb, sd, c.cu, c.cv, c.fu, c.fv)
        jax.device_get(jnp.sum(out))
        n_done += 1
    return n_done / (time.time() - t0), compile_s


def bench_factory(n):
    from dfu3d_tpu.pseudo.factory import PseudoBoxFactory

    factory = PseudoBoxFactory()
    compile_s = n_done = n_boxes = 0
    t0 = None
    for frame in _stream(n, start_seed=10_000):
        if t0 is None:
            tc = time.time()
            out = factory.process_frame(frame)  # outputs are numpy → fenced
            n_boxes = len(out.boxes_lidar)
            compile_s = time.time() - tc
            t0 = time.time()
            continue
        factory.process_frame(frame)
        n_done += 1
    return n_done / (time.time() - t0), compile_s, n_boxes


def main():
    fps_depth, depth_compile_s = bench_depth(N_FRAMES)
    fps_factory, fact_compile_s, n_boxes = bench_factory(N_FRAMES)
    fps_chain = 1.0 / (1.0 / fps_depth + 1.0 / fps_factory)
    total_frames = 28130
    chips = 8
    projected_min = total_frames / (fps_chain * chips) / 60.0
    print(json.dumps({
        "metric": "pseudo_box_frames_per_sec_per_chip",
        "value": round(fps_chain, 2),
        "unit": "frames/s",
        "sustained_frames_per_stage": N_FRAMES - 1,
        "depth_completion_fps": round(fps_depth, 2),
        "factory_fps": round(fps_factory, 2),
        "compile_s": round(depth_compile_s + fact_compile_s, 1),
        "boxes_on_first_frame": n_boxes,
        "projected_train28130_on_8chips_min": round(projected_min, 1),
        "target_min": 60.0,
    }))


if __name__ == "__main__":
    main()
