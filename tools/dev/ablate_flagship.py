"""Wall-time ablation of the flagship train step: VFE / 2D backbone / head
+loss / optimizer, each timed as its OWN jitted fwd+bwd program on the chip.

The per-op trace can't attribute wall time (async copy durations overlap
~5x; profile_flagship.py round-5 run: 319 ms summed vs 64.7 ms wall), so
this times each stage in isolation with the device_get fence. Stages chain
real intermediate tensors (VFE out -> backbone in -> head in) at bench.py's
flagship shapes (B=4, 60k points).

Usage: python tools/dev/ablate_flagship.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[2]))


def _time(fn, *args, iters=10, trials=3):
    import jax

    out = fn(*args)
    jax.device_get(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    times = []
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        times.append((time.time() - t0) / iters)
    return min(times) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship, _synthetic_batch
    from dfu3d_tpu.train import build_optimizer, create_train_state
    from dfu3d_tpu.train.train_state import make_train_step

    cfg, grid, model = _flagship(dtype=jnp.bfloat16)
    B = 4
    batch = jax.device_put(_synthetic_batch(B, 60000, 256, 50.0))
    tx, _ = build_optimizer(cfg.OPTIMIZATION, total_steps=1000)
    state = create_train_state(model, batch, tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    lw = cfg.MODEL.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS

    results = {}

    def run(method):
        return model.apply(variables, train=True, method=method,
                           mutable=["batch_stats"])[0]

    # real intermediates, computed once
    bev = run(lambda mm, train: mm.vfe(batch.points, batch.points_valid,
                                       train))
    spatial = run(lambda mm, train: mm.backbone_2d(bev, train))
    bev = jax.device_put(bev)
    spatial = jax.device_put(spatial)
    print("shapes:", bev.shape, spatial.shape, file=sys.stderr)

    # VFE fwd+bwd
    def vfe_loss(params, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            train=True,
            method=lambda mm, train: mm.vfe(b.points, b.points_valid, train),
            mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    results["vfe_fwd_bwd"] = round(_time(
        jax.jit(jax.value_and_grad(vfe_loss)), variables["params"], batch), 2)
    results["vfe_fwd"] = round(_time(
        jax.jit(vfe_loss), variables["params"], batch), 2)

    # 2D backbone fwd+bwd on the real BEV tensor
    def bb_loss(params, x):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            train=True,
            method=lambda mm, train: mm.backbone_2d(x, train),
            mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    results["backbone2d_fwd_bwd"] = round(_time(
        jax.jit(jax.value_and_grad(bb_loss)), variables["params"], bev), 2)

    # head convs + target assignment + loss, fwd+bwd, on real features
    def head_loss(params, x, b):
        def m_fn(mm, train):
            preds = mm.dense_head(x, train)
            h, w = preds[0]["hm"].shape[1:3]
            targets = mm.dense_head.assign_targets(
                b.gt_boxes, b.gt_valid, (h, w))
            loss, _tb = mm.dense_head.get_loss(preds, targets, lw)
            return loss

        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            train=True, method=m_fn, mutable=["batch_stats"])
        return out

    results["head_targets_loss_fwd_bwd"] = round(_time(
        jax.jit(jax.value_and_grad(head_loss)), variables["params"], spatial,
        batch), 2)

    # optimizer update alone
    grads = jax.tree_util.tree_map(
        lambda x: jnp.ones_like(x) * 1e-6, state.params)

    @jax.jit
    def opt(params, opt_state, grads):
        ups, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, ups), new_opt

    results["optimizer_update"] = round(
        _time(opt, state.params, state.opt_state, grads), 2)

    # full step LAST (donates state — state buffers die here)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    s = state
    s, m = step(s, batch)
    jax.device_get(m["loss"])
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            s, m = step(s, batch)
        jax.device_get(m["loss"])
        times.append((time.time() - t0) / 10)
    results["full_step"] = round(min(times) * 1e3, 2)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
