"""Train-step tests: loss decreases on a fixed batch; sharded mesh execution."""
import jax
import jax.numpy as jnp
import numpy as np

from dfu3d_tpu.models import build_network
from dfu3d_tpu.parallel import make_mesh, replicate, shard_batch
from dfu3d_tpu.train import build_optimizer, create_train_state
from dfu3d_tpu.train.train_state import make_eval_step, make_train_step
from dfu3d_tpu.utils.config import CfgDict

from test_model import CLASS_NAMES, make_batch, tiny_grid, tiny_model_cfg


def optim_cfg():
    return CfgDict(
        {
            "OPTIMIZER": "adam_onecycle",
            "LR": 0.003,
            "WEIGHT_DECAY": 0.01,
            "MOMS": [0.95, 0.85],
            "PCT_START": 0.4,
            "DIV_FACTOR": 10,
            "GRAD_NORM_CLIP": 10,
        }
    )


class TestTrainStep:
    def test_loss_decreases_single_device(self):
        model = build_network(tiny_model_cfg(), CLASS_NAMES, tiny_grid())
        tx, _ = build_optimizer(optim_cfg(), total_steps=50)
        batch = make_batch(np.random.RandomState(7))
        state = create_train_state(model, batch, tx)
        step = jax.jit(make_train_step(model, tx))
        losses = []
        for _ in range(15):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_sharded_train_step_8dev(self):
        devices = jax.devices()
        assert len(devices) == 8, "conftest should force an 8-device CPU mesh"
        mesh = make_mesh(data=8, model=1)
        model = build_network(tiny_model_cfg(), CLASS_NAMES, tiny_grid())
        tx, _ = build_optimizer(optim_cfg(), total_steps=10)
        batch = make_batch(np.random.RandomState(1), b=8)
        state = create_train_state(model, batch, tx)
        state = replicate(mesh, state)
        sharded = shard_batch(mesh, batch)
        step = jax.jit(make_train_step(model, tx))
        state2, metrics = step(state, sharded)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated and identical to the single-device result
        state_s, metrics_s = jax.jit(make_train_step(model, tx))(
            jax.device_get(state), jax.device_get(batch)
        )
        l_sharded = jax.device_get(
            jax.tree_util.tree_leaves(state2.params)[0]
        )
        l_single = jax.device_get(jax.tree_util.tree_leaves(state_s.params)[0])
        assert np.allclose(l_sharded, l_single, atol=1e-5)

    def test_onecycle_schedule_shape(self):
        from dfu3d_tpu.train.optimization import onecycle_lr_fn, onecycle_mom_fn

        lr_fn = onecycle_lr_fn(0.001, 10, 0.4, 100)
        assert abs(float(lr_fn(0)) - 0.0001) < 1e-7
        assert abs(float(lr_fn(40)) - 0.001) < 1e-5
        assert float(lr_fn(100)) < 1e-6
        mom_fn = onecycle_mom_fn([0.95, 0.85], 0.4, 100)
        assert abs(float(mom_fn(0)) - 0.95) < 1e-6
        assert abs(float(mom_fn(40)) - 0.85) < 1e-4
        assert abs(float(mom_fn(100)) - 0.95) < 1e-6

    def test_eval_step_runs(self):
        model = build_network(tiny_model_cfg(), CLASS_NAMES, tiny_grid())
        tx, _ = build_optimizer(optim_cfg(), total_steps=10)
        batch = make_batch(np.random.RandomState(2))
        state = create_train_state(model, batch, tx)
        boxes, scores, labels, valid = jax.jit(make_eval_step(model))(state, batch)
        assert boxes.shape[-1] == 7
        assert np.all(np.isfinite(np.asarray(boxes)))

    def test_eval_step_recall_matches_host_oracle(self):
        """In-graph recall counters (fixed-shape, one compile) must equal the
        host computation over the unpadded per-frame boxes they replaced
        (eval_utils round-2 `_recall_counts`)."""
        from dfu3d_tpu.core.geometry import pairwise_iou3d

        thresh = (0.1, 0.3, 0.5, 0.7)
        model = build_network(tiny_model_cfg(), CLASS_NAMES, tiny_grid())
        tx, _ = build_optimizer(optim_cfg(), total_steps=10)
        batch = make_batch(np.random.RandomState(7))
        state = create_train_state(model, batch, tx)
        boxes, scores, labels, valid, recall = jax.jit(
            make_eval_step(model, recall_thresh=thresh)
        )(state, batch)
        boxes, valid = np.asarray(boxes), np.asarray(valid)

        want = {f"recall_rcnn_{t}": 0 for t in thresh}
        want["gt_num"] = 0
        for i in range(boxes.shape[0]):
            gt = np.asarray(batch.gt_boxes[i][batch.gt_valid[i]])
            want["gt_num"] += len(gt)
            pred = boxes[i][valid[i]]
            if len(gt) == 0 or len(pred) == 0:
                continue
            iou = np.asarray(pairwise_iou3d(
                jnp.asarray(pred[:, :7]), jnp.asarray(gt[:, :7])))
            max_iou = iou.max(axis=0)
            for t in thresh:
                want[f"recall_rcnn_{t}"] += int((max_iou > t).sum())
        got = {k: int(v) for k, v in recall.items()}
        assert got == want


class TestMultiStep:
    def test_multi_step_equals_sequential(self):
        from dfu3d_tpu.train.train_state import make_multi_train_step

        model = build_network(tiny_model_cfg(), CLASS_NAMES, tiny_grid())
        tx, _ = build_optimizer(optim_cfg(), total_steps=50)
        rng = np.random.RandomState(3)
        batches = [make_batch(np.random.RandomState(10 + i)) for i in range(3)]
        state0 = create_train_state(model, batches[0], tx)

        step = jax.jit(make_train_step(model, tx))
        state_seq = state0
        seq_losses = []
        for b in batches:
            state_seq, m = step(state_seq, b)
            seq_losses.append(float(m["loss"]))

        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *batches
        )
        mstep = jax.jit(make_multi_train_step(model, tx, 3))
        state_multi, metrics = mstep(state0, stacked)

        np.testing.assert_allclose(
            np.asarray(metrics["loss_steps"]), np.asarray(seq_losses),
            rtol=1e-5,
        )
        # NOTE: exact param equality after K adam steps is not a stable
        # property — scan body and standalone step compile to different
        # programs, fp reassociation differs, and the loss's hard-threshold
        # target assignment amplifies 1-ulp flips chaotically (observed even
        # between two CPU runs of the same path). The loss-trace equality
        # above IS the sequential-equivalence check: step i's loss is a
        # function of the params produced by steps < i.
        assert int(state_multi.step) == 3
        for leaf in jax.tree_util.tree_leaves(state_multi.params):
            assert np.all(np.isfinite(jax.device_get(leaf)))


class TestEvalMerge:
    def test_all_gather_objects_single_process(self):
        from dfu3d_tpu.parallel.distributed import all_gather_objects

        obj = {"annos": [{"frame_id": "000001"}], "metric": {"gt_num": 3}}
        out = all_gather_objects(obj)
        assert out == [obj]
