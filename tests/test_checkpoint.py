"""Checkpoint save/load/rotation tests."""
import jax
import numpy as np

from dfu3d_tpu.models import build_network
from dfu3d_tpu.train import build_optimizer, create_train_state
from dfu3d_tpu.train.checkpoint import (
    list_checkpoints,
    load_checkpoint,
    load_latest,
    save_checkpoint,
)
from dfu3d_tpu.train.train_state import make_train_step
from dfu3d_tpu.utils.config import CfgDict

from test_model import CLASS_NAMES, make_batch, tiny_grid, tiny_model_cfg


def _state_and_tx():
    model = build_network(tiny_model_cfg(), CLASS_NAMES, tiny_grid())
    tx, _ = build_optimizer(
        CfgDict({"OPTIMIZER": "adam", "LR": 1e-3, "WEIGHT_DECAY": 0.0}), 10
    )
    batch = make_batch(np.random.RandomState(0))
    return model, tx, create_train_state(model, batch, tx), batch


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model, tx, state, batch = _state_and_tx()
        step = jax.jit(make_train_step(model, tx))
        state, _ = step(state, batch)
        save_checkpoint(tmp_path, state, epoch=3)

        restored, epoch = load_checkpoint(tmp_path / "checkpoint_epoch_3", state)
        assert epoch == 3
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(state.params)),
            jax.tree_util.tree_leaves(restored.params),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        # training continues identically from the restored state
        s1, m1 = step(state, batch)
        s2, m2 = step(restored, batch)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6

    def test_rotation_and_latest(self, tmp_path):
        model, tx, state, batch = _state_and_tx()
        for e in range(1, 6):
            save_checkpoint(tmp_path, state, epoch=e, max_ckpt_save_num=3)
        epochs = [e for e, _ in list_checkpoints(tmp_path)]
        assert epochs == [3, 4, 5]
        restored, epoch = load_latest(tmp_path, state)
        assert epoch == 5 and restored is not None

    def test_load_latest_empty(self, tmp_path):
        restored, epoch = load_latest(tmp_path)
        assert restored is None and epoch == -1
