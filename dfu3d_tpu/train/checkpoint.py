"""Checkpoint save/load via Orbax (reference: train_utils.py:199-254 +
detector3d_template.py:329-414).

Keeps the reference's *behavioral* contract: per-epoch checkpoints named
`checkpoint_epoch_N`, rotation keeping `max_ckpt_save_num`, resume from the
newest, tolerant loading (missing/extra keys warn instead of crash). The
on-disk format is Orbax (sharded-array-ready) instead of torch pickles.
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState

_CKPT_RE = re.compile(r"checkpoint_epoch_(\d+)$")


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def list_checkpoints(ckpt_dir) -> list:
    """Sorted (epoch, path) pairs."""
    ckpt_dir = Path(ckpt_dir)
    out = []
    if not ckpt_dir.exists():
        return out
    for p in ckpt_dir.iterdir():
        m = _CKPT_RE.search(p.name)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def save_checkpoint(ckpt_dir, state: TrainState, epoch: int,
                    max_ckpt_save_num: int = 30, name: str = None):
    """`name` overrides the epoch-derived directory (the reference's
    wallclock `latest_model` saves, train_utils.py:135-143 — excluded from
    rotation and from list_checkpoints' epoch glob)."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    if name is None:
        # rotation (reference train_utils.py:199-206)
        existing = list_checkpoints(ckpt_dir)
        while len(existing) >= max_ckpt_save_num:
            _, oldest = existing.pop(0)
            import shutil

            shutil.rmtree(oldest, ignore_errors=True)

    path = ckpt_dir / (name if name else f"checkpoint_epoch_{epoch}")
    host_state = jax.device_get(state)
    _checkpointer().save(
        path.absolute(), {"state": host_state._asdict(), "epoch": epoch},
        force=True,
    )
    return path


def load_checkpoint(path, template: Optional[TrainState] = None) -> Tuple[TrainState, int]:
    """Load one checkpoint; with a template, restores exact array types.

    Torch checkpoints (.pth / .pth.tar — the reference's public ckpt format,
    train_utils.py:221-254) are converted on the fly via train.torch_convert
    (flagship CenterPoint-pillar key mapping; partial strict=False overlay).
    """
    path = Path(path)
    if path.suffix == ".pth" or path.name.endswith(".pth.tar"):
        assert template is not None, "torch ckpt load needs a state template"
        from .torch_convert import convert_state_dict

        variables = {"params": template.params,
                     "batch_stats": template.batch_stats}
        new_vars, report = convert_state_dict(variables, path)
        n_conv = len(report["converted"])
        assert n_conv > 0, "no keys converted — wrong model for this mapping?"
        from flax.core import freeze

        state = template._replace(
            params=freeze(new_vars["params"]) if hasattr(template.params, "unfreeze") else new_vars["params"],
            batch_stats=freeze(new_vars["batch_stats"]) if hasattr(template.batch_stats, "unfreeze") else new_vars["batch_stats"],
        )
        return state, 0
    if template is not None:
        item = {"state": jax.device_get(template)._asdict(), "epoch": 0}
        restored = _checkpointer().restore(path.absolute(), item=item)
    else:
        restored = _checkpointer().restore(path.absolute())
    state = TrainState(**restored["state"])
    return state, int(restored["epoch"])


def load_latest(ckpt_dir, template: Optional[TrainState] = None):
    """Resume from the newest checkpoint, skipping corrupt ones
    (reference train.py:146-158 fallback behavior)."""
    for epoch, path in reversed(list_checkpoints(ckpt_dir)):
        try:
            return load_checkpoint(path, template)
        except Exception:
            continue
    return None, -1
