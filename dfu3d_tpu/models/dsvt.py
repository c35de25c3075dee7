"""DSVT — Dynamic Sparse Voxel Transformer backbone (reference:
pcdet/models/backbones_3d/dsvt.py, 616 LoC + the ingroup_inds CUDA op).

TPU redesign, fully static shapes:
* window partition: each pillar's window id from its BEV cell; within-window
  order via core.voxel.sparse_ops.ingroup_inds (N7, sort-based);
* set partition: windows chunked into fixed SET_SIZE sets by scattering each
  pillar to slot (set_base + ingroup_index) of a padded set buffer —
  overflow pillars beyond MAX_SETS·SET_SIZE drop (capacity semantics like the
  voxel caps elsewhere);
* rotated-set attention: blocks alternate x-major / y-major within-window
  ordering (the reference's rotating permutation) with masked MHA per set;
* relative-in-window position encodings added per block.
Output is the same pillar list with transformed features (stride 1), scattered
to a dense BEV by the caller.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.voxel.sparse_ops import ingroup_inds


class _SetAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sets, set_mask, pos):
        """sets (S, L, C); set_mask (S, L); pos (S, L, C) position encoding."""
        x = sets + pos
        attn_mask = jnp.where(
            set_mask[:, None, None, :], 0.0, -1e9
        )  # (S, 1, 1, L)
        # masked attention, implemented directly to inject the key mask
        qkv = nn.DenseGeneral((3, self.num_heads, self.dim // self.num_heads),
                              dtype=self.dtype, param_dtype=jnp.float32,
                              name="qkv")(x.astype(self.dtype))
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        scale = (self.dim // self.num_heads) ** -0.5
        logits = jnp.einsum("slhd,smhd->shlm", q * scale, k).astype(jnp.float32)
        logits = logits + attn_mask
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("shlm,smhd->slhd", w, v).reshape(sets.shape)
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        y = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="ln1")(
            (sets + out).astype(jnp.float32)
        ).astype(self.dtype)
        ff = nn.Dense(self.dim * 2, dtype=self.dtype, param_dtype=jnp.float32,
                      name="ffn1")(y)
        ff = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name="ffn2")(nn.gelu(ff, approximate=False))
        z = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="ln2")(
            (y + ff).astype(jnp.float32)
        ).astype(self.dtype)
        return jnp.where(set_mask[..., None], z, 0.0)


class DSVTBackbone(nn.Module):
    """Operates on one frame's pillar list: feats (P, C), coords (P, 2) int
    BEV cells, valid (P,). vmap over the batch."""

    dim: int = 128
    num_heads: int = 8
    num_blocks: int = 4
    window_shape: Tuple[int, int] = (12, 12)
    set_size: int = 36
    max_sets: int = 1024
    grid_size: Tuple[int, int] = (512, 512)
    dtype: jnp.dtype = jnp.float32

    def _partition(self, coords, valid, x_major: bool):
        """→ (set_ids (P,), slot (P,), in-window xy (P, 2))"""
        wx, wy = self.window_shape
        nx, _ = self.grid_size
        win_x = coords[:, 0] // wx
        win_y = coords[:, 1] // wy
        n_win_x = -(-self.grid_size[0] // wx)
        win_id = win_y * n_win_x + win_x
        inx = coords[:, 0] % wx
        iny = coords[:, 1] % wy
        inner = inx * wy + iny if x_major else iny * wx + inx
        # order pillars within a window by the chosen major: sort by the
        # combined (window, inner) key, then rank within each window — the
        # reference's sorted in-window order via ingroup_inds (N7)
        order_key = win_id.astype(jnp.int32) * (wx * wy) + inner.astype(jnp.int32)
        order = jnp.argsort(jnp.where(valid, order_key, jnp.iinfo(jnp.int32).max))
        win_sorted = jnp.take(win_id, order)
        valid_sorted = jnp.take(valid, order)
        rank_sorted = ingroup_inds(win_sorted, valid_sorted)
        rank = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)

        set_in_win = rank // self.set_size
        slot_in_set = rank % self.set_size
        # global set id: hash (window, set_in_win) into the max_sets buffer by
        # first-come compaction over the sorted sequence
        set_key = win_id * 64 + jnp.clip(set_in_win, 0, 63)
        set_key_sorted = jnp.take(set_key, order)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), set_key_sorted[1:] != set_key_sorted[:-1]]
        ) & valid_sorted
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        seg = jnp.where(valid_sorted & (seg < self.max_sets), seg, self.max_sets)
        set_ids = jnp.zeros_like(seg).at[order].set(seg)
        set_ids = jnp.where(valid & (rank >= 0), set_ids, self.max_sets)
        return set_ids, slot_in_set, jnp.stack([inx, iny], axis=-1)

    @nn.compact
    def __call__(self, feats, coords, valid, train: bool = False):
        p, _ = feats.shape
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="input_proj")(feats.astype(self.dtype))
        wx, wy = self.window_shape

        for blk in range(self.num_blocks):
            x_major = blk % 2 == 0
            set_ids, slot, inner_xy = self._partition(coords, valid, x_major)
            s, l = self.max_sets, self.set_size
            flat_slot = jnp.where(
                (set_ids < s) & (slot < l), set_ids * l + slot, s * l
            )
            buf = (
                jnp.zeros((s * l + 1, self.dim), x.dtype)
                .at[flat_slot].set(x, mode="drop")
            )
            src_of = (
                jnp.full((s * l + 1,), p, jnp.int32)
                .at[flat_slot].set(jnp.arange(p, dtype=jnp.int32), mode="drop")
            )
            sets = buf[: s * l].reshape(s, l, self.dim)
            set_mask = (src_of[: s * l] < p).reshape(s, l)

            # in-window relative position encoding
            pe_in = (inner_xy.astype(jnp.float32)
                     / jnp.asarray([wx, wy], jnp.float32))
            pe = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"pos{blk}")(pe_in)
            pe_buf = (
                jnp.zeros((s * l + 1, self.dim), pe.dtype)
                .at[flat_slot].set(pe, mode="drop")
            )[: s * l].reshape(s, l, self.dim)

            out_sets = _SetAttention(self.dim, self.num_heads,
                                     dtype=self.dtype, name=f"block{blk}")(
                sets, set_mask, pe_buf
            )
            # gather back to the pillar list (pillars beyond set capacity
            # keep their previous features)
            flat_out = out_sets.reshape(s * l, self.dim)
            gathered = jnp.take(
                jnp.concatenate([flat_out, jnp.zeros((1, self.dim), x.dtype)]),
                jnp.minimum(flat_slot, s * l), axis=0,
            )
            in_set = flat_slot < s * l
            x = jnp.where(in_set[:, None], gathered, x)
            x = jnp.where(valid[:, None], x, 0.0)
        return x
