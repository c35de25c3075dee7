"""DSVT — Dynamic Sparse Voxel Transformer backbone (reference:
pcdet/models/backbones_3d/dsvt.py, 616 LoC + the ingroup_inds CUDA op).

TPU redesign, fully static shapes:
* window partition: each pillar's window id from its BEV cell; within-window
  order via core.voxel.sparse_ops.ingroup_inds (N7, sort-based);
* set partition: windows chunked into fixed SET_SIZE sets by scattering each
  pillar to slot (set_base + ingroup_index) of a padded set buffer —
  overflow pillars beyond MAX_SETS·SET_SIZE drop (capacity semantics like the
  voxel caps elsewhere);
* rotated-set attention: each block runs two encoder layers (y-major then
  x-major within-window ordering — the reference's rotating permutation)
  with masked MHA per set; odd blocks use the hybrid-factor-scaled window
  shifted by half the base window (shifts_list semantics);
* learned in-window position embeddings (Linear→BN→ReLU→Linear on centered
  window coords) per encoder layer.
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
    """Reference DSVT_EncoderLayer + SetAttention (dsvt.py:198-278):
    q = k = x + pos, v = x (pos is NOT added to values), masked MHA →
    +residual → LN1 → FFN(dim_ff, gelu) → +residual → LN2, then the
    encoder layer's outer +identity → LN."""

    dim: int
    num_heads: int
    dim_ff: int = 0  # 0 → 2*dim (the shipped configs' dim_feedforward)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sets, set_mask, pos):
        """sets (S, L, C); set_mask (S, L); pos (S, L, C) position encoding."""
        identity = sets
        qk_in = (sets + pos).astype(self.dtype)
        attn_mask = jnp.where(
            set_mask[:, None, None, :], 0.0, -1e9
        )  # (S, 1, 1, L)
        hd = self.dim // self.num_heads
        # masked attention, implemented directly to inject the key mask
        q = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype,
                            param_dtype=jnp.float32, name="q")(qk_in)
        k = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype,
                            param_dtype=jnp.float32, name="k")(qk_in)
        v = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="v")(sets.astype(self.dtype))
        scale = hd ** -0.5
        logits = jnp.einsum("slhd,smhd->shlm", q * scale, k).astype(jnp.float32)
        logits = logits + attn_mask
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("shlm,smhd->slhd", w, v).reshape(sets.shape)
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        y = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="ln1")(
            (sets + out).astype(jnp.float32)
        ).astype(self.dtype)
        ff_dim = self.dim_ff or self.dim * 2
        ff = nn.Dense(ff_dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name="ffn1")(y)
        ff = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name="ffn2")(nn.gelu(ff, approximate=False))
        z = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="ln2")(
            (y + ff).astype(jnp.float32)
        ).astype(self.dtype)
        z = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name="ln3")(
            (identity + z).astype(jnp.float32)
        ).astype(self.dtype)
        return jnp.where(set_mask[..., None], z, 0.0)


class DSVTBackbone(nn.Module):
    """Operates on the batch's pillar lists: feats (B, P, C), coords
    (B, P, 2) int BEV cells, valid (B, P). Each block alternates between
    the base window and the hybrid-scaled shifted window, with y-axis and
    x-axis rotated-set encoder layers inside (reference DSVTBlock)."""

    dim: int = 128
    num_heads: int = 8
    num_blocks: int = 4
    window_shape: Tuple[int, int] = (12, 12)
    set_size: int = 36
    max_sets: int = 1024
    grid_size: Tuple[int, int] = (512, 512)
    # odd blocks use the hybrid-scaled window shifted by half the base
    # window (reference hybrid_factor [2,2,1] + shifts_list [[0,0],[6,6]],
    # dsvt.py:366-372 / dsvt_pillar.yaml:77-79)
    hybrid_factor: Tuple[int, int] = (2, 2)
    dim_ff: int = 0  # 0 → 2*dim
    dtype: jnp.dtype = jnp.float32

    def _partition(self, coords, batch_idx, valid, x_major: bool,
                   window_shape: Tuple[int, int], shift: Tuple[int, int],
                   num_batch: int):
        """coords (N, 2) flat across the batch, batch_idx (N,) →
        (set_ids (N,), slot (N,), in-window xy (N, 2)). Windows are
        batch-offset (the reference's batch_win_inds, dsvt.py:497-515), so
        one sort covers the whole batch."""
        wx, wy = window_shape
        nx, ny = self.grid_size
        sx_coord = coords[:, 0] + shift[0]
        sy_coord = coords[:, 1] + shift[1]
        win_x = sx_coord // wx
        win_y = sy_coord // wy
        n_win_x = -(-(nx + wx) // wx)
        n_win_y = -(-(ny + wy) // wy)
        win_id = (batch_idx * (n_win_x * n_win_y)
                  + win_y * n_win_x + win_x)
        inx = sx_coord % wx
        iny = sy_coord % wy
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
        cap_sets = num_batch * self.max_sets
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        seg = jnp.where(valid_sorted & (seg < cap_sets), seg, cap_sets)
        set_ids = jnp.zeros_like(seg).at[order].set(seg)
        set_ids = jnp.where(valid & (rank >= 0), set_ids, cap_sets)
        return set_ids, slot_in_set, jnp.stack([inx, iny], axis=-1)

    @nn.compact
    def __call__(self, feats, coords, valid, train: bool = False):
        """feats (B, P, C), coords (B, P, 2) int BEV cells, valid (B, P) →
        (B, P, dim). The batch is flattened internally: windows (and hence
        sets) are batch-offset, so every sort/scatter covers the whole
        batch at once and the pos-embed BatchNorm sees full-batch
        statistics (the torch BN1d contract)."""
        b, p, _ = feats.shape
        flat = feats.reshape(b * p, -1)
        coords = coords.reshape(b * p, 2)
        valid = valid.reshape(b * p)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)

        # the reference DSVT has no input projection — the VFE already emits
        # d_model channels (dsvt_pillar.yaml NUM_FILTERS [192,192]); project
        # only when the input width differs (e.g. the MeanVFE fallback)
        x = flat.astype(self.dtype)
        if flat.shape[-1] != self.dim:
            x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name="input_proj")(x)
        wx0, wy0 = self.window_shape
        hx, hy = self.hybrid_factor

        geoms = (((wx0, wy0), (0, 0)),
                 ((wx0 * hx, wy0 * hy), (wx0 // 2, wy0 // 2)))
        for blk in range(self.num_blocks):
            # reference DSVTBlock (dsvt.py:161-195): shift_id = block_id % 2
            # picks base-vs-hybrid(shifted) windows; the two encoder layers
            # inside the block run y-axis then x-axis set partitions.
            wshape, shift = geoms[blk % 2]
            residual = x
            for li, x_major in enumerate((False, True)):
                # the reference's pos embed for layer i is computed from the
                # SHIFT-i window geometry, not the block's (the acknowledged
                # pos_embed mismatch at dsvt.py:184-191) — replicated here
                # for checkpoint compatibility
                pos_wshape, pos_shift = geoms[li]
                x = self._encoder_layer(
                    x, coords, batch_idx, valid, train, x_major, wshape,
                    shift, pos_wshape, pos_shift,
                    name=f"block{blk}_{li}", num_batch=b)
            # block-level residual + norm (dsvt.py:123-129 residual_norm)
            x = nn.LayerNorm(
                epsilon=1e-5, param_dtype=jnp.float32,
                name=f"res_norm{blk}")(
                (x + residual).astype(jnp.float32)).astype(self.dtype)
            x = jnp.where(valid[:, None], x, 0.0)
        return x.reshape(b, p, self.dim)

    def _encoder_layer(self, x, coords, batch_idx, valid, train, x_major,
                       wshape, shift, pos_wshape, pos_shift, name,
                       num_batch):
        from .vfe import MaskedBatchNorm

        p = x.shape[0]
        set_ids, slot, _ = self._partition(
            coords, batch_idx, valid, x_major, wshape, shift, num_batch)
        # pos-embed in-window coords use the layer-indexed geometry (see
        # __call__); computed directly — no sort needed
        inner_xy = jnp.stack(
            [(coords[:, 0] + pos_shift[0]) % pos_wshape[0],
             (coords[:, 1] + pos_shift[1]) % pos_wshape[1]], axis=-1)
        s, l = num_batch * self.max_sets, self.set_size
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

        # learned in-window position embedding, centered coords
        # (PositionEmbeddingLearned: Linear→BN→ReLU→Linear on
        # coors_in_win − window/2, dsvt_utils.py:10-24, dsvt.py:580-615)
        pe_in = (inner_xy.astype(jnp.float32)
                 - 0.5 * jnp.asarray(pos_wshape, jnp.float32))
        pe = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name=f"{name}_pos_fc1")(pe_in)
        pe = MaskedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_pos_bn")(pe, valid, train)
        pe = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name=f"{name}_pos_fc2")(nn.relu(pe))
        pe_buf = (
            jnp.zeros((s * l + 1, self.dim), pe.dtype)
            .at[flat_slot].set(pe, mode="drop")
        )[: s * l].reshape(s, l, self.dim)

        out_sets = _SetAttention(self.dim, self.num_heads,
                                 dim_ff=self.dim_ff, dtype=self.dtype,
                                 name=name)(sets, set_mask, pe_buf)
        # gather back to the pillar list (pillars beyond set capacity
        # keep their previous features)
        flat_out = out_sets.reshape(s * l, self.dim)
        gathered = jnp.take(
            jnp.concatenate([flat_out, jnp.zeros((1, self.dim), x.dtype)]),
            jnp.minimum(flat_slot, s * l), axis=0,
        )
        in_set = flat_slot < s * l
        x = jnp.where(in_set[:, None], gathered, x)
        return jnp.where(valid[:, None], x, 0.0)


def set_partition3d(coords, batch_idx, valid, x_major, window_shape, shift,
                    grid_shape, set_size, cap_sets):
    """3D window + rotated-set partition over a batch-flattened voxel list.

    coords (N, 3) int (ix, iy, iz), batch_idx (N,) → (set_ids (N,),
    slot_in_set (N,)). Windows are batch-offset (reference batch_win_inds,
    dsvt_utils.get_window_coors); in-window ordering keys follow
    get_set_single_shift (dsvt.py:540-566): y-major = y·wx·wz + x·wz + z,
    x-major = x·wy·wz + y·wz + z.
    """
    wx, wy, wz = window_shape
    nx, ny, nz = grid_shape
    sx = coords[:, 0] + shift[0]
    sy = coords[:, 1] + shift[1]
    sz = coords[:, 2] + shift[2]
    win_x, win_y, win_z = sx // wx, sy // wy, sz // wz
    n_win_x = -(-(nx + wx) // wx)
    n_win_y = -(-(ny + wy) // wy)
    n_win_z = -(-(nz + wz) // wz)
    n_win = n_win_x * n_win_y * n_win_z
    win_id = (batch_idx * n_win
              + (win_x * n_win_y + win_y) * n_win_z + win_z)
    inx, iny, inz = sx % wx, sy % wy, sz % wz
    if x_major:
        inner = (inx * wy + iny) * wz + inz
    else:
        inner = (iny * wx + inx) * wz + inz
    vol = wx * wy * wz
    order_key = win_id.astype(jnp.int32) * vol + inner.astype(jnp.int32)
    order = jnp.argsort(
        jnp.where(valid, order_key, jnp.iinfo(jnp.int32).max))
    win_sorted = jnp.take(win_id, order)
    valid_sorted = jnp.take(valid, order)
    rank_sorted = ingroup_inds(win_sorted, valid_sorted)
    rank = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)

    set_in_win = rank // set_size
    slot_in_set = rank % set_size
    # up to ceil(vol / set_size) sets per window; 128 covers the shipped
    # configs (12·12·32 / 48 = 96)
    set_key = win_id * 128 + jnp.clip(set_in_win, 0, 127)
    set_key_sorted = jnp.take(set_key, order)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), set_key_sorted[1:] != set_key_sorted[:-1]]
    ) & valid_sorted
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg = jnp.where(valid_sorted & (seg < cap_sets), seg, cap_sets)
    set_ids = jnp.zeros_like(seg).at[order].set(seg)
    set_ids = jnp.where(valid & (rank >= 0), set_ids, cap_sets)
    return set_ids, slot_in_set


class _StageReductionAtt(nn.Module):
    """Stage_ReductionAtt_Block (dsvt.py:292-310): query = channel max over
    the pool members (zeros fill empty slots — the reference never masks),
    keys = members + learned pos, 8-head MHA, out = LN(attn + query)."""

    dim: int
    pool_volume: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        """pooled (V, pv, C) zero-filled → (V, C)."""
        query = jnp.max(pooled, axis=1, keepdims=True)  # (V, 1, C)
        pos = self.param("pos_embedding", nn.initializers.normal(0.01),
                         (self.pool_volume, self.dim), jnp.float32)
        key_in = (pooled + pos[None]).astype(self.dtype)
        hd = self.dim // self.num_heads
        q = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="q")(query.astype(self.dtype))
        k = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype,
                            param_dtype=jnp.float32, name="k")(key_in)
        v = nn.DenseGeneral((self.num_heads, hd), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name="v")(pooled.astype(self.dtype))
        logits = jnp.einsum("vlhd,vmhd->vhlm", q * hd ** -0.5,
                            k).astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("vhlm,vmhd->vlhd", w, v).reshape(query.shape)
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="proj")(out)
        red = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32,
                           name="norm")(
            (out + query).astype(jnp.float32)).astype(self.dtype)
        return red[:, 0]


class DSVTVoxelBackbone(nn.Module):
    """Multi-stage 3D DSVT (reference dsvt_voxel.yaml:71-94 + dsvt.py
    DSVT/DSVTInputLayer): per stage, DSVTBlocks with 3D rotated-set window
    attention; between stages, subm z-pooling with the attention reduction
    block. The final stage's windows have z=1, so the output is a pillar
    list ready for the BEV scatter.

    Inputs are the batch's voxel lists: feats (B, V, C), coords (B, V, 3)
    int (ix, iy, iz), valid (B, V). Pooling compacts voxels across the
    batch, so the output is flat: (feats (B·V, dim), bev_coords (B·V, 2),
    batch_idx (B·V,), valid (B·V,)) of the last stage."""

    dim: int = 192
    num_heads: int = 8
    # (set_size, num_blocks) per stage — reference set_info
    set_info: Tuple[Tuple[int, int], ...] = ((48, 1),) * 4
    window_shape: Tuple[Tuple[int, int, int], ...] = (
        (12, 12, 32), (12, 12, 8), (12, 12, 2), (12, 12, 1))
    downsample_stride: Tuple[Tuple[int, int, int], ...] = (
        (1, 1, 4), (1, 1, 4), (1, 1, 2))
    sparse_shape: Tuple[int, int, int] = (468, 468, 32)
    hybrid_factor: Tuple[int, int, int] = (2, 2, 1)
    max_sets: int = 1024  # per sample per layer
    dim_ff: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, valid, train: bool = False):
        b, p, _ = feats.shape
        flat = feats.reshape(b * p, -1)
        coords = coords.reshape(b * p, 3)
        valid = valid.reshape(b * p)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)

        x = flat.astype(self.dtype)
        if flat.shape[-1] != self.dim:
            x = nn.Dense(self.dim, dtype=self.dtype,
                         param_dtype=jnp.float32, name="input_proj")(x)
        x = jnp.where(valid[:, None], x, 0.0)

        grid = tuple(self.sparse_shape)
        hx, hy, hz = self.hybrid_factor
        global_blk = 0  # the reference's block_id counter is GLOBAL across
        # stages (dsvt.py:117-130), so with one block per stage the stages
        # alternate base/shifted windows
        for s, (set_size, num_blocks) in enumerate(self.set_info):
            base_w = tuple(self.window_shape[s])
            hyb_w = (base_w[0] * hx, base_w[1] * hy, base_w[2] * hz)
            shift3 = (base_w[0] // 2, base_w[1] // 2, 0)
            geoms = ((base_w, (0, 0, 0)), (hyb_w, shift3))
            for blk in range(num_blocks):
                wshape, shift = geoms[global_blk % 2]
                global_blk += 1
                residual = x
                for li, x_major in enumerate((False, True)):
                    pos_w, pos_sh = geoms[li]
                    x = self._encoder_layer(
                        x, coords, batch_idx, valid, train, x_major,
                        wshape, shift, pos_w, pos_sh, grid, set_size,
                        num_batch=b, name=f"stage{s}_block{blk}_{li}")
                x = nn.LayerNorm(
                    epsilon=1e-5, param_dtype=jnp.float32,
                    name=f"stage{s}_res_norm{blk}")(
                    (x + residual).astype(jnp.float32)).astype(self.dtype)
                x = jnp.where(valid[:, None], x, 0.0)
            if s < len(self.set_info) - 1:
                x, coords, batch_idx, valid = self._pool(
                    x, coords, batch_idx, valid,
                    tuple(self.downsample_stride[s]), grid,
                    name=f"stage{s}_reduction")
                grid = (-(-grid[0] // self.downsample_stride[s][0]),
                        -(-grid[1] // self.downsample_stride[s][1]),
                        -(-grid[2] // self.downsample_stride[s][2]))
        # pooling compacts voxels across the batch, so the output keeps the
        # flat contract: features, BEV coords, per-voxel batch ids, valid
        return x, coords[:, :2], batch_idx, valid

    def _encoder_layer(self, x, coords, batch_idx, valid, train, x_major,
                       wshape, shift, pos_wshape, pos_shift, grid,
                       set_size, num_batch, name):
        from .vfe import MaskedBatchNorm

        p = x.shape[0]
        cap_sets = num_batch * self.max_sets
        set_ids, slot = set_partition3d(
            coords, batch_idx, valid, x_major, wshape, shift, grid,
            set_size, cap_sets)
        s, l = cap_sets, set_size
        flat_slot = jnp.where(
            (set_ids < s) & (slot < l), set_ids * l + slot, s * l)
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

        # pos embed on the layer-indexed window geometry (dsvt.py:184-191
        # pos_embed mismatch, replicated): centered (x, y[, z]) in-window
        # coords; the z channel is present only while the window has
        # z-extent (get_pos_embed ndim rule, dsvt.py:589-599)
        comps = [
            (coords[:, 0] + pos_shift[0]) % pos_wshape[0]
            - 0.5 * pos_wshape[0],
            (coords[:, 1] + pos_shift[1]) % pos_wshape[1]
            - 0.5 * pos_wshape[1],
        ]
        if pos_wshape[2] > 1:
            comps.append((coords[:, 2] + pos_shift[2]) % pos_wshape[2]
                         - 0.5 * pos_wshape[2])
        pe_in = jnp.stack(comps, axis=-1).astype(jnp.float32)
        pe = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name=f"{name}_pos_fc1")(pe_in)
        pe = MaskedBatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_pos_bn")(pe, valid, train)
        pe = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name=f"{name}_pos_fc2")(nn.relu(pe))
        pe_buf = (
            jnp.zeros((s * l + 1, self.dim), pe.dtype)
            .at[flat_slot].set(pe, mode="drop")
        )[: s * l].reshape(s, l, self.dim)

        out_sets = _SetAttention(self.dim, self.num_heads,
                                 dim_ff=self.dim_ff, dtype=self.dtype,
                                 name=name)(sets, set_mask, pe_buf)
        flat_out = out_sets.reshape(s * l, self.dim)
        gathered = jnp.take(
            jnp.concatenate([flat_out, jnp.zeros((1, self.dim), x.dtype)]),
            jnp.minimum(flat_slot, s * l), axis=0,
        )
        in_set = flat_slot < s * l
        x = jnp.where(in_set[:, None], gathered, x)
        return jnp.where(valid[:, None], x, 0.0)

    def _pool(self, x, coords, batch_idx, valid, stride, grid, name):
        """subm pooling (dsvt.py:445-469 + get_pooling_index): group voxels
        by strided coords, scatter into a zero-filled (V, pool_volume, C)
        buffer at index_in_pool, reduce with the attention block. First-seen
        order compaction; pooled coords from each group's members."""
        dsx, dsy, dsz = stride
        n = x.shape[0]
        px, py, pz = coords[:, 0] // dsx, coords[:, 1] // dsy, coords[:, 2] // dsz
        ngx = -(-grid[0] // dsx)
        ngy = -(-grid[1] // dsy)
        ngz = -(-grid[2] // dsz)
        key = (batch_idx * (ngx * ngy * ngz)
               + (px * ngy + py) * ngz + pz)
        order = jnp.argsort(jnp.where(valid, key, jnp.iinfo(jnp.int32).max))
        key_sorted = jnp.take(key, order)
        valid_sorted = jnp.take(valid, order)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]]
        ) & valid_sorted
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        seg = jnp.where(valid_sorted & (seg < n), seg, n)
        pooled_slot = jnp.zeros_like(seg).at[order].set(seg)
        pooled_slot = jnp.where(valid, pooled_slot, n)

        pv = dsx * dsy * dsz
        iip = ((coords[:, 0] % dsx) * (dsy * dsz)
               + (coords[:, 1] % dsy) * dsz + coords[:, 2] % dsz)
        buf = (
            jnp.zeros((n * pv + 1, self.dim), x.dtype)
            .at[jnp.where(pooled_slot < n, pooled_slot * pv + iip, n * pv)]
            .set(x, mode="drop")
        )[: n * pv].reshape(n, pv, self.dim)
        red = _StageReductionAtt(self.dim, pv, dtype=self.dtype,
                                 name=name)(buf)

        num_pooled = jnp.sum(is_start.astype(jnp.int32))
        pooled_valid = jnp.arange(n) < num_pooled
        pcoords = jnp.stack([px, py, pz], axis=-1)
        pooled_coords = (
            jnp.zeros((n + 1, 3), jnp.int32)
            .at[jnp.where(is_start, seg, n)]
            .set(jnp.take(pcoords, order, axis=0), mode="drop")
        )[:n]
        pooled_batch = (
            jnp.zeros((n + 1,), jnp.int32)
            .at[jnp.where(is_start, seg, n)]
            .set(jnp.take(batch_idx, order), mode="drop")
        )[:n]
        red = jnp.where(pooled_valid[:, None], red, 0.0)
        return red, pooled_coords, pooled_batch, pooled_valid
