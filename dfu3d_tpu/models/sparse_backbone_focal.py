"""Focal Sparse Convolution backbone — TPU-native VoxelBackBone8xFocal.

Reference: pcdet/models/backbones_3d/spconv_backbone_focal.py (stage layout)
+ focal_sparse_conv/focal_sparse_conv.py (FocalSparseConv) +
focal_sparse_conv/focal_sparse_utils.py (split_voxels / check_repeat /
FocalLoss). The CUDA design predicts per-voxel importance (a K³-channel SubM
conv: K³−1 kernel-offset scores + 1 cubic-center score), splits voxels into
foreground/background by the center score, DILATES each foreground voxel to
the kernel offsets whose score clears a threshold (new zero-feature voxels),
dedups, and runs the main SubM conv over the enlarged active set. Training
adds a focal loss pushing the center score toward "voxel center inside a GT
box".

TPU redesign (static shapes, no per-batch Python loops):
* voxel sets are fixed-capacity (B, V) buffers; dilation appends a fixed
  `dilate_cap` block of candidate slots instead of torch.cat of dynamic sets.
* candidate selection = masked top-k over the (V·(K³−1)) flattened kernel
  scores (candidates must be in-grid, not already active, and above the
  threshold); duplicates among candidates resolve by a scatter-max
  "winner-takes-the-cell" pass over the dense cell map (one int32 scatter +
  one gather, same machinery as sparse_ops.build_cell_map).
* the reference's check_repeat sums duplicate features and AVERAGES their
  kernel-mask multipliers, which can down-scale an original foreground
  voxel's features when a candidate lands on it; here original voxels always
  win their cell with multiplier 1 — a deliberate, cleaner deviation.
* topk split: the reference takes the top `threshold` FRACTION of the
  per-sample voxels by center score (split_voxels:112-115); implemented with
  a per-sample rank from one argsort.

The full 27-tap importance conv + focal loss + dilation machinery runs
batched under vmap-free 2D indexing; only the main conv touches the MXU.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry.boxes import points_in_boxes
from ..core.voxel.sparse_ops import SparseGrid, kernel_offsets
from ..core.voxel.sparse_ops import map_bases
from .sparse_backbone import (
    SparseBatchNorm,
    SparseConv3dDown,
    SparseConvBlock,
    SparseTensor,
    SubMConv3d,
    _batched_cell_map,
    _batched_neighbors,
)


def binary_focal_loss(p, target, valid, gamma: float = 2.0, eps: float = 1e-7):
    """Reference FocalLoss (focal_sparse_utils.py:7-37): softmax over the
    two-class stack [1−p, p], clamp, −y·log(q)·(1−q)^γ, mean over classes and
    (valid) voxels. With q already a probability the softmax is the identity
    two-class form, so this is the exact binary equivalent."""
    p = jnp.clip(p, eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    # per-voxel sum over the two one-hot classes
    loss_pos = -t * jnp.log(p) * (1.0 - p) ** gamma
    loss_neg = -(1.0 - t) * jnp.log(1.0 - p) * p ** gamma
    per_voxel = loss_pos + loss_neg
    m = valid.astype(jnp.float32)
    # reference .mean() divides by N·2 (both class slots)
    return jnp.sum(per_voxel * m) / jnp.maximum(jnp.sum(m) * 2.0, 1.0)


class FocalSparseConv(nn.Module):
    """SubM conv over a learned, dilated active set (FocalSparseConv,
    focal_sparse_conv.py:9-224, lidar path; `use_img` fusion is handled by
    the caller passing pre-fused per-voxel image features via `extra_feats`).

    Returns (SparseTensor with capacity V + dilate_cap, loss_box_of_pts).
    """

    channels: int
    voxel_stride: int
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, ...]
    dilate_cap: int
    kernel_size: int = 3
    topk: bool = True
    threshold: float = 0.5
    mask_multi: bool = False
    skip_mask_kernel: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, gt_boxes, gt_valid, train: bool,
                 nbr=None, extra_feats=None):
        b, v, cin = st.features.shape
        k3 = self.kernel_size ** 3
        # non-center offsets, channel-aligned with conv_imp outputs 0..K³−2
        # (reference kernel_offsets with [0,0,0] removed, :42-44)
        all_off = kernel_offsets(self.kernel_size, self.kernel_size,
                                 self.kernel_size)
        noncenter = np.array([o for o in all_off if not np.all(o == 0)],
                             np.int32)

        # importance prediction (conv_imp, :40); optional enlarged/multimodal
        # input stream
        imp_in = st
        if extra_feats is not None:
            imp_in = SparseTensor(
                jnp.concatenate(
                    [st.features, extra_feats.astype(st.features.dtype)],
                    axis=-1),
                st.coords, st.valid, st.grid)
        imps = SubMConv3d(k3, (self.kernel_size,) * 3, dtype=self.dtype,
                          name="conv_imp")(imp_in, nbr if extra_feats is None
                                           else None).features
        imps = imps.astype(jnp.float32)
        mask_voxel = jax.nn.sigmoid(imps[..., -1])          # (B, V)
        mask_kernel = jax.nn.sigmoid(imps[..., :-1])        # (B, V, K³−1)

        # focal loss toward "voxel center inside a GT box" (:136-167)
        loss = jnp.zeros((), jnp.float32)
        if train:
            pcr = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
            vs = jnp.asarray(self.voxel_size, jnp.float32) * self.voxel_stride
            centers = (st.coords.astype(jnp.float32) + 0.5) * vs + pcr

            def in_any_box(c, g, gv):
                hits = points_in_boxes(c, g[:, :7]) & gv[None, :]
                return jnp.any(hits, axis=-1)

            target = jax.vmap(in_any_box)(centers, gt_boxes, gt_valid)
            loss = binary_focal_loss(mask_voxel, target, st.valid)

        # fore/back split (split_voxels:109-118)
        if self.topk:
            neg = jnp.where(st.valid, -mask_voxel, jnp.inf)
            order = jnp.argsort(neg, axis=1)                 # desc by score
            rank = jnp.zeros((b, v), jnp.int32)
            rank = jax.vmap(
                lambda o: jnp.zeros((v,), jnp.int32).at[o].set(
                    jnp.arange(v, dtype=jnp.int32))
            )(order)
            n_valid = jnp.sum(st.valid, axis=1, keepdims=True)
            n_fore = (n_valid.astype(jnp.float32) * self.threshold).astype(jnp.int32)
            fore = st.valid & (rank < n_fore)
        else:
            fore = st.valid & (mask_voxel > self.threshold)

        feats = st.features
        if self.mask_multi:  # (:109-110) — applied to ALL voxels of the batch
            feats = feats * mask_voxel[..., None].astype(feats.dtype)

        # dilation candidates: fore voxel + offset where kernel score clears
        # the threshold and the cell is in-grid and not already active
        g = st.grid
        off = jnp.asarray(noncenter)                         # (K³−1, 3)
        cand = st.coords[:, :, None, :] + off[None, None]    # (B, V, K-1, 3)
        cx, cy, cz = cand[..., 0], cand[..., 1], cand[..., 2]
        in_grid = ((cx >= 0) & (cx < g.nx) & (cy >= 0) & (cy < g.ny)
                   & (cz >= 0) & (cz < g.nz))
        score_ok = mask_kernel >= self.threshold
        cand_ok = fore[:, :, None] & score_ok & in_grid
        lin = jnp.where(cand_ok, (cz * g.ny + cy) * g.nx + cx, g.num_cells)

        cmap = _batched_cell_map(g, st.coords, st.valid)
        assert cmap is not None, (
            "FocalSparseConv requires a dense-cell-map-sized grid "
            f"(num_cells={g.num_cells})"
        )
        # padded FLAT map layout (build_cell_map_batched): element b's cell c
        # at index b·stride + c + 1, value slot+1 with 0 = empty
        bases = map_bases(g, b)[:, None]
        occupied = jnp.take(
            cmap.slots, (bases + lin.reshape(b, -1) + 1).reshape(-1), axis=0
        ).reshape(lin.shape) > 0
        cand_ok = cand_ok & ~occupied

        nk = v * (k3 - 1)
        flat_lin = jnp.where(cand_ok, lin, g.num_cells).reshape(b, nk)
        flat_score = jnp.where(cand_ok, mask_kernel, -1.0).reshape(b, nk)
        # winner-takes-the-cell dedup among candidates: highest score wins
        # (scatter-max of score-ordered ranks; ties resolve to one slot)
        order_sc = jnp.argsort(-flat_score, axis=1)
        # process in descending-score order; first writer wins via cmap set
        winner = jax.vmap(
            lambda l, o: jnp.full((g.num_cells + 1,), -1, jnp.int32)
            .at[jnp.take(l, o)].set(o, mode="drop")
        )(flat_lin, order_sc)
        own = jnp.take_along_axis(winner, flat_lin, axis=1)
        is_winner = (own == jnp.arange(nk, dtype=jnp.int32)[None]) & (
            flat_score > 0.0
        )
        # NOTE .at[].set with duplicate indices keeps an unspecified writer;
        # correctness needs only SOME single winner per cell, which this
        # gives (the score ordering above biases toward high scores but is
        # not load-bearing).
        sel_score = jnp.where(is_winner, flat_score, -1.0)
        top_score, top_idx = jax.lax.top_k(sel_score, self.dilate_cap)
        new_valid = top_score > 0.0                          # (B, dilate_cap)
        flat_cand = cand.reshape(b, nk, 3)
        new_coords = jnp.take_along_axis(
            flat_cand, top_idx[..., None], axis=1
        )
        new_coords = jnp.where(new_valid[..., None], new_coords, 0)

        # combine: originals keep their features (multiplier 1); dilated
        # voxels enter with zero features (their mask_kernel multiplier is a
        # no-op on zeros — kept out for clarity; skip_mask_kernel covered)
        out_feats = jnp.concatenate(
            [feats, jnp.zeros((b, self.dilate_cap, cin), feats.dtype)], axis=1
        )
        out_coords = jnp.concatenate([st.coords, new_coords], axis=1)
        out_valid = jnp.concatenate([st.valid, new_valid], axis=1)
        out_st = SparseTensor(out_feats, out_coords, out_valid, g)

        # main SubM conv over the enlarged set (+BN+ReLU, :216-223)
        out_st = SubMConv3d(self.channels, (self.kernel_size,) * 3,
                            dtype=self.dtype, name="conv")(out_st)
        x = nn.relu(SparseBatchNorm(dtype=self.dtype, name="bn")(
            out_st.features, out_st.valid, train))
        x = jnp.where(out_st.valid[..., None], x, 0.0)
        return SparseTensor(x, out_st.coords, out_st.valid, g), loss


class VoxelBackBone8xFocal(nn.Module):
    """VoxelBackBone8x with FocalSparseConv closing stages 1-3 (reference
    spconv_backbone_focal.VoxelBackBone8xFocal:101-269, lidar path; the
    USE_IMG multimodal stream feeds `image_feats` — per-voxel projected image
    features for stage 1 — through the detector).

    Returns (bev SparseTensor, [x_conv1..x_conv4] stage tensors at strides
    1/2/4/8 — the reference's multi_scale_3d_features for RoI pooling,
    :252-259 — and loss_box_of_pts). Capacities grow by `dilate_frac`·cap per
    focal layer.
    """

    grid: SparseGrid
    voxel_cap: int
    point_cloud_range: Tuple[float, ...]
    voxel_size: Tuple[float, ...]
    channels: Sequence[int] = (16, 16, 32, 64, 64)
    out_channels: int = 128
    topk: bool = True
    threshold: float = 0.5
    kernel_size: int = 3
    mask_multi: bool = False
    skip_mask_kernel: bool = False
    dilate_frac: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, coords, valid, train: bool, gt_boxes=None,
                 gt_valid=None, image_feats=None):
        if gt_boxes is None:  # eval: focal loss off, targets unused
            gt_boxes = jnp.zeros((features.shape[0], 1, 8), jnp.float32)
            gt_valid = jnp.zeros((features.shape[0], 1), bool)
        st = SparseTensor(features.astype(self.dtype), coords, valid, self.grid)
        offsets = kernel_offsets(3, 3, 3)
        total_loss = jnp.zeros((), jnp.float32)

        def focal(st, ch, stride, name, extra=None):
            cap = max(int(st.features.shape[1] * self.dilate_frac), 16)
            return FocalSparseConv(
                channels=ch, voxel_stride=stride,
                point_cloud_range=tuple(self.point_cloud_range),
                voxel_size=tuple(np.asarray(self.voxel_size) * stride),
                dilate_cap=cap, kernel_size=self.kernel_size,
                topk=self.topk, threshold=self.threshold,
                mask_multi=self.mask_multi,
                skip_mask_kernel=self.skip_mask_kernel,
                dtype=self.dtype, name=name,
            )(st, gt_boxes, gt_valid, train, extra_feats=extra)

        def down(st, ch, cap, name, z_only=False):
            st = SparseConv3dDown(ch, out_cap=cap, z_only=z_only,
                                  dtype=self.dtype, name=name)(st, train=train)
            x = nn.relu(SparseBatchNorm(dtype=self.dtype, name=f"{name}_bn")(
                st.features, st.valid, train))
            x = jnp.where(st.valid[..., None], x, 0.0)
            return SparseTensor(x, st.coords, st.valid, st.grid)

        cap = self.voxel_cap
        st = SparseConvBlock(self.channels[0], dtype=self.dtype,
                             name="conv_input")(st, train)
        # conv1: subm block + focal at stride 1 (:156-159); the multimodal
        # conv_focal_multimodal (:147-149, USE_IMG) fuses image features here
        st = SparseConvBlock(self.channels[1], dtype=self.dtype,
                             name="conv1")(st, train)
        st, l1 = focal(st, self.channels[1], 1, "focal1", extra=image_feats)
        total_loss = total_loss + l1
        s1 = st

        st = down(st, self.channels[2], max(cap // 2, 16), "down2")
        st = SparseConvBlock(self.channels[2], dtype=self.dtype,
                             name="conv2a")(st, train)
        st = SparseConvBlock(self.channels[2], dtype=self.dtype,
                             name="conv2b")(st, train)
        st, l2 = focal(st, self.channels[2], 2, "focal2")
        total_loss = total_loss + l2
        s2 = st

        st = down(st, self.channels[3], max(cap // 4, 16), "down3")
        st = SparseConvBlock(self.channels[3], dtype=self.dtype,
                             name="conv3a")(st, train)
        st = SparseConvBlock(self.channels[3], dtype=self.dtype,
                             name="conv3b")(st, train)
        st, l3 = focal(st, self.channels[3], 4, "focal3")
        total_loss = total_loss + l3
        s4 = st

        st = down(st, self.channels[4], max(cap // 8, 16), "down4")
        st = SparseConvBlock(self.channels[4], dtype=self.dtype,
                             name="conv4a")(st, train)
        st = SparseConvBlock(self.channels[4], dtype=self.dtype,
                             name="conv4b")(st, train)
        s8 = st
        st = down(st, self.out_channels, max(cap // 8, 16), "conv_out",
                  z_only=True)
        return st, [s1, s2, s4, s8], total_loss
