"""VoxelNeXt: fully sparse voxel detector.

Reference: pcdet/models/detectors/voxelnext.py + backbones_3d
VoxelResBackBone8xVoxelNeXt + dense_heads/voxelnext_head.py (559 LoC sparse
head). Reference-exact structure on this repo's sparse substrate:

* backbone (BACKBONE_3D.NAME VoxelResBackBone8xVoxelNeXt): the residual
  encoder of spconv_backbone_voxelnext.py — conv_input + 2 res blocks, five
  (strided down + 2 res) stages at strides 2..32 with SPCONV_KERNEL_SIZES —
  conv5/conv6 coords scaled back onto the stride-8 grid, row-concatenated
  and z-collapsed by per-cell feature summation (bev_out), then conv_out +
  shared_conv over the sparse BEV set. No dense BEV tensor is ever built.
  (A legacy compact path keeps the old VoxelBackBone8x + plain downs.)
* head: one SeparateHead per CLASS_NAMES_EACH_HEAD group — each branch
  (num_conv−1) × [SubM2d(KERNEL_SIZE_HEAD) + BN + ReLU] + biased 1×1 pred
  (hm bias −2.19); per-class regressions decode from the class's own group
  branch (reg stacked (B, V, G, D)).
* targets: each gt box claims its nearest active BEV voxel (heatmap 1) with a
  distance-gaussian on the remaining voxels (centernet_utils.
  draw_gaussian_to_heatmap_voxels semantics).
* decode: top-K over (voxel, class) scores + rotated NMS; fixed-size masked
  output.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry.nms import nms_bev
from ..core.voxel import VoxelGrid, dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid, downsample_coords
from . import losses
from .column_sparse import select_backbone8x
from .sparse_backbone import (
    SparseConvBlock,
    SparseConv3dDown,
    SparseBatchNorm,
    SparseTensor,
    VoxelBackBone8x,
    VoxelResBackBone8xVoxelNeXt,
)


class VoxelNeXtSeparateHead(nn.Module):
    """SeparateHead for one class group (voxelnext_head.py:13-47): each
    branch is (num_conv−1) × [SubM2d(k) + BN + ReLU] + a biased 1×1 pred
    (hm bias init −2.19). KERNEL_SIZE_HEAD=1 (the nuScenes config) makes the
    stack pointwise. Deviation: USE_BIAS_BEFORE_NORM's conv bias is folded
    into the following BN (exact at eval; converter folds it into the
    running mean)."""

    num_hm_out: int
    head_dict: Any            # branch -> {out_channels, num_conv}
    num_hm_conv: int = 2
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bev: SparseTensor, train: bool):
        branches = {k: dict(v) for k, v in dict(self.head_dict).items()}
        branches["hm"] = {"out_channels": self.num_hm_out,
                          "num_conv": self.num_hm_conv}
        k = int(self.kernel_size)
        outs = {}
        for name in sorted(branches):
            d = branches[name]
            st = bev
            for i in range(int(d["num_conv"]) - 1):
                st = SparseConvBlock(
                    bev.features.shape[-1], kernel_size=(k, k, 1),
                    dtype=self.dtype, name=f"{name}_conv{i}",
                )(st, train)
            bias_init = (nn.initializers.constant(-2.19) if name == "hm"
                         else nn.initializers.zeros)
            outs[name] = nn.Dense(
                int(d["out_channels"]), param_dtype=jnp.float32,
                bias_init=bias_init, name=f"{name}_out",
            )(st.features.astype(jnp.float32))
        return outs


def sparse_bev_collapse(st: SparseTensor, out_cap: int):
    """Collapse z: unique (x, y) cells, features summed (VoxelNeXt z-pooling)."""
    g = st.grid
    bev_grid = SparseGrid(g.nx, g.ny, 1)
    flat_coords = jnp.concatenate(
        [st.coords[..., 0:2], jnp.zeros_like(st.coords[..., 2:3])], axis=-1
    )

    def one(c, v, f):
        out_coords, out_valid, slot = downsample_coords(
            bev_grid, c * jnp.array([1, 1, 0]), v, out_cap, z_only=True
        )
        summed = jax.ops.segment_sum(
            jnp.where(v[:, None], f, 0.0).astype(jnp.float32), slot,
            num_segments=out_cap,
        )
        return out_coords, out_valid, summed

    # NOTE: downsample_coords halves z when z_only; with z pre-zeroed the
    # parent cell is (x, y, 0) as required.
    coords = flat_coords
    out_coords, out_valid, feats = jax.vmap(one)(coords, st.valid, st.features)
    return SparseTensor(
        feats.astype(st.features.dtype), out_coords, out_valid, bev_grid
    )


class VoxelNeXt(nn.Module):
    model_cfg: Any
    class_names: Sequence[str]
    grid: VoxelGrid
    dtype: jnp.dtype = jnp.float32
    max_voxels: int = 16000

    @property
    def cfg(self):
        from ..utils.config import thaw_cfg

        return thaw_cfg(self.model_cfg)

    def setup(self):
        cfg = self.cfg
        nx, ny, nz = self.grid.grid_size
        bb3d = cfg.get("BACKBONE_3D", {})
        dh = cfg.DENSE_HEAD
        self.ref_backbone = bb3d.get("NAME", "VoxelBackBone8x") in (
            "VoxelResBackBone8xVoxelNeXt", "VoxelResBackBone8xVoxelNeXt2D"
        )
        if self.ref_backbone:
            out_ch = int(bb3d.get("OUT_CHANNEL", bb3d.get("OUT_CHANNELS",
                                                          128)))
            self.backbone_3d = VoxelResBackBone8xVoxelNeXt(
                grid=SparseGrid(nx, ny, nz),
                voxel_cap=self.max_voxels,
                channels=tuple(bb3d.get("CHANNELS", (16, 32, 64, 128, 128))),
                kernel_sizes=tuple(bb3d.get("SPCONV_KERNEL_SIZES",
                                            (3, 3, 3, 3))),
                dtype=self.dtype,
            )
            # conv_out (sparse 2D 3×3 over the collapsed BEV set — subm
            # output-set deviation documented) + shared_conv
            # (spconv_backbone_voxelnext.py:127-139)
            self.conv_out = SparseConvBlock(
                out_ch, kernel_size=(3, 3, 1), dtype=self.dtype,
                name="conv_out")
            self.shared_conv = SparseConvBlock(
                int(dh.get("SHARED_CONV_CHANNEL", out_ch)),
                kernel_size=(3, 3, 1), dtype=self.dtype, name="shared_conv")
        else:  # legacy compact path
            self.backbone_3d = select_backbone8x(bb3d)(
                grid=SparseGrid(nx, ny, nz),
                voxel_cap=self.max_voxels,
                channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
                out_channels=bb3d.get("OUT_CHANNELS", 128),
                dtype=self.dtype,
            )
            ch = bb3d.get("OUT_CHANNELS", 128)
            self.down16 = SparseConv3dDown(
                ch, out_cap=max(self.max_voxels // 16, 16), dtype=self.dtype
            )
            self.down32 = SparseConv3dDown(
                ch, out_cap=max(self.max_voxels // 32, 16), dtype=self.dtype
            )
            self.shared_blocks = [
                SparseConvBlock(
                    dh.get("SHARED_CONV_CHANNEL", 128), kernel_size=(3, 3, 1),
                    dtype=self.dtype, name=f"bev_block{i}",
                )
                for i in range(dh.get("NUM_SHARED_BLOCKS", 2))
            ]

        # class groups (CLASS_NAMES_EACH_HEAD, voxelnext_head.py:80-88):
        # one SeparateHead per group; per-class regressions come from the
        # class's own group branch
        names = list(self.class_names)
        groups_cfg = dh.get("CLASS_NAMES_EACH_HEAD", None) or [names]
        n2i = {n: i for i, n in enumerate(names)}
        self.class_groups = tuple(
            tuple(n2i[n] for n in g if n in n2i) for g in groups_cfg
        )
        c2g = np.zeros(len(names), np.int32)
        for gi, g in enumerate(self.class_groups):
            for c in g:
                c2g[c] = gi
        self._class_to_group = tuple(int(x) for x in c2g)

        shc = dh.get("SEPARATE_HEAD_CFG", {})
        self.use_vel = "vel" in list(shc.get("HEAD_ORDER", []))
        hd = {k: dict(v) for k, v in dict(shc.get("HEAD_DICT", {})).items()}
        legacy_heads = not hd
        if legacy_heads:  # pointwise pred-only branches (old Dense heads)
            hd = {"center": {"out_channels": 2, "num_conv": 1},
                  "center_z": {"out_channels": 1, "num_conv": 1},
                  "dim": {"out_channels": 3, "num_conv": 1},
                  "rot": {"out_channels": 2, "num_conv": 1}}
            if self.use_vel:
                hd["vel"] = {"out_channels": 2, "num_conv": 1}
        # IoU branch (voxelnext_ioubranch configs / voxelnext_head.py IoU
        # path): per-voxel IoU estimate, L1-trained against the decoded
        # box's actual IoU, rectifying scores at inference
        self.use_iou_branch = bool(dh.get("IOU_BRANCH", False)) or "iou" in hd
        if self.use_iou_branch and "iou" not in hd:
            hd["iou"] = {"out_channels": 1, "num_conv": 1}
        self._reg_dim = 8 + (2 if self.use_vel else 0)
        self._out_dim = self._reg_dim + (1 if self.use_iou_branch else 0)
        self.sep_heads = [
            VoxelNeXtSeparateHead(
                num_hm_out=len(g), head_dict=hd,
                num_hm_conv=int(dh.get("NUM_HM_CONV",
                                       1 if legacy_heads else 2)),
                kernel_size=int(dh.get("KERNEL_SIZE_HEAD", 3)),
                dtype=self.dtype, name=f"head_{gi}",
            )
            for gi, g in enumerate(self.class_groups)
        ]
        rect = dh.get("IOU_RECTIFIER", dh.get("RECTIFIER", 0.68))
        self.iou_rectifier = (
            [float(r) for r in rect] if isinstance(rect, (list, tuple))
            else [float(rect)] * len(self.class_names)
        )
        self.bev_cap = int(cfg.get("BEV_CAP", self.max_voxels // 4))

    def _features(self, batch, train: bool):
        return self._features_pts(batch.points, batch.points_valid, train)

    def _features_pts(self, points, points_valid, train: bool):
        def voxelize_one(points, valid):
            vox = dynamic_voxelize(self.grid, points, valid, self.max_voxels)
            sums = jax.ops.segment_sum(
                jnp.where(valid[:, None], points, 0.0),
                vox.point_to_voxel, num_segments=self.max_voxels,
            )
            counts = jax.ops.segment_sum(
                valid.astype(jnp.float32), vox.point_to_voxel,
                num_segments=self.max_voxels,
            )
            feats = sums / jnp.maximum(counts, 1.0)[:, None]
            return feats, vox.voxel_coords, vox.voxel_valid

        feats, coords, valid = jax.vmap(voxelize_one)(points, points_valid)
        if self.ref_backbone:
            st8, st16, st32 = self.backbone_3d(feats, coords, valid, train)
        else:
            st8 = self.backbone_3d(feats, coords, valid, train)
            st16 = self.down16(st8, train=train)
            st32 = self.down32(st16, train=train)
        # map coarser voxels back onto the stride-8 grid and concatenate sets
        coords16 = jnp.concatenate(
            [st16.coords[..., 0:2] * 2, st16.coords[..., 2:3]], axis=-1
        )
        coords32 = jnp.concatenate(
            [st32.coords[..., 0:2] * 4, st32.coords[..., 2:3]], axis=-1
        )
        all_coords = jnp.concatenate([st8.coords, coords16, coords32], axis=1)
        all_feats = jnp.concatenate(
            [st8.features, st16.features, st32.features], axis=1
        )
        all_valid = jnp.concatenate([st8.valid, st16.valid, st32.valid], axis=1)
        merged = SparseTensor(all_feats, all_coords, all_valid, st8.grid)

        bev = sparse_bev_collapse(merged, self.bev_cap)
        if self.ref_backbone:
            bev = self.conv_out(bev, train)
            bev = self.shared_conv(bev, train)
        else:
            for blk in self.shared_blocks:
                bev = blk(bev, train)

        # per-group SeparateHeads: global hm assembled from group columns;
        # reg stacked (B, V, G, D) with D = 8 (+vel 2) (+iou 1)
        num_cls = len(self.class_names)
        hm = jnp.zeros(bev.valid.shape + (num_cls,), jnp.float32)
        regs = []
        for head, grp in zip(self.sep_heads, self.class_groups):
            outs = head(bev, train)
            for j, c in enumerate(grp):
                hm = hm.at[..., c].set(outs["hm"][..., j])
            parts = [outs["center"], outs["center_z"], outs["dim"],
                     outs["rot"]]
            if self.use_vel:
                parts.append(outs["vel"])
            if self.use_iou_branch:
                parts.append(outs["iou"])
            regs.append(jnp.concatenate(parts, axis=-1))
        reg = jnp.stack(regs, axis=2)
        return bev, hm, reg

    def _gather_group_reg(self, reg, vox, grp):
        """reg (B, V, G, D), vox (B, K) voxel slots, grp (B, K) group ids →
        (B, K, D): each selection reads its class's own group branch."""
        b, v, g, d = reg.shape
        r = jnp.take_along_axis(
            reg.reshape(b, v, g * d), vox[..., None], axis=1
        ).reshape(b, -1, g, d)
        return jnp.take_along_axis(r, grp[..., None, None], axis=2)[:, :, 0]

    def _voxel_xy(self, bev: SparseTensor):
        """BEV voxel centers in world coords (stride-8 cells)."""
        pcr = jnp.asarray(self.grid.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.grid.voxel_size, jnp.float32)
        stride = 8.0
        x = (bev.coords[..., 0].astype(jnp.float32) + 0.5) * vs[0] * stride + pcr[0]
        y = (bev.coords[..., 1].astype(jnp.float32) + 0.5) * vs[1] * stride + pcr[1]
        return x, y

    def assign_targets(self, bev: SparseTensor, gt_boxes, gt_valid):
        """Nearest-active-voxel assignment + distance gaussian."""
        vx, vy = self._voxel_xy(bev)  # (B, V)
        gx, gy = gt_boxes[..., 0], gt_boxes[..., 1]  # (B, M)
        cls_id = gt_boxes[..., -1].astype(jnp.int32)
        live = gt_valid & (cls_id > 0) & (gt_boxes[..., 3] > 0)

        d2 = (
            (vx[:, :, None] - gx[:, None, :]) ** 2
            + (vy[:, :, None] - gy[:, None, :]) ** 2
        )  # (B, V, M)
        d2 = jnp.where(live[:, None, :] & bev.valid[..., None], d2, 1e12)
        nearest = jnp.argmin(d2, axis=1)  # (B, M) voxel slot per gt
        min_d2 = jnp.min(d2, axis=1)
        claimed = live & (min_d2 < (8.0 * 4) ** 2)  # gt must land near a voxel

        # gaussian heatmap over voxels per class: σ from box size (min_radius 2)
        stride_m = 8.0 * self.grid.voxel_size[0]
        radius = jnp.maximum(
            jnp.minimum(gt_boxes[..., 3], gt_boxes[..., 4]) / (2 * stride_m), 2.0
        )
        sigma = (2 * radius + 1) / 6.0  # (B, M)
        g = jnp.exp(-d2 / (2 * (sigma[:, None, :] * stride_m) ** 2))
        g = jnp.where(claimed[:, None, :], g, 0.0)

        num_cls = len(self.class_names)
        hm_t = jnp.zeros(bev.valid.shape + (num_cls,), jnp.float32)
        for c in range(num_cls):
            sel = claimed & (cls_id == c + 1)
            hm_c = jnp.max(jnp.where(sel[:, None, :], g, 0.0), axis=2)
            hm_t = hm_t.at[..., c].set(hm_c)
        # exact peak 1 at the claimed nearest voxel
        b_idx = jnp.arange(gt_boxes.shape[0])[:, None]
        peak_val = jnp.where(claimed, 1.0, 0.0)
        hm_t = hm_t.at[b_idx, nearest, jnp.clip(cls_id - 1, 0, num_cls - 1)].max(
            peak_val
        )

        # regression targets at the claimed voxels
        vxg = jnp.take_along_axis(vx, nearest, axis=1)
        vyg = jnp.take_along_axis(vy, nearest, axis=1)
        reg_t = jnp.stack(
            [
                gx - vxg,
                gy - vyg,
                gt_boxes[..., 2],
                jnp.log(jnp.maximum(gt_boxes[..., 3], 1e-6)),
                jnp.log(jnp.maximum(gt_boxes[..., 4], 1e-6)),
                jnp.log(jnp.maximum(gt_boxes[..., 5], 1e-6)),
                jnp.cos(gt_boxes[..., 6]),
                jnp.sin(gt_boxes[..., 6]),
            ],
            axis=-1,
        )
        if self.use_vel:
            assert gt_boxes.shape[-1] >= 10, (
                "a 'vel' VoxelNeXt head needs velocity-width (10-col) gt")
            reg_t = jnp.concatenate([reg_t, gt_boxes[..., 7:9]], axis=-1)
        return hm_t, nearest, reg_t, claimed

    def __call__(self, batch, train: bool = True):
        bev, hm, reg = self._features(batch, train)
        hm_t, inds, reg_t, mask = self.assign_targets(
            bev, batch.gt_boxes, batch.gt_valid
        )
        # each gt supervises its own class group's branch
        cls_id = batch.gt_boxes[..., -1].astype(jnp.int32)
        grp = jnp.asarray(self._class_to_group, jnp.int32)[
            jnp.clip(cls_id - 1, 0, len(self.class_names) - 1)
        ]
        rp = self._gather_group_reg(reg, inds, grp)  # (B, M, D)
        ident = jnp.broadcast_to(
            jnp.arange(rp.shape[1])[None], rp.shape[:2]
        )
        hm_prob = losses.sigmoid_clamped(hm)
        hm_prob = jnp.where(bev.valid[..., None], hm_prob, 1e-4)
        hm_loss = losses.focal_loss_centernet(hm_prob, hm_t)
        reg_loss = losses.reg_loss_centernet(
            rp[..., : self._reg_dim], reg_t, ident, mask
        )
        lw = self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        code_w = jnp.asarray(
            lw.get("code_weights", [1.0] * self._reg_dim), jnp.float32
        )[: self._reg_dim]
        total = (
            hm_loss * lw.get("cls_weight", 1.0)
            + jnp.sum(reg_loss * code_w) * lw.get("loc_weight", 0.25)
        )
        tb = {"hm_loss": hm_loss}
        if self.use_iou_branch:
            # L1 between tanh(iou_pred) at each claimed voxel and the actual
            # IoU3D of the decoded box vs its gt (SECONDNetIoU convention)
            from ..core.geometry.iou import aligned_iou3d

            vx, vy = self._voxel_xy(bev)
            boxes_p = jnp.stack(
                [
                    jnp.take_along_axis(vx, inds, axis=1) + rp[..., 0],
                    jnp.take_along_axis(vy, inds, axis=1) + rp[..., 1],
                    rp[..., 2],
                    jnp.exp(rp[..., 3]), jnp.exp(rp[..., 4]),
                    jnp.exp(rp[..., 5]),
                    jnp.arctan2(rp[..., 7], rp[..., 6]),
                ],
                axis=-1,
            )
            actual = jax.vmap(aligned_iou3d)(
                jax.lax.stop_gradient(boxes_p), batch.gt_boxes[..., :7]
            )
            w = mask.astype(jnp.float32)
            w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
            iou_loss = jnp.sum(
                jnp.abs(jnp.tanh(rp[..., self._reg_dim]) - actual) * w
            ) / reg.shape[0]
            total = total + iou_loss
            tb["iou_loss"] = iou_loss
        tb["rpn_loss"] = total
        return total, tb

    def _tta_double_flip(self, batch):
        """double_flip TTA: forward orig + yflip + xflip + xyflip point sets,
        un-flip each copy's BEV cells and regression channels, average
        activated predictions over matching cells, decode once.

        TPU-first equivalent of the reference's processor-side copy expansion
        (data_processor.py:117,158-180) + VoxelNeXtHead.merge_double_flip
        (voxelnext_head.py:333-418): points are flipped ON DEVICE inside the
        jitted program (our voxelization is in-model), and the sparse
        unique/index_add merge is a sort-compaction segment mean. Deviations:
        un-flipped grid indices use the involutive n-1-i (the reference's
        `spatial_shape - ind` is off by one).
        """
        pts, pv = batch.points, batch.points_valid
        b = pts.shape[0]
        c_in = pts.shape[-1]
        sx = jnp.ones((c_in,), pts.dtype).at[0].set(-1.0)
        sy = jnp.ones((c_in,), pts.dtype).at[1].set(-1.0)
        pts4 = jnp.concatenate(
            [pts, pts * sy, pts * sx, pts * sx * sy], axis=0
        )  # copy order: orig, yflip, xflip, xyflip (reference keys)
        pv4 = jnp.tile(pv, (4, 1))
        bev, hm, reg = self._features_pts(pts4, pv4, train=False)

        nx8, ny8 = bev.grid.nx, bev.grid.ny
        v = bev.valid.shape[-1]
        g, d = reg.shape[-2], reg.shape[-1]
        coords = bev.coords.reshape(4, b, v, 3)
        valid = bev.valid.reshape(4, b, v)
        prob = jax.nn.sigmoid(hm).reshape(4, b, v, -1)
        reg = reg.reshape(4, b, v, g, d)
        # activate dims pre-average (reference sigmoids hm / exps dim first)
        reg = reg.at[..., 3:6].set(jnp.exp(reg[..., 3:6]))

        # un-flip: copy 1 y-mirror (dy, sinθ), copy 2 x-mirror (dx, cosθ:
        # θ→π−θ), copy 3 both (θ→θ+π)
        flip_y = jnp.array([1, -1, 1, -1])  # which copies mirrored y
        flip_x = jnp.array([1, 1, -1, -1])  # which copies mirrored x
        cx = coords[..., 0]
        cy = coords[..., 1]
        cx = jnp.where(flip_x[:, None, None] < 0, nx8 - 1 - cx, cx)
        cy = jnp.where(flip_y[:, None, None] < 0, ny8 - 1 - cy, cy)
        coords = jnp.stack([cx, cy, coords[..., 2]], axis=-1)
        reg_scale = jnp.stack(
            [
                flip_x.astype(jnp.float32),          # dx
                flip_y.astype(jnp.float32),          # dy
                jnp.ones(4), jnp.ones(4), jnp.ones(4), jnp.ones(4),  # z, lwh
                flip_x.astype(jnp.float32),          # cos θ
                flip_y.astype(jnp.float32),          # sin θ
            ],
            axis=-1,
        )  # (4, 8)
        if self.use_vel:  # vel mirrors like the center offsets
            reg_scale = jnp.concatenate(
                [reg_scale,
                 jnp.stack([flip_x.astype(jnp.float32),
                            flip_y.astype(jnp.float32)], axis=-1)], axis=-1,
            )
        if d > self._reg_dim:  # iou channel (flip-invariant)
            reg_scale = jnp.concatenate(
                [reg_scale, jnp.ones((4, d - self._reg_dim))], axis=-1,
            )
        reg = reg * reg_scale[:, None, None, None, :]

        # merge: per sample, segment-mean over unique un-flipped (x, y) cells
        merged_cap = 2 * self.bev_cap
        from ..core.voxel.sparse_ops import linearize

        bev_grid = bev.grid
        feats = jnp.concatenate(
            [prob, reg.reshape(4, b, v, g * d)], axis=-1
        )  # (4, B, V, C + G·D)
        coords_m = coords.transpose(1, 0, 2, 3).reshape(b, 4 * v, 3)
        valid_m = valid.transpose(1, 0, 2).reshape(b, 4 * v)
        feats_m = feats.transpose(1, 0, 2, 3).reshape(b, 4 * v, -1)

        def merge_one(c, vd, f):
            key = linearize(bev_grid, c, vd)
            sentinel = bev_grid.num_cells
            order = jnp.argsort(key)
            skey = jnp.take(key, order)
            is_start = jnp.concatenate(
                [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
            ) & (skey < sentinel)
            seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
            seg = jnp.where((skey < sentinel) & (seg < merged_cap), seg,
                            merged_cap)
            f_s = jnp.take(f, order, axis=0)
            c_s = jnp.take(c, order, axis=0)
            sums = jax.ops.segment_sum(
                f_s.astype(jnp.float32), seg, num_segments=merged_cap,
                indices_are_sorted=True,
            )
            counts = jax.ops.segment_sum(
                (seg < merged_cap).astype(jnp.float32), seg,
                num_segments=merged_cap, indices_are_sorted=True,
            )
            avg = sums / jnp.maximum(counts, 1.0)[:, None]
            out_coords = (
                jnp.zeros((merged_cap + 1, 3), jnp.int32)
                .at[jnp.where(is_start, seg, merged_cap)]
                .set(c_s, mode="drop")
            )[:merged_cap]
            out_valid = jnp.arange(merged_cap) < jnp.minimum(
                jnp.sum(is_start.astype(jnp.int32)), merged_cap
            )
            return out_coords, out_valid, avg

        mc, mv, mf = jax.vmap(merge_one)(coords_m, valid_m, feats_m)
        num_cls = len(self.class_names)
        merged = SparseTensor(mf, mc, mv, bev_grid)
        reg_m = mf[..., num_cls:].reshape(b, mf.shape[1], g, d)
        return merged, mf[..., :num_cls], reg_m

    def predict(self, batch):
        cfg = self.cfg
        pp = cfg.DENSE_HEAD.POST_PROCESSING
        tta = bool(cfg.DENSE_HEAD.get("DOUBLE_FLIP", False))
        if tta:
            bev, scores_all, reg = self._tta_double_flip(batch)
        else:
            bev, hm, reg = self._features(batch, train=False)
            scores_all = jax.nn.sigmoid(hm)  # (B, V, C)
            reg = reg.at[..., 3:6].set(jnp.exp(reg[..., 3:6]))
        scores_all = jnp.where(bev.valid[..., None], scores_all, 0.0)
        vx, vy = self._voxel_xy(bev)

        k = min(int(pp.MAX_OBJ_PER_SAMPLE), scores_all.shape[1])
        b, v, c = scores_all.shape
        flat = scores_all.transpose(0, 2, 1).reshape(b, c * v)
        scores, idx = jax.lax.top_k(flat, k)
        cls = (idx // v).astype(jnp.int32) + 1
        vox = idx % v

        def gather(arr):
            return jnp.take_along_axis(arr, vox, axis=1)

        # each selection decodes from its class's own group branch
        grp = jnp.asarray(self._class_to_group, jnp.int32)[cls - 1]
        r = self._gather_group_reg(reg, vox, grp)
        x = gather(vx) + r[..., 0]
        y = gather(vy) + r[..., 1]
        boxes = jnp.stack(
            [
                x, y, r[..., 2],
                r[..., 3], r[..., 4], r[..., 5],  # dims already exp'd
                jnp.arctan2(r[..., 7], r[..., 6]),
            ],
            axis=-1,
        )
        if self.use_vel:  # (B, K, 9) velocity decode
            boxes = jnp.concatenate([boxes, r[..., 8:10]], axis=-1)
        if self.use_iou_branch and pp.get("USE_IOU_TO_RECTIFY_SCORE", True):
            # per-class score rectification score^(1-w) · iou^w
            # (voxelnext_ioubranch configs; second_net_iou.py semantics)
            iou = jnp.clip(jnp.tanh(r[..., self._reg_dim]), 0.0, 1.0)
            w = jnp.asarray(self.iou_rectifier, jnp.float32)[cls - 1]
            scores = jnp.power(jnp.maximum(scores, 1e-8), 1.0 - w) * jnp.power(
                jnp.maximum(iou, 1e-4), w
            )
        valid = scores > float(pp.get("SCORE_THRESH", 0.1))

        nms_cfg = pp.NMS_CONFIG
        def one(bx, sc, lb, vd):
            sel, keep = nms_bev(
                bx[:, :7], sc, float(nms_cfg.NMS_THRESH),
                pre_max=min(int(nms_cfg.NMS_PRE_MAXSIZE), k),
                post_max=int(nms_cfg.NMS_POST_MAXSIZE), valid=vd,
            )
            return (
                bx[sel], jnp.where(keep, sc[sel], 0.0),
                jnp.where(keep, lb[sel], 0), keep,
            )

        return jax.vmap(one)(boxes, scores, cls, valid)
