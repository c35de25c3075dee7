"""CenterHead: multi-group center-based dense head.

Parity with the reference's CenterHead (pcdet/models/dense_heads/center_head.py):
class-grouped SeparateHeads (:64-102), gaussian heatmap targets (:106-227),
CornerNet focal + masked L1 losses (:233-295), top-K decode (:297-364 +
centernet_utils.decode_bbox_from_heatmap:173-240).

TPU-first redesign: target assignment is a fully vectorized gaussian splat over
the dense feature map (one masked max-reduce per class) instead of the
reference's per-box CPU loop (`.cpu()` at :210 — a known OpenPCDet bottleneck);
decode returns fixed-size masked tensors instead of ragged per-frame lists.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry.nms import nms_bev
from . import losses


def gaussian_radius(height, width, min_overlap=0.1):
    """CenterNet gaussian radius (centernet_utils.gaussian_radius:9-35 semantics)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class HeadTargets(NamedTuple):
    heatmap: jnp.ndarray       # (B, H, W, C_head)
    target_boxes: jnp.ndarray  # (B, M, 8)
    inds: jnp.ndarray          # (B, M)
    mask: jnp.ndarray          # (B, M) bool


class SeparateHead(nn.Module):
    """Per-group regression tower (reference SeparateHead, center_head.py:12-47)."""

    head_dict: Dict[str, Tuple[int, int]]  # name → (out_channels, num_conv)
    init_bias: float = -2.19
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        out = {}
        for name, (out_ch, num_conv) in self.head_dict.items():
            h = x
            for k in range(num_conv - 1):
                h = nn.Conv(
                    h.shape[-1], (3, 3), padding=1, use_bias=self.use_bias,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"{name}_conv{k}",
                )(h)
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32, param_dtype=jnp.float32,
                    name=f"{name}_bn{k}",
                )(h)
                h = nn.relu(h).astype(self.dtype)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "hm"
                else nn.initializers.zeros
            )
            h = nn.Conv(
                out_ch, (3, 3), padding=1, use_bias=True,
                bias_init=bias_init, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"{name}_out",
            )(h)
            out[name] = h.astype(jnp.float32)
        return out


class FusedSeparateHeads(nn.Module):
    """All heads × all branches as G-fused convolutions.

    The reference runs num_heads × num_branches separate small towers
    (center_head.py SeparateHead) — 60 tiny 3×3 convs on the flagship, each
    hitting the v5e MXU at poor utilisation and costing a dispatch in the
    backward. Every tower reads the SAME shared feature map, so:
      * all first convs fuse into ONE dense conv to G·Cmid channels,
      * per-branch BatchNorm is per-channel — one BN over the concatenation
        is numerically identical,
      * mid/out convs become feature_group_count=G grouped convs (branch
        outputs padded to a common width and sliced apart afterwards).
    Weight layouts are convertible 1:1 from the reference's per-tower
    checkpoints (train/torch_convert.fused_head transforms).

    branch_specs: ((head_idx, name, out_channels), ...) in param order.
    """

    branch_specs: Tuple[Tuple[int, str, int], ...]
    num_heads: int
    num_conv: int
    mid_channels: int
    init_bias: float = -2.19
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        g = len(self.branch_specs)
        cm = self.mid_channels
        out_max = max(oc for _, _, oc in self.branch_specs)
        h = x
        for t in range(self.num_conv - 1):
            h = nn.Conv(
                g * cm, (3, 3), padding=1, use_bias=self.use_bias,
                feature_group_count=1 if t == 0 else g,
                dtype=self.dtype, param_dtype=jnp.float32, name=f"conv{t}",
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, param_dtype=jnp.float32, name=f"bn{t}",
            )(h)
            h = nn.relu(h).astype(self.dtype)

        bias_pattern = np.zeros(g * out_max, np.float32)
        for i, (_, name, oc) in enumerate(self.branch_specs):
            if name == "hm":
                bias_pattern[i * out_max:i * out_max + oc] = self.init_bias
        out = nn.Conv(
            g * out_max, (3, 3), padding=1, use_bias=True,
            feature_group_count=1 if self.num_conv == 1 else g,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                bias_pattern, dtype),
            dtype=self.dtype, param_dtype=jnp.float32, name="out",
        )(h)

        preds = [dict() for _ in range(self.num_heads)]
        for i, (hidx, name, oc) in enumerate(self.branch_specs):
            preds[hidx][name] = out[
                ..., i * out_max:i * out_max + oc
            ].astype(jnp.float32)
        return preds


class CenterHead(nn.Module):
    """config: CLASS_NAMES_EACH_HEAD, SHARED_CONV_CHANNEL, NUM_HM_CONV,
    SEPARATE_HEAD_CFG, TARGET_ASSIGNER_CONFIG, LOSS_CONFIG, POST_PROCESSING."""

    class_names: Sequence[str]
    class_names_each_head: Sequence[Sequence[str]]
    shared_conv_channel: int
    num_hm_conv: int
    head_order: Sequence[str]
    head_dict: Dict[str, Dict[str, int]]
    point_cloud_range: Sequence[float]
    voxel_size: Sequence[float]
    feature_map_stride: int
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    use_bias_before_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # global class id (1-based) → (head index, local id within head, 0-based global)
        self.num_heads = len(self.class_names_each_head)
        head_of = np.zeros(len(self.class_names) + 1, dtype=np.int32)
        local_of = np.zeros(len(self.class_names) + 1, dtype=np.int32)
        mappings = []
        for h, names in enumerate(self.class_names_each_head):
            ids = []
            for j, n in enumerate(names):
                gid = self.class_names.index(n) + 1
                head_of[gid] = h
                local_of[gid] = j
                ids.append(gid)
            mappings.append(tuple(ids))
        # store as tuples (flax freezes mutable containers assigned in setup)
        self.class_id_mapping_each_head = tuple(mappings)
        self._head_of = tuple(head_of.tolist())
        self._local_of = tuple(local_of.tolist())

        self.shared_conv = nn.Sequential([
            nn.Conv(self.shared_conv_channel, (3, 3), padding=1,
                    use_bias=self.use_bias_before_norm, dtype=self.dtype,
                    param_dtype=jnp.float32),
        ])
        self.shared_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                                      param_dtype=jnp.float32)
        # fused path: every (head, branch) tower shares depth and mid width →
        # 2 fused convs instead of num_heads × num_branches × num_conv small
        # ones (see FusedSeparateHeads); fall back to per-tower SeparateHead
        # when depths differ (non-uniform num_conv configs)
        convs = {self.num_hm_conv}
        convs.update(v["num_conv"] for v in self.head_dict.values())
        self._fused = len(convs) == 1
        if self._fused:
            specs = []
            for h, names in enumerate(self.class_names_each_head):
                hd = {k: v["out_channels"] for k, v in self.head_dict.items()}
                hd["hm"] = len(names)
                specs.extend((h, name, oc) for name, oc in hd.items())
            self.fused_heads = FusedSeparateHeads(
                branch_specs=tuple(specs), num_heads=self.num_heads,
                num_conv=next(iter(convs)),
                mid_channels=self.shared_conv_channel,
                use_bias=self.use_bias_before_norm, dtype=self.dtype,
            )
        else:
            heads = []
            for h, names in enumerate(self.class_names_each_head):
                hd = {k: (v["out_channels"], v["num_conv"]) for k, v in self.head_dict.items()}
                hd["hm"] = (len(names), self.num_hm_conv)
                heads.append(SeparateHead(head_dict=hd, use_bias=self.use_bias_before_norm,
                                          dtype=self.dtype, name=f"head_{h}"))
            self.heads_list = heads

    def __call__(self, spatial_features_2d, train: bool):
        x = self.shared_conv(spatial_features_2d)
        x = self.shared_bn(x, use_running_average=not train)
        x = nn.relu(x).astype(self.dtype)
        if self._fused:
            return self.fused_heads(x, train)
        return [head(x, train) for head in self.heads_list]

    # ------------------------------------------------------------------
    # Target assignment (vectorized; reference assign_target_of_single_head)
    # ------------------------------------------------------------------

    def assign_targets(self, gt_boxes, gt_valid, feature_map_size) -> List[HeadTargets]:
        """
        Args:
            gt_boxes: (B, M, 8) lidar boxes + 1-based class id.
            gt_valid: (B, M) bool.
            feature_map_size: (H, W) static.
        """
        H, W = feature_map_size
        b, m, _ = gt_boxes.shape
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        stride = float(self.feature_map_stride)

        cls_id = gt_boxes[..., -1].astype(jnp.int32)
        cls_id = jnp.clip(cls_id, 0, len(self.class_names))
        head_of = jnp.asarray(self._head_of, dtype=jnp.int32)[cls_id]    # (B, M)
        local_of = jnp.asarray(self._local_of, dtype=jnp.int32)[cls_id]

        coord_x = (gt_boxes[..., 0] - pcr[0]) / vs[0] / stride
        coord_y = (gt_boxes[..., 1] - pcr[1]) / vs[1] / stride
        coord_x = jnp.clip(coord_x, 0.0, W - 0.5)
        coord_y = jnp.clip(coord_y, 0.0, H - 0.5)
        cx_int = coord_x.astype(jnp.int32)
        cy_int = coord_y.astype(jnp.int32)

        dx = gt_boxes[..., 3] / vs[0] / stride
        dy = gt_boxes[..., 4] / vs[1] / stride
        radius = gaussian_radius(dx, dy, self.gaussian_overlap)
        radius = jnp.maximum(radius.astype(jnp.int32), self.min_radius)

        live = gt_valid & (dx > 0) & (dy > 0) & (cls_id > 0)

        # dense gaussian per box around the integer center (reference
        # draw_gaussian_to_heatmap: sigma = (2r+1)/6, window clipped at r)
        ys = jnp.arange(H, dtype=jnp.int32)
        xs = jnp.arange(W, dtype=jnp.int32)
        off_y = ys[None, None, :] - cy_int[..., None]          # (B, M, H)
        off_x = xs[None, None, :] - cx_int[..., None]          # (B, M, W)
        sigma = (2.0 * radius.astype(jnp.float32) + 1.0) / 6.0
        inv_2s2 = 1.0 / (2.0 * sigma * sigma)                  # (B, M)
        g_y = jnp.exp(-(off_y.astype(jnp.float32) ** 2) * inv_2s2[..., None])
        g_x = jnp.exp(-(off_x.astype(jnp.float32) ** 2) * inv_2s2[..., None])
        win_y = jnp.abs(off_y) <= radius[..., None]
        win_x = jnp.abs(off_x) <= radius[..., None]
        g_y = jnp.where(win_y & live[..., None], g_y, 0.0)
        g_x = jnp.where(win_x, g_x, 0.0)

        # regression targets (shared layout across heads; head selection by mask)
        target_boxes = jnp.stack(
            [
                coord_x - cx_int.astype(jnp.float32),
                coord_y - cy_int.astype(jnp.float32),
                gt_boxes[..., 2],
                jnp.log(jnp.maximum(gt_boxes[..., 3], 1e-6)),
                jnp.log(jnp.maximum(gt_boxes[..., 4], 1e-6)),
                jnp.log(jnp.maximum(gt_boxes[..., 5], 1e-6)),
                jnp.cos(gt_boxes[..., 6]),
                jnp.sin(gt_boxes[..., 6]),
            ],
            axis=-1,
        )
        if gt_boxes.shape[-1] > 8:
            # velocity-width gt: raw (vx, vy) targets for the 'vel' branch
            # (reference assign_target_of_single_head: ret_boxes[k, 8:] =
            # gt_boxes[k, 7:-1])
            target_boxes = jnp.concatenate(
                [target_boxes, gt_boxes[..., 7:-1]], axis=-1
            )
        inds = cy_int * W + cx_int

        results = []
        for h, names in enumerate(self.class_names_each_head):
            in_head = live & (head_of == h)
            maps = []
            for c in range(len(names)):
                sel = in_head & (local_of == c)
                gy = jnp.where(sel[..., None], g_y, 0.0)       # (B, M, H)
                # outer product per box then max over boxes:
                # (B, M, H, 1) * (B, M, 1, W) → max over M → (B, H, W)
                per_box = gy[..., :, None] * g_x[..., None, :]
                maps.append(jnp.max(per_box, axis=1))
            heatmap = jnp.stack(maps, axis=-1)                  # (B, H, W, C)
            results.append(
                HeadTargets(
                    heatmap=heatmap,
                    target_boxes=jnp.where(in_head[..., None], target_boxes, 0.0),
                    inds=jnp.where(in_head, inds, 0),
                    mask=in_head,
                )
            )
        return results

    # ------------------------------------------------------------------
    # Loss
    # ------------------------------------------------------------------

    def get_loss(self, pred_dicts, target_list, loss_weights):
        """Sum of per-head focal + weighted L1 (reference get_loss:237-295)."""
        total = 0.0
        tb = {}
        code_weights = jnp.asarray(loss_weights["code_weights"], jnp.float32)
        for idx, (pred, tgt) in enumerate(zip(pred_dicts, target_list)):
            hm = losses.sigmoid_clamped(pred["hm"])
            hm_loss = losses.focal_loss_centernet(hm, tgt.heatmap)
            hm_loss = hm_loss * loss_weights["cls_weight"]

            reg_maps = jnp.concatenate(
                [pred[name] for name in self.head_order], axis=-1
            )  # (B, H, W, 8|10)
            bsz, H, W, D = reg_maps.shape
            assert tgt.target_boxes.shape[-1] == D, (
                f"reg target width {tgt.target_boxes.shape[-1]} != predicted "
                f"{D} — a 'vel' head needs velocity-width (10-col) gt batches"
            )
            reg_flat = reg_maps.reshape(bsz, H * W, D)
            reg_loss = losses.reg_loss_centernet(
                reg_flat, tgt.target_boxes, tgt.inds, tgt.mask
            )
            loc_loss = jnp.sum(reg_loss * code_weights[:D]) * loss_weights["loc_weight"]

            total = total + hm_loss + loc_loss
            tb[f"hm_loss_head_{idx}"] = hm_loss
            tb[f"loc_loss_head_{idx}"] = loc_loss
        tb["rpn_loss"] = total
        return total, tb

    # ------------------------------------------------------------------
    # Decode (eval) — fixed-size masked outputs
    # ------------------------------------------------------------------

    def decode_topk(self, pred_dicts, post_cfg):
        """Pre-NMS decode: per-head top-K peaks → lidar boxes.

        Mirrors the reference's centernet_utils.decode_bbox_from_heatmap
        (centernet_utils.py:173-235: flat top-K over classes×cells, offset
        add, exp dims, atan2 heading, post-center-range + score gates).
        Returns a list over heads of (boxes (B, K, 7|9), scores (B, K),
        cls (B, K) local ids, valid (B, K)).
        """
        k = int(post_cfg.MAX_OBJ_PER_SAMPLE)
        score_thresh = float(post_cfg.get("SCORE_THRESH", 0.0))
        post_range = jnp.asarray(post_cfg.POST_CENTER_LIMIT_RANGE, jnp.float32)
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        stride = float(self.feature_map_stride)

        out = []
        for pred in pred_dicts:
            hm = jax.nn.sigmoid(pred["hm"].astype(jnp.float32))  # (B, H, W, C)
            bsz, H, W, C = hm.shape
            # (B, H, W, C) → (B, C, H*W) → flat top-K over classes*cells
            hm_flat = hm.transpose(0, 3, 1, 2).reshape(bsz, C * H * W)
            k_eff = min(k, C * H * W)
            scores, inds = jax.lax.top_k(hm_flat, k_eff)
            cls = inds // (H * W)
            spatial = inds % (H * W)
            ys = (spatial // W).astype(jnp.float32)
            xs = (spatial % W).astype(jnp.float32)

            def gather(name):
                maps = pred[name].astype(jnp.float32).reshape(bsz, H * W, -1)
                return jnp.take_along_axis(maps, spatial[..., None], axis=1)

            center = gather("center")
            center_z = gather("center_z")[..., 0]
            dim = jnp.exp(gather("dim"))
            rot = gather("rot")
            angle = jnp.arctan2(rot[..., 1], rot[..., 0])

            xs = (xs + center[..., 0]) * stride * vs[0] + pcr[0]
            ys = (ys + center[..., 1]) * stride * vs[1] + pcr[1]
            boxes = jnp.stack(
                [xs, ys, center_z, dim[..., 0], dim[..., 1], dim[..., 2], angle],
                axis=-1,
            )  # (B, K, 7)
            if "vel" in pred:  # nuScenes velocity branch → (B, K, 9)
                boxes = jnp.concatenate([boxes, gather("vel")], axis=-1)

            valid = (
                jnp.all(boxes[..., :3] >= post_range[:3], axis=-1)
                & jnp.all(boxes[..., :3] <= post_range[3:], axis=-1)
                & (scores > score_thresh)
            )
            out.append((boxes, scores, cls, valid))
        return out

    def generate_predicted_boxes(self, pred_dicts, post_cfg):
        """Per-head top-K decode + class-agnostic NMS, concat across heads.

        Returns (boxes (B, S, 7), scores (B, S), labels (B, S) 1-based,
        valid (B, S)) with S = num_heads * NMS_POST_MAXSIZE.
        """
        k = int(post_cfg.MAX_OBJ_PER_SAMPLE)
        nms_cfg = post_cfg.NMS_CONFIG
        pre_max = min(int(nms_cfg.NMS_PRE_MAXSIZE), k)
        post_max = int(nms_cfg.NMS_POST_MAXSIZE)

        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for idx, (boxes, scores, cls, valid) in enumerate(
                self.decode_topk(pred_dicts, post_cfg)):
            k_eff = scores.shape[1]
            nms_thresh = float(nms_cfg.NMS_THRESH)
            pre_eff = min(pre_max, k_eff)
            nms_type = nms_cfg.get("NMS_TYPE", "nms_gpu")

            if nms_type == "circle_nms":
                # distance-based suppression (CenterPoint's circle_nms,
                # reference centernet_utils.py:100-130); NMS_THRESH is the
                # min center distance here
                from ..core.geometry.nms import circle_nms

                def run_nms(bx, sc, vd):
                    return circle_nms(bx, sc, nms_thresh, post_max=post_max,
                                      valid=vd)
            else:
                def run_nms(bx, sc, vd):
                    sel, keep = nms_bev(bx, sc, nms_thresh, pre_max=pre_eff,
                                        post_max=post_max, valid=vd)
                    return sel, keep

            sel, keep = jax.vmap(run_nms)(boxes[..., :7], scores, valid)
            sel_boxes = jnp.take_along_axis(boxes, sel[..., None], axis=1)
            sel_scores = jnp.take_along_axis(scores, sel, axis=1)
            sel_cls = jnp.take_along_axis(cls, sel, axis=1)
            mapping = jnp.asarray(self.class_id_mapping_each_head[idx], dtype=jnp.int32)
            sel_labels = mapping[jnp.clip(sel_cls, 0, len(mapping) - 1)]  # 1-based

            all_boxes.append(sel_boxes)
            all_scores.append(jnp.where(keep, sel_scores, 0.0))
            all_labels.append(jnp.where(keep, sel_labels, 0))
            all_valid.append(keep)

        return (
            jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1),
            jnp.concatenate(all_labels, axis=1),
            jnp.concatenate(all_valid, axis=1),
        )


def gaussian_heatmap_targets(gt_boxes, gt_valid, num_class, feature_map_size,
                             point_cloud_range, voxel_size,
                             feature_map_stride, gaussian_overlap=0.1,
                             min_radius=2):
    """Standalone dense gaussian heatmap targets (B, H, W, num_class) — the
    class-flat variant of CenterHead.assign_targets' splat, used by
    TransFusionHead's dense heatmap loss."""
    H, W = feature_map_size
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    stride = float(feature_map_stride)

    cls_id = jnp.clip(gt_boxes[..., -1].astype(jnp.int32), 0, num_class)
    coord_x = jnp.clip((gt_boxes[..., 0] - pcr[0]) / vs[0] / stride, 0.0, W - 0.5)
    coord_y = jnp.clip((gt_boxes[..., 1] - pcr[1]) / vs[1] / stride, 0.0, H - 0.5)
    cx = coord_x.astype(jnp.int32)
    cy = coord_y.astype(jnp.int32)
    dx = gt_boxes[..., 3] / vs[0] / stride
    dy = gt_boxes[..., 4] / vs[1] / stride
    radius = jnp.maximum(
        gaussian_radius(dx, dy, gaussian_overlap).astype(jnp.int32), min_radius
    )
    live = gt_valid & (dx > 0) & (dy > 0) & (cls_id > 0)

    off_y = jnp.arange(H, dtype=jnp.int32)[None, None, :] - cy[..., None]
    off_x = jnp.arange(W, dtype=jnp.int32)[None, None, :] - cx[..., None]
    sigma = (2.0 * radius.astype(jnp.float32) + 1.0) / 6.0
    inv = 1.0 / (2.0 * sigma * sigma)
    g_y = jnp.exp(-(off_y.astype(jnp.float32) ** 2) * inv[..., None])
    g_x = jnp.exp(-(off_x.astype(jnp.float32) ** 2) * inv[..., None])
    g_y = jnp.where((jnp.abs(off_y) <= radius[..., None]) & live[..., None], g_y, 0.0)
    g_x = jnp.where(jnp.abs(off_x) <= radius[..., None], g_x, 0.0)

    maps = []
    for c in range(num_class):
        sel = live & (cls_id == c + 1)
        gy = jnp.where(sel[..., None], g_y, 0.0)
        maps.append(jnp.max(gy[..., :, None] * g_x[..., None, :], axis=1))
    return jnp.stack(maps, axis=-1)
