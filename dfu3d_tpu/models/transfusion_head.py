"""TransFusionHead — query-based BEV detection head (reference:
pcdet/models/dense_heads/transfusion_head.py, 479 LoC + HungarianAssigner3D,
model_utils/transfusion_utils.py).

Structure matches the reference exactly (pinned by
tests/test_reference_parity.py TestTransFusionHeadParity at logits AND
decoded-box level through the checkpoint converter):

* shared_conv: plain 3×3 conv (transfusion_head.py:98)
* heatmap_head: BasicBlock2D (conv+BN+ReLU) + 3×3 conv (:99-102)
* query init (:160-204): sigmoid heatmap, interior-only local-max NMS
  (borders zeroed; per-dataset small classes use kernel 1), top-Q over the
  (class, cell) flatten, class one-hot through a 1×1 conv encoding
* one TransformerDecoderLayer (transfusion_utils.py:29-104): post-norm,
  learned position embeddings (conv-BN-ReLU-conv on raw cell coords + 0.5)
  added to q/k/v — including the cross-attention VALUE
* SeparateHead_Transfusion prediction stacks (:15-49): per-branch
  [1×1 conv → BN → ReLU] × (num_conv−1) + 1×1 conv, head_channels=64;
  center output is made absolute by adding query_pos (:210)
* decode (:397-479): score = sigmoid(per-query heatmap) ×
  query_heatmap_score × one_hot(query class)

One deliberate deviation: the reference's `create_2D_grid` flattens bev_pos
x-major while the feature map flattens y-major — on its square BEV configs
the subsequent `.flip(-1)` makes the gathered positions come out as
(x+0.5, y+0.5); we produce that aligned layout directly (correct for any
aspect ratio, identical on square grids).

TPU redesign is confined to TRAINING: the reference's per-frame Hungarian
assignment over dynamic shapes (get_targets_single) becomes a fixed-shape
cost matrix matched either by a host `pure_callback` Hungarian or a
pure-device greedy matcher (98.5% agreement, tests/test_camera_branch.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def hungarian_match(cost, gt_valid):
    """Host-side Hungarian assignment. cost (Q, M) fp32; returns (Q,) int32
    gt index per query (-1 = unmatched)."""

    def _solve(cost_np, valid_np):
        from scipy.optimize import linear_sum_assignment

        cost_np = np.asarray(cost_np, np.float64)
        valid_np = np.asarray(valid_np, bool)
        q, m = cost_np.shape
        out = np.full(q, -1, np.int32)
        cols = np.nonzero(valid_np)[0]
        if len(cols) == 0:
            return out
        sub = cost_np[:, cols]
        rr, cc = linear_sum_assignment(sub)
        out[rr] = cols[cc].astype(np.int32)
        return out

    return jax.pure_callback(
        _solve, jax.ShapeDtypeStruct((cost.shape[0],), jnp.int32),
        cost, gt_valid, vmap_method="sequential",
    )


def greedy_match(cost, gt_valid):
    """Pure-device greedy bipartite matching: repeatedly take the globally
    cheapest (query, gt) pair. Used where the backend cannot run host
    callbacks (the axon-tunneled chip rejects pure_callback); on detection
    costs greedy and Hungarian agree on the vast majority of pairs.
    cost (Q, M) → (Q,) gt index or -1."""
    q, m = cost.shape
    big = 1e9
    cost = jnp.where(gt_valid[None, :], cost, big)

    def body(_, state):
        c, assign = state
        flat = jnp.argmin(c)
        qi, mi = flat // m, flat % m
        take = c[qi, mi] < big / 2
        assign = jnp.where(
            take, assign.at[qi].set(mi.astype(jnp.int32)), assign
        )
        c = jnp.where(take, c.at[qi, :].set(big).at[:, mi].set(big), c)
        return c, assign

    n_iter = min(q, m)
    _, assign = jax.lax.fori_loop(
        0, n_iter, body, (cost, jnp.full((q,), -1, jnp.int32))
    )
    return assign


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute position embedding (transfusion_utils.py:10-26):
    Conv1d(2→C) → BatchNorm1d → ReLU → Conv1d(C→C), on raw coordinates."""

    channels: int
    bn_momentum: float = 0.9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xy, train: bool):
        # xy: (..., N, 2) raw cell coords (+0.5)
        x = nn.Dense(self.channels, dtype=self.dtype,
                     param_dtype=jnp.float32, name="dense_0")(
            xy.astype(self.dtype)
        )
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=1e-5,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="bn")(x.astype(jnp.float32))
        x = nn.relu(x).astype(self.dtype)
        return nn.Dense(self.channels, dtype=self.dtype,
                        param_dtype=jnp.float32, name="dense_1")(x)


class TransFusionHead(nn.Module):
    num_class: int
    num_proposals: int = 200
    hidden: int = 128
    num_heads: int = 8
    ffn_channel: int = 256
    head_channels: int = 64
    num_conv: int = 2           # SEPARATE_HEAD_CFG HEAD_DICT num_conv
    num_hm_conv: int = 2        # NUM_HM_CONV (per-query heatmap branch)
    use_vel: bool = False       # 'vel' in HEAD_ORDER (nuScenes, code_size 10)
    nms_kernel_size: int = 3
    dataset_name: str = "nuScenes"
    use_bias_before_norm: bool = False
    bn_momentum: float = 0.9    # torch BN_MOMENTUM 0.1 ⇒ ema keep 0.9
    point_cloud_range: Sequence[float] = ()
    voxel_size: Sequence[float] = ()
    feature_map_stride: int = 8
    # "hungarian" (host callback; reference HungarianAssigner3D), "greedy"
    # (pure device), or "auto" (hungarian unless the backend rejects host
    # callbacks, like the axon-tunneled chip). Greedy agrees with Hungarian
    # on 98.5% of assignments; the residual 1.5% are near-tied cost rows, so
    # the training loss differs only in which of two similar queries carries
    # a target — accepted.
    matcher: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def _match_fn(self):
        mode = self.matcher
        if mode == "auto":
            try:
                ver = jax.devices()[0].client.platform_version
            except Exception:
                ver = ""
            mode = "greedy" if "axon" in str(ver).lower() else "hungarian"
        return hungarian_match if mode == "hungarian" else greedy_match

    def _bn(self, name):
        return lambda x, train: nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
            name=name,
        )(x.astype(jnp.float32))

    def _local_max(self, hm):
        """Interior local-max (reference predict:163-177): valid-region
        max-pool pasted into zeros (borders suppressed), then small classes
        overridden with kernel 1 (identity)."""
        k = self.nms_kernel_size
        pad = k // 2
        inner = nn.max_pool(hm, (k, k), strides=(1, 1), padding="VALID")
        local_max = jnp.zeros_like(hm)
        local_max = local_max.at[:, pad:-pad, pad:-pad, :].set(inner)
        small = ()
        if self.dataset_name == "nuScenes" and self.num_class > 9:
            small = (8, 9)   # Pedestrian & Traffic_cone
        elif self.dataset_name == "Waymo" and self.num_class > 2:
            small = (1, 2)   # Pedestrian & Cyclist
        for c in small:
            local_max = local_max.at[..., c].set(hm[..., c])
        return local_max

    @nn.compact
    def __call__(self, bev, train: bool = False):
        """bev (B, H, W, C) → dict of per-query predictions (reference
        TransFusionHead.predict:151-218). H is the y axis (cell = y·W + x)."""
        b, h, w, _ = bev.shape
        q = self.num_proposals
        x = nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="shared_conv")(
            bev.astype(self.dtype)
        )
        # heatmap_head = BasicBlock2D + conv (reference :99-102)
        hmx = nn.Conv(self.hidden, (3, 3), padding=1,
                      use_bias=self.use_bias_before_norm, dtype=self.dtype,
                      param_dtype=jnp.float32, name="hm_conv")(x)
        hmx = nn.relu(self._bn("hm_bn")(hmx, train)).astype(self.dtype)
        dense_heatmap = nn.Conv(self.num_class, (3, 3), padding=1,
                                param_dtype=jnp.float32, dtype=jnp.float32,
                                name="hm_out")(hmx)

        # query initialization: class-NMS'd heatmap, top-Q over (class, cell)
        hm = jax.nn.sigmoid(jax.lax.stop_gradient(dense_heatmap))
        hm = hm * (hm == self._local_max(hm))
        # reference flatten: (B, C, H·W).view(B, -1) ⇒ index = class·HW + cell
        flat = hm.transpose(0, 3, 1, 2).reshape(b, self.num_class * h * w)
        _, top = jax.lax.top_k(flat, q)                       # (B, Q)
        q_cls = (top // (h * w)).astype(jnp.int32)
        q_cell = top % (h * w)

        feat_flat = x.reshape(b, h * w, self.hidden)
        q_feat = jnp.take_along_axis(feat_flat, q_cell[..., None], axis=1)
        # class_encoding: 1×1 Conv1d on the one-hot ≡ Dense (reference :103)
        one_hot = jax.nn.one_hot(q_cls, self.num_class, dtype=jnp.float32)
        q_feat = q_feat + nn.Dense(
            self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
            name="class_encoding",
        )(one_hot.astype(self.dtype))

        # positions in feature-pixel units, cell centers (+0.5); see module
        # docstring for the reference's x-major/flip quirk
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        bev_pos = jnp.stack([xs + 0.5, ys + 0.5], axis=-1).reshape(h * w, 2)
        q_pos = jnp.take(bev_pos, q_cell, axis=0)             # (B, Q, 2)

        # --- TransformerDecoderLayer (post-norm, pos added to q/k/v) ---
        qpe = PositionEmbeddingLearned(
            self.hidden, self.bn_momentum, self.dtype, name="self_posembed"
        )(q_pos, train)
        kpe = PositionEmbeddingLearned(
            self.hidden, self.bn_momentum, self.dtype, name="cross_posembed"
        )(jnp.broadcast_to(bev_pos[None], (b, h * w, 2)), train)

        def _ln(name, t):
            return nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name=name)(
                t.astype(jnp.float32)
            ).astype(self.dtype)

        query = q_feat.astype(self.dtype)
        qp = query + qpe
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32, name="self_attn",
        )(qp, qp, qp)
        query = _ln("norm1", query + sa)
        kv = feat_flat.astype(self.dtype) + kpe
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32, name="cross_attn",
        )(query + qpe, kv, kv)
        query = _ln("norm2", query + ca)
        ff = nn.Dense(self.ffn_channel, dtype=self.dtype,
                      param_dtype=jnp.float32, name="linear1")(query)
        ff = nn.Dense(self.hidden, dtype=self.dtype,
                      param_dtype=jnp.float32, name="linear2")(nn.relu(ff))
        query = _ln("norm3", query + ff)

        # --- SeparateHead_Transfusion prediction stacks ---
        def branch(name, ch, num_conv):
            z = query
            for i in range(num_conv - 1):
                z = nn.Dense(self.head_channels,
                             use_bias=self.use_bias_before_norm,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{name}_conv{i}")(z)
                z = nn.relu(self._bn(f"{name}_bn{i}")(z, train)).astype(
                    self.dtype
                )
            return nn.Dense(ch, param_dtype=jnp.float32, dtype=jnp.float32,
                            name=f"{name}_out")(z)

        center = branch("center", 2, self.num_conv) + q_pos   # absolute cells
        height = branch("height", 1, self.num_conv)
        dim = branch("dim", 3, self.num_conv)
        rot = branch("rot", 2, self.num_conv)                 # (sin, cos)
        vel = branch("vel", 2, self.num_conv) if self.use_vel else None
        heatmap = branch("heatmap", self.num_class, self.num_hm_conv)

        # per-query heatmap score at the query's (class row, cell)
        qhs = jnp.take_along_axis(
            hm.reshape(b, h * w, self.num_class), q_cell[..., None], axis=1
        )  # (B, Q, num_class)

        out = {
            "dense_heatmap": dense_heatmap,
            "q_pos": q_pos, "q_cls": q_cls,
            "center": center, "height": height, "dim": dim, "rot": rot,
            "heatmap": heatmap, "query_heatmap_score": qhs,
        }
        if vel is not None:
            out["vel"] = vel
        return out

    def decode(self, preds):
        """Per-query predictions → lidar boxes (B, Q, 7) + scores/labels
        (reference get_bboxes:455-479 + decode_bbox:397-416)."""
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32) * self.feature_map_stride
        xy = preds["center"] * vs[None, None, :2] + pcr[None, None, :2]
        z = preds["height"][..., 0]
        dims = jnp.exp(jnp.clip(preds["dim"], -5.0, 5.0))
        angle = jnp.arctan2(preds["rot"][..., 0], preds["rot"][..., 1])
        parts = [xy, z[..., None], dims, angle[..., None]]
        if "vel" in preds:  # (B, Q, 9) nuScenes velocity decode
            parts.append(preds["vel"])
        boxes = jnp.concatenate(parts, axis=-1)
        one_hot = jax.nn.one_hot(preds["q_cls"], self.num_class)
        scores = (jax.nn.sigmoid(preds["heatmap"])
                  * preds["query_heatmap_score"] * one_hot)
        labels = jnp.argmax(scores, axis=-1).astype(jnp.int32) + 1
        return boxes, jnp.max(scores, axis=-1), labels

    def loss(self, preds, gt_boxes, gt_valid, loss_weights=None):
        """Matched losses (reference get_targets + loss:342-382: dense
        heatmap gaussian-focal, matched-query focal cls, matched L1 reg).
        TPU redesign: fixed-shape cost + Hungarian-callback/greedy matching
        instead of the reference's per-frame dynamic HungarianAssigner3D."""
        lw = loss_weights or {}
        boxes, _, _ = self.decode(preds)
        b, q = boxes.shape[:2]
        m = gt_boxes.shape[1]

        # cost: center L2 + dim L1 + (1 - p_cls(gt class))
        def cost_one(bx, cls_logits, gt, gv):
            d_center = jnp.linalg.norm(
                bx[:, None, :2] - gt[None, :, :2], axis=-1
            )
            d_dim = jnp.sum(
                jnp.abs(jnp.log(jnp.maximum(bx[:, None, 3:6], 1e-3))
                        - jnp.log(jnp.maximum(gt[None, :, 3:6], 1e-3))),
                axis=-1,
            )
            p = jax.nn.sigmoid(cls_logits)  # (Q, num_class)
            gt_cls = jnp.clip(gt[:, -1].astype(jnp.int32) - 1, 0,
                              self.num_class - 1)
            p_gt = jnp.take_along_axis(
                jnp.broadcast_to(p[:, None, :], (q, m, self.num_class)),
                jnp.broadcast_to(gt_cls[None, :, None], (q, m, 1)), axis=2,
            )[..., 0]
            cost = 0.25 * d_center + 0.25 * d_dim + 0.15 * (1.0 - p_gt)
            return jnp.where(gv[None, :], cost, 1e6)

        cost = jax.vmap(cost_one)(
            boxes, preds["heatmap"], gt_boxes, gt_valid
        )
        match = jax.vmap(self._match_fn())(
            jax.lax.stop_gradient(cost), gt_valid
        )  # (B, Q) gt index or -1
        matched = match >= 0
        safe = jnp.maximum(match, 0)
        gt_m = jnp.take_along_axis(gt_boxes, safe[..., None], axis=1)

        # cls: focal over all queries (matched → gt class, unmatched → bg)
        gt_cls = jnp.clip(gt_m[..., -1].astype(jnp.int32) - 1, 0,
                          self.num_class - 1)
        onehot = jax.nn.one_hot(gt_cls, self.num_class) * matched[..., None]
        logits = preds["heatmap"]
        p = jax.nn.sigmoid(logits)
        alpha, gamma = 0.25, 2.0
        pt = onehot * p + (1 - onehot) * (1 - p)
        af = onehot * alpha + (1 - onehot) * (1 - alpha)
        bce = jnp.clip(logits, 0) - logits * onehot + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        cls_loss = jnp.sum(af * ((1 - pt) ** gamma) * bce) / jnp.maximum(
            jnp.sum(matched), 1.0
        )

        # reg: L1 on [absolute xy (cells), z, log dims, sin, cos]
        # (reference encode_bbox:384-395 — center targets are absolute cell
        # coords; the center branch already added query_pos)
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32) * self.feature_map_stride
        t_xy = (gt_m[..., :2] - pcr[None, None, :2]) / vs[None, None, :2]
        t_parts = [t_xy, gt_m[..., 2:3],
                   jnp.log(jnp.maximum(gt_m[..., 3:6], 1e-3)),
                   jnp.sin(gt_m[..., 6:7]), jnp.cos(gt_m[..., 6:7])]
        pred_parts = [preds["center"], preds["height"], preds["dim"],
                      preds["rot"]]
        if "vel" in preds:  # encode_bbox:393-394 — raw (vx, vy) targets
            assert gt_m.shape[-1] >= 10, (
                "a 'vel' TransFusion head needs velocity-width (10-col) gt")
            t_parts.append(gt_m[..., 7:9])
            pred_parts.append(preds["vel"])
        t = jnp.concatenate(t_parts, axis=-1)
        pred_vec = jnp.concatenate(pred_parts, axis=-1)
        cw = lw.get("code_weights")
        cw = (jnp.asarray(cw, jnp.float32)[: t.shape[-1]] if cw is not None
              else jnp.ones(t.shape[-1], jnp.float32))
        reg = jnp.sum(jnp.abs(pred_vec - t) * cw, axis=-1)
        reg_loss = jnp.sum(jnp.where(matched, reg, 0.0)) / jnp.maximum(
            jnp.sum(matched), 1.0
        )

        # dense heatmap focal vs gaussian targets (reuse CenterHead splat)
        from .center_head import gaussian_heatmap_targets

        hm_t = gaussian_heatmap_targets(
            gt_boxes, gt_valid, self.num_class,
            preds["dense_heatmap"].shape[1:3],
            tuple(self.point_cloud_range), tuple(self.voxel_size),
            self.feature_map_stride,
        )
        hmp = jax.nn.sigmoid(preds["dense_heatmap"])
        pos = (hm_t > 0.999).astype(jnp.float32)
        neg_w = (1 - hm_t) ** 4
        eps = 1e-6
        hm_loss = -(
            pos * ((1 - hmp) ** 2) * jnp.log(hmp + eps)
            + (1 - pos) * neg_w * (hmp ** 2) * jnp.log(1 - hmp + eps)
        )
        hm_loss = jnp.sum(hm_loss) / jnp.maximum(jnp.sum(pos), 1.0)

        total = (
            lw.get("cls_weight", 1.0) * cls_loss
            + lw.get("bbox_weight", 0.25) * reg_loss
            + lw.get("hm_weight", 1.0) * hm_loss
        )
        tb = {"tf_cls_loss": cls_loss, "tf_reg_loss": reg_loss,
              "tf_hm_loss": hm_loss}
        return total, tb
