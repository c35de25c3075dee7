"""TransFusionHead — query-based BEV detection head (reference:
pcdet/models/dense_heads/transfusion_head.py, 479 LoC + HungarianAssigner3D).

TPU redesign: class-aware heatmap → top-Q query initialization, one
transformer decoder layer (query self-attention + cross-attention to the
flattened BEV map with learned position encodings), FFN prediction branches
(center offset / height / dim / rot / per-class logits). Training matches
queries to gt with the Hungarian algorithm — run on host via
jax.pure_callback (scipy linear_sum_assignment) with static shapes, the
reference's cls+reg+IoU cost expressed as focal-cls + L1 + center-distance.
Inference is NMS-free top-score selection, like the reference.
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


class TransFusionHead(nn.Module):
    num_class: int
    num_proposals: int = 200
    hidden: int = 128
    num_heads: int = 8
    point_cloud_range: Sequence[float] = ()
    voxel_size: Sequence[float] = ()
    feature_map_stride: int = 8
    # "hungarian" (host callback; reference HungarianAssigner3D), "greedy"
    # (pure device), or "auto" (hungarian unless the backend rejects host
    # callbacks, like the axon-tunneled chip). Greedy agrees with Hungarian
    # on 98.5% of assignments (tests/test_transfusion.py validation); the
    # residual 1.5% are near-tied cost rows, so the training loss differs
    # only in which of two similar queries carries a target — accepted.
    matcher: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def _match_fn(self):
        mode = self.matcher
        if mode == "auto":
            # host callbacks are unsupported on the axon-tunneled chip (it
            # registers as platform "tpu" but its PJRT rejects send/recv);
            # detect via the platform_version string, else assume capable
            try:
                ver = jax.devices()[0].client.platform_version
            except Exception:
                ver = ""
            mode = "greedy" if "axon" in str(ver).lower() else "hungarian"
        return hungarian_match if mode == "hungarian" else greedy_match

    def _pos_xy(self, h, w):
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        return jnp.stack([xs, ys], axis=-1).reshape(h * w, 2)

    @nn.compact
    def __call__(self, bev, train: bool = False):
        """bev (B, H, W, C) → dict of per-query predictions."""
        b, h, w, _ = bev.shape
        q = self.num_proposals
        x = nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="shared_conv")(
            bev.astype(self.dtype)
        )
        heatmap = nn.Conv(self.num_class, (3, 3), padding=1,
                          bias_init=nn.initializers.constant(-4.595),
                          param_dtype=jnp.float32, dtype=jnp.float32,
                          name="heatmap_head")(x.astype(jnp.float32))

        # query init: top-Q over (class, cell) with a local-max NMS on the
        # heatmap (reference query initialization)
        hm = jax.nn.sigmoid(heatmap)
        pooled = nn.max_pool(hm, (3, 3), strides=(1, 1), padding="SAME")
        hm = jnp.where(jnp.abs(hm - pooled) < 1e-6, hm, 0.0)
        flat = hm.reshape(b, h * w * self.num_class)
        _, top = jax.lax.top_k(flat, q)                      # (B, Q)
        q_cls = (top % self.num_class).astype(jnp.int32)
        q_cell = top // self.num_class                       # (B, Q)

        feat_flat = x.reshape(b, h * w, self.hidden)
        q_feat = jnp.take_along_axis(
            feat_flat, q_cell[..., None], axis=1
        )  # (B, Q, C)
        cls_emb = nn.Embed(self.num_class, self.hidden,
                           param_dtype=jnp.float32, name="class_embed")(q_cls)
        pos_xy = self._pos_xy(h, w)
        q_pos = jnp.take(pos_xy, q_cell, axis=0)             # (B, Q, 2)
        pos_emb = nn.Dense(self.hidden, param_dtype=jnp.float32,
                           dtype=self.dtype, name="query_pos")(q_pos / w)
        kv_pos = nn.Dense(self.hidden, param_dtype=jnp.float32,
                          dtype=self.dtype, name="key_pos")(
            pos_xy / w
        )  # (HW, C)

        y = (q_feat + cls_emb + pos_emb).astype(self.dtype)
        # decoder layer
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32, name="self_attn",
        )(y, y)
        y = nn.LayerNorm(param_dtype=jnp.float32, name="ln1")(
            (y + sa).astype(jnp.float32)
        ).astype(self.dtype)
        kv = (feat_flat + kv_pos[None]).astype(self.dtype)
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32, name="cross_attn",
        )(y, kv)
        y = nn.LayerNorm(param_dtype=jnp.float32, name="ln2")(
            (y + ca).astype(jnp.float32)
        ).astype(self.dtype)
        ff = nn.Dense(self.hidden * 2, dtype=self.dtype,
                      param_dtype=jnp.float32, name="ffn1")(y)
        ff = nn.Dense(self.hidden, dtype=self.dtype,
                      param_dtype=jnp.float32, name="ffn2")(nn.relu(ff))
        y = nn.LayerNorm(param_dtype=jnp.float32, name="ln3")(
            (y + ff).astype(jnp.float32)
        ).astype(self.dtype)

        def branch(name, ch):
            z = nn.Dense(self.hidden, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"{name}_fc")(y)
            return nn.Dense(ch, param_dtype=jnp.float32, dtype=jnp.float32,
                            name=f"{name}_out")(nn.relu(z))

        center = branch("center", 2)       # offset from query cell (cells)
        height = branch("height", 1)
        dim = branch("dim", 3)             # log dims
        rot = branch("rot", 2)             # sin/cos
        cls_logits = branch("cls", self.num_class)

        return {
            "dense_heatmap": heatmap,
            "q_pos": q_pos, "q_cls": q_cls,
            "center": center, "height": height, "dim": dim, "rot": rot,
            "cls_logits": cls_logits,
        }

    def decode(self, preds):
        """Per-query predictions → lidar boxes (B, Q, 7) + scores/labels."""
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32) * self.feature_map_stride
        xy = (preds["q_pos"] + preds["center"]) * vs[None, None, :2] + pcr[None, None, :2]
        z = preds["height"][..., 0]
        dims = jnp.exp(jnp.clip(preds["dim"], -5.0, 5.0))
        angle = jnp.arctan2(preds["rot"][..., 1], preds["rot"][..., 0])
        boxes = jnp.concatenate(
            [xy, z[..., None], dims, angle[..., None]], axis=-1
        )
        scores = jax.nn.sigmoid(preds["cls_logits"])
        labels = jnp.argmax(scores, axis=-1).astype(jnp.int32) + 1
        return boxes, jnp.max(scores, axis=-1), labels

    def loss(self, preds, gt_boxes, gt_valid, loss_weights=None):
        """Hungarian-matched losses (reference get_targets + loss:
        heatmap focal, matched-query focal cls, matched L1 reg)."""
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
            gt_cls = jnp.clip(gt[:, 7].astype(jnp.int32) - 1, 0,
                              self.num_class - 1)
            p_gt = jnp.take_along_axis(
                jnp.broadcast_to(p[:, None, :], (q, m, self.num_class)),
                jnp.broadcast_to(gt_cls[None, :, None], (q, m, 1)), axis=2,
            )[..., 0]
            cost = 0.25 * d_center + 0.25 * d_dim + 0.15 * (1.0 - p_gt)
            return jnp.where(gv[None, :], cost, 1e6)

        cost = jax.vmap(cost_one)(
            boxes, preds["cls_logits"], gt_boxes, gt_valid
        )
        match = jax.vmap(self._match_fn())(
            jax.lax.stop_gradient(cost), gt_valid
        )  # (B, Q) gt index or -1
        matched = match >= 0
        safe = jnp.maximum(match, 0)
        gt_m = jnp.take_along_axis(gt_boxes, safe[..., None], axis=1)

        # cls: focal over all queries (matched → gt class, unmatched → bg)
        gt_cls = jnp.clip(gt_m[..., 7].astype(jnp.int32) - 1, 0,
                          self.num_class - 1)
        onehot = jax.nn.one_hot(gt_cls, self.num_class) * matched[..., None]
        logits = preds["cls_logits"]
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

        # reg: L1 on [xy offset(cells), z, log dims, sin, cos]
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32) * self.feature_map_stride
        t_xy = (gt_m[..., :2] - pcr[None, None, :2]) / vs[None, None, :2] - preds["q_pos"]
        t = jnp.concatenate(
            [t_xy, gt_m[..., 2:3],
             jnp.log(jnp.maximum(gt_m[..., 3:6], 1e-3)),
             jnp.sin(gt_m[..., 6:7]), jnp.cos(gt_m[..., 6:7])], axis=-1,
        )
        pred_vec = jnp.concatenate(
            [preds["center"], preds["height"], preds["dim"],
             preds["rot"][..., 1:2], preds["rot"][..., 0:1]], axis=-1,
        )
        reg = jnp.sum(jnp.abs(pred_vec - t), axis=-1)
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
