"""SECOND-IoU: SECOND + a SECONDHead IoU-scoring second stage.

Reference: pcdet/models/detectors/second_net_iou.py +
roi_heads/second_head.py. The second stage pools each proposal's rotated
footprint from the (detached) 2D spatial features with the
affine_grid/grid_sample lattice, runs SHARED_FC → IOU_FC to predict the
proposal's IoU, trains it with BCE against the soft roi_iou labels of the
ProposalTargetLayer, and at test time uses the sigmoid IoU as the NMS score
over the unrefined proposal boxes (second_net_iou.post_processing:75-128).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import roi_head
from .anchor_head import decode_anchor_predictions
from .pointpillar import SECONDNet
from .roi_head import make_fc_stack, roi_head_loss_cfg, roi_head_target_cfg, shared_fc_stack


def bev_roi_align(feats, rois, grid_size: int, pcr, voxel_size,
                  stride: float):
    """Rotated BEV RoI-align (second_head.py roi_grid_pool:64-121).

    Replicates the reference's affine_grid/grid_sample(align_corners=True,
    zeros padding) sampling lattice, which reduces to
        px(u, v) = cx + hx·(u·cosa − v·sina)
        py(u, v) = cy + hy·(u·sina + v·cosa)
    with u along the output width axis, v along height, u/v ∈
    linspace(-1, 1, G), (cx, cy) the roi center in feature-map pixels and
    (hx, hy) its half extents (including the reference's half-pixel
    convention — centers are NOT offset by 0.5).

    feats (H, W, C) with rows = y; rois (R, 7+) world boxes.
    Returns (R, G, G, C), rows = v.
    """
    h, w = feats.shape[0], feats.shape[1]
    sx = voxel_size[0] * stride
    sy = voxel_size[1] * stride
    cxp = (rois[:, 0] - pcr[0]) / sx
    cyp = (rois[:, 1] - pcr[1]) / sy
    hx = rois[:, 3] / (2.0 * sx)
    hy = rois[:, 4] / (2.0 * sy)
    lin = jnp.linspace(-1.0, 1.0, grid_size)
    vg, ug = jnp.meshgrid(lin, lin, indexing="ij")  # rows = v, cols = u
    cosa = jnp.cos(rois[:, 6])[:, None, None]
    sina = jnp.sin(rois[:, 6])[:, None, None]
    px = cxp[:, None, None] + hx[:, None, None] * (ug * cosa - vg * sina)
    py = cyp[:, None, None] + hy[:, None, None] * (ug * sina + vg * cosa)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    dx = (px - x0)[..., None]
    dy = (py - y0)[..., None]

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        f = feats[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(ok[..., None], f, 0.0)

    return (tap(y0, x0) * (1 - dy) * (1 - dx)
            + tap(y0, x0 + 1) * (1 - dy) * dx
            + tap(y0 + 1, x0) * dy * (1 - dx)
            + tap(y0 + 1, x0 + 1) * dy * dx)


class SECONDNetIoU(SECONDNet):
    """SECOND trunk + SECONDHead IoU refinement (second_net_iou.py)."""

    def setup(self):
        super().setup()
        rh = self.cfg.get("ROI_HEAD", {})
        pool = rh.get("ROI_GRID_POOL", {})
        self.roi_grid = int(pool.get("GRID_SIZE", 7))
        self.roi_stride = float(pool.get("DOWNSAMPLE_RATIO", 8))
        dp = float(rh.get("DP_RATIO", 0.3))
        self.shared_fc = shared_fc_stack(
            tuple(rh.get("SHARED_FC", (256, 256))), dp, dtype=self.dtype,
            name="shared_fc")
        self.iou_fc = make_fc_stack(tuple(rh.get("IOU_FC", (256, 256))), 1,
                                    dp, dtype=self.dtype, name="iou_fc")

    def _proposals(self, rpn_preds, train: bool):
        boxes, cls_scores = decode_anchor_predictions(
            rpn_preds, jnp.asarray(self._anchors_flat), len(self.class_names)
        )
        nms_cfg = roi_head.resolve_nms_cfg(self.cfg.get("ROI_HEAD", {}),
                                           train)
        return roi_head.proposal_layer(boxes, cls_scores, nms_cfg)

    def _iou_head(self, spatial, rois, train: bool):
        """roi_grid_pool over DETACHED spatial features + detached rois
        (second_head.py:75-76), channel-major flatten, SHARED_FC → IOU_FC."""
        g = self.roi_grid
        pcr = jnp.asarray(self.grid.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.grid.voxel_size, jnp.float32)

        def one(f, r):
            return bev_roi_align(f, r, g, pcr, vs, self.roi_stride)

        pooled = jax.vmap(one)(
            jax.lax.stop_gradient(spatial.astype(jnp.float32)),
            jax.lax.stop_gradient(rois),
        )  # (B, R, g, g, C)
        b, r = pooled.shape[0], pooled.shape[1]
        x = pooled.reshape(b * r, g * g, pooled.shape[-1])
        x = jnp.moveaxis(x, -1, 1).reshape(b * r, -1)
        h = self.shared_fc(x.astype(self.dtype), train)
        return self.iou_fc(h, train).reshape(b, r)

    def __call__(self, batch, train: bool = True):
        from .anchor_head import anchor_head_loss

        spatial = self._spatial_features(batch, train)
        rpn_preds = self.dense_head(spatial)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        cfg = self.cfg
        lw = cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        total, tb = anchor_head_loss(
            rpn_preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {"cls_weight": lw["cls_weight"], "loc_weight": lw["loc_weight"],
             "dir_weight": lw.get("dir_weight", 0.2),
             "code_weights": lw.get("code_weights", None)},
            dir_offset=cfg.DENSE_HEAD.get("DIR_OFFSET", 0.78539),
            num_dir_bins=cfg.DENSE_HEAD.get("NUM_DIR_BINS", 2),
        )

        rois, roi_scores, roi_labels, _ = self._proposals(rpn_preds, True)
        rh_cfg = cfg.get("ROI_HEAD", {})
        key = (self.make_rng("sampler") if self.has_rng("sampler")
               else jax.random.PRNGKey(0))
        tgt = roi_head.assign_roi_targets(
            key, rois, roi_labels, roi_scores, batch.gt_boxes,
            batch.gt_valid, roi_head_target_cfg(rh_cfg),
        )
        rcnn_iou = self._iou_head(spatial, tgt["rois"], train)

        # get_box_iou_layer_loss (second_head.py:160-188): BCE (default)
        # vs the soft roi_iou labels, masked on labels >= 0
        loss_cfg = roi_head_loss_cfg(rh_cfg)
        iou_kind = rh_cfg.get("LOSS_CONFIG", {}).get(
            "IOU_LOSS", "BinaryCrossEntropy")
        labels = tgt["rcnn_cls_labels"].reshape(-1)
        x = rcnn_iou.reshape(-1)
        if iou_kind == "BinaryCrossEntropy":
            per = jnp.clip(x, 0) - x * labels + jnp.log1p(jnp.exp(-jnp.abs(x)))
        elif iou_kind == "L2":
            per = jnp.square(x - labels)
        elif iou_kind == "smoothL1":
            n = jnp.abs(x - labels)
            beta = 1.0 / 9.0
            per = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
        else:
            raise NotImplementedError(iou_kind)
        mask = (labels >= 0).astype(jnp.float32)
        iou_w = float(loss_cfg["LOSS_WEIGHTS"].get("rcnn_iou_weight", 1.0))
        iou_loss = iou_w * jnp.sum(per * mask) / jnp.maximum(
            jnp.sum(mask), 1.0)

        total = total + iou_loss
        tb.update({"iou_loss": iou_loss, "rcnn_loss_iou": iou_loss})
        return total, tb

    def predict(self, batch):
        spatial = self._spatial_features(batch, train=False)
        rpn_preds = self.dense_head(spatial)
        rois, roi_scores, roi_labels, roi_valid = self._proposals(
            rpn_preds, False
        )
        rcnn_iou = self._iou_head(spatial, rois, train=False)
        # batch_box_preds = rois, batch_cls_preds = rcnn_iou; NMS scores are
        # the sigmoid IoU predictions (second_net_iou.post_processing:126)
        scores = jnp.where(roi_valid, jax.nn.sigmoid(rcnn_iou), 0.0)
        return roi_head.final_nms(
            rois[..., :7], scores, roi_labels, roi_valid,
            self.cfg.POST_PROCESSING,
        )
