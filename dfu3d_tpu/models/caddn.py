"""CaDDN — camera-only monocular 3D detector (reference:
pcdet/models/detectors/caddn.py + backbones_3d/vfe/image_vfe.py and its
image_vfe_modules: DDN depth distribution, frustum features, frustum→voxel
sampling, Conv2DCollapse map_to_bev, then the standard BEV anchor pipeline).

TPU redesign on this repo's primitives: compact residual DDN (no torchvision
pretrain — documented deviation), LID depth binning, gather-based trilinear
frustum sampling over the dense voxel grid, channel-collapse conv, shared
BaseBEVBackbone + AnchorHeadSingle machinery. Depth supervision comes from
the projected-LiDAR depth maps in the MultimodalBatch (ddn_loss focal)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .anchor_head import anchor_head_loss
from .image.ddn import DDN, ddn_depth_loss, frustum_to_voxel
from .image.deeplab import RESNET_LAYERS, DDNDeepLabV3
from .pointpillar import AnchorDetectorBase


class CaDDN(AnchorDetectorBase):
    def setup(self):
        cfg = self.cfg
        vfe = cfg.get("VFE", {})
        ddn_cfg = vfe.get("DDN", {})
        disc = vfe.get("DISC_CFG", {})
        self.num_depth_bins = int(disc.get("num_bins", 80))
        self.depth_min = float(disc.get("depth_min", 2.0))
        self.depth_max = float(disc.get("depth_max", 46.8))
        ddn_name = str(ddn_cfg.get("NAME", "DDNCompact"))
        if ddn_name == "DDNDeepLabV3":
            # the reference's actual DDN (CaDDN.yaml:32-37): torchvision
            # deeplabv3 backbone, features from layer1, CHANNEL_REDUCE after
            backbone = str(ddn_cfg.get("BACKBONE_NAME", "ResNet101"))
            layers = (tuple(ddn_cfg["LAYERS"]) if "LAYERS" in ddn_cfg
                      else RESNET_LAYERS[backbone])
            self.ddn = DDNDeepLabV3(
                num_classes=self.num_depth_bins + 1,
                layers=layers,
                dtype=self.dtype,
                name="ddn",
            )
        else:
            self.ddn = DDN(
                num_depth_bins=self.num_depth_bins,
                feat_channels=int(ddn_cfg.get("FEAT_CHANNELS", 64)),
                stem_channels=tuple(ddn_cfg.get("STEM_CHANNELS", (16, 32, 64))),
                dtype=self.dtype,
                name="ddn",
            )
        # DepthFFN CHANNEL_REDUCE (BasicBlock2D: 1×1 conv + BN + ReLU,
        # reference depth_ffn.py / CaDDN.yaml:38-41); defaulted on for the
        # deeplab path whose layer1 features are 256-ch
        cr = vfe.get(
            "CHANNEL_REDUCE",
            {"out_channels": 64} if ddn_name == "DDNDeepLabV3" else None,
        )
        if cr:
            self.channel_reduce_conv = nn.Conv(
                int(cr.get("out_channels", 64)), (1, 1), use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
                name="channel_reduce_conv",
            )
            self.channel_reduce_bn = nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                param_dtype=jnp.float32, name="channel_reduce_bn",
            )
        else:
            self.channel_reduce_conv = None
            self.channel_reduce_bn = None
        self.depth_loss_weight = float(
            vfe.get("LOSS", {}).get("WEIGHT", 3.0)
        )
        m2b = cfg.get("MAP_TO_BEV", {})
        self.bev_channels = int(m2b.get("NUM_BEV_FEATURES", 64))
        self.collapse_conv = nn.Conv(
            self.bev_channels, (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv2d_collapse",
        )
        self.collapse_bn = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=jnp.float32, name="collapse_bn",
        )
        self._setup_backbone2d(cfg)
        self._setup_anchors(cfg)

    def _voxel_centers(self):
        nx, ny, nz = self.grid.grid_size
        pcr = np.asarray(self.grid.point_cloud_range, np.float32)
        vs = np.asarray(self.grid.voxel_size, np.float32)
        ix, iy, iz = np.meshgrid(
            np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
        )
        centers = np.stack([ix, iy, iz], axis=-1).astype(np.float32)
        centers = (centers + 0.5) * vs + pcr[:3]
        return centers.reshape(-1, 3), (nx, ny, nz)

    def _features(self, batch, train: bool):
        b, n_cam = batch.images.shape[:2]
        ih, iw = batch.images.shape[2:4]
        imgs = batch.images.reshape(b * n_cam, ih, iw, 3)
        feats, depth_logits = self.ddn(imgs, train)
        if self.channel_reduce_conv is not None:
            feats = self.channel_reduce_conv(feats.astype(self.dtype))
            feats = nn.relu(
                self.channel_reduce_bn(feats, use_running_average=not train)
            ).astype(self.dtype)
        fh, fw = feats.shape[1:3]
        # frustum features: depth probs (drop the 'beyond' bin) ⊗ features
        probs = jax.nn.softmax(depth_logits, axis=-1)[..., : self.num_depth_bins]
        frustum = (
            probs.transpose(0, 3, 1, 2)[..., None]
            * feats.astype(jnp.float32)[:, None]
        )  # (B·N, D, fH, fW, C)

        centers, (nx, ny, nz) = self._voxel_centers()
        centers = jnp.asarray(centers)

        def sample_one(fr, l2c, c2i):
            v, ok = frustum_to_voxel(
                fr, centers, l2c, c2i, self.num_depth_bins,
                self.depth_min, self.depth_max, (ih, iw),
            )
            return v

        vox = jax.vmap(sample_one)(
            frustum,
            batch.lidar_to_cam.reshape(b * n_cam, 4, 4).astype(jnp.float32),
            batch.cam_to_img.reshape(b * n_cam, 3, 4).astype(jnp.float32),
        )  # (B·N, V, C)
        vox = vox.reshape(b, n_cam, nx, ny, nz, -1).sum(axis=1)
        # Conv2DCollapse: (z × C) channels → BEV channels
        bev = vox.transpose(0, 2, 1, 3, 4).reshape(
            b, ny, nx, nz * vox.shape[-1]
        ).astype(self.dtype)
        bev = self.collapse_conv(bev)
        bev = nn.relu(
            self.collapse_bn(bev, use_running_average=not train)
        ).astype(self.dtype)
        spatial = self.backbone_2d(bev, train)
        preds = self.dense_head(spatial)
        preds["depth_logits"] = depth_logits
        return preds

    def __call__(self, batch, train: bool = True):
        preds = self._features(batch, train)
        targets = self.assign_targets(batch.gt_boxes, batch.gt_valid)
        lw = self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        total, tb = anchor_head_loss(
            preds, targets, jnp.asarray(self._anchors_flat),
            len(self.class_names),
            {"cls_weight": lw["cls_weight"], "loc_weight": lw["loc_weight"],
             "dir_weight": lw.get("dir_weight", 0.2),
             "code_weights": lw.get("code_weights", None)},
        )
        b, n_cam = batch.images.shape[:2]
        fh, fw = preds["depth_logits"].shape[1:3]
        sparse = jax.image.resize(
            batch.depth_maps.reshape(b * n_cam, *batch.depth_maps.shape[2:]),
            (b * n_cam, fh, fw), "nearest",
        )
        d_loss = ddn_depth_loss(
            preds["depth_logits"], sparse, self.num_depth_bins,
            self.depth_min, self.depth_max,
        )
        total = total + self.depth_loss_weight * d_loss
        tb["depth_loss"] = d_loss
        return total, tb

    # predict: inherited from AnchorDetectorBase (generic decode + NMS path;
    # the extra depth_logits entry in preds is ignored by the decoder)
