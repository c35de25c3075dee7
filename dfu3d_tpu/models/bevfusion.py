"""TransFusion (lidar) and BEVFusion (lidar + camera) detectors.

Reference: pcdet/models/detectors/transfusion.py (lidar branch →
TransFusionHead) and bevfusion.py (SwinTransformer → GeneralizedLSSFPN →
DepthLSSTransform camera BEV, ConvFuser with the lidar BEV, shared 2D
backbone, TransFusionHead).

TPU redesign on this repo's primitives: sparse lidar encoder + height
compression from models/sparse_backbone, camera stack from models/image,
bev_pool from core.voxel; the head's Hungarian matching runs as a host
callback (models/transfusion_head)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.voxel import VoxelGrid, dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from .backbone_2d import BaseBEVBackbone
from .image import DepthLSSTransform, GeneralizedLSSFPN, SwinTransformer
from .column_sparse import select_backbone8x
from .sparse_backbone import VoxelBackBone8x, height_compression
from .transfusion_head import TransFusionHead


class TransFusion(nn.Module):
    """Lidar-only TransFusion (reference detectors/transfusion.py)."""

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
        self.backbone_3d = select_backbone8x(bb3d)(
            grid=SparseGrid(nx, ny, nz),
            voxel_cap=self.max_voxels,
            channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
            out_channels=bb3d.get("OUT_CHANNELS", 128),
            dtype=self.dtype,
        )
        bb = cfg.BACKBONE_2D
        self.backbone_2d = BaseBEVBackbone(
            layer_nums=tuple(bb.LAYER_NUMS),
            layer_strides=tuple(bb.LAYER_STRIDES),
            num_filters=tuple(bb.NUM_FILTERS),
            upsample_strides=tuple(bb.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(bb.NUM_UPSAMPLE_FILTERS),
            dtype=self.dtype,
        )
        dh = cfg.DENSE_HEAD
        tac = dh.get("TARGET_ASSIGNER_CONFIG", {})
        self.dense_head = TransFusionHead(
            num_class=len(self.class_names),
            num_proposals=int(dh.get("NUM_PROPOSALS", 200)),
            hidden=int(dh.get("HIDDEN_CHANNEL", 128)),
            num_heads=int(dh.get("NUM_HEADS", 8)),
            ffn_channel=int(dh.get("FFN_CHANNEL", 256)),
            num_hm_conv=int(dh.get("NUM_HM_CONV", 2)),
            nms_kernel_size=int(dh.get("NMS_KERNEL_SIZE", 3)),
            use_vel="vel" in list(dh.get("SEPARATE_HEAD_CFG", {}).get(
                "HEAD_ORDER", [])),
            dataset_name=str(tac.get("DATASET", "nuScenes")),
            use_bias_before_norm=bool(dh.get("USE_BIAS_BEFORE_NORM", False)),
            bn_momentum=1.0 - float(dh.get("BN_MOMENTUM", 0.1)),
            point_cloud_range=tuple(self.grid.point_cloud_range),
            voxel_size=tuple(self.grid.voxel_size),
            feature_map_stride=int(tac.get("FEATURE_MAP_STRIDE", 8)),
            matcher=str(dh.get("MATCHER", "auto")),
            dtype=self.dtype,
        )

    def _lidar_bev(self, batch, train: bool):
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
            return (sums / jnp.maximum(counts, 1.0)[:, None],
                    vox.voxel_coords, vox.voxel_valid)

        feats, coords, valid = jax.vmap(voxelize_one)(
            batch.points, batch.points_valid
        )
        st = self.backbone_3d(feats, coords, valid, train)
        return height_compression(st).astype(self.dtype)

    def _features(self, batch, train: bool):
        bev = self._lidar_bev(batch, train)
        spatial = self.backbone_2d(bev, train)
        return self.dense_head(spatial, train)

    def __call__(self, batch, train: bool = True):
        preds = self._features(batch, train)
        lw = self.cfg.DENSE_HEAD.get("LOSS_CONFIG", {}).get("LOSS_WEIGHTS", {})
        return self.dense_head.loss(preds, batch.gt_boxes, batch.gt_valid,
                                    dict(lw))

    def predict(self, batch):
        preds = self._features(batch, train=False)
        boxes, scores, labels = self.dense_head.decode(preds)
        keep = scores > 0.0
        return boxes, scores, labels, keep


class ConvFuser(nn.Module):
    """concat(camera BEV, lidar BEV) → 3×3 conv (reference fuser/convfuser.py)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cam_bev, lidar_bev, train: bool):
        x = jnp.concatenate(
            [cam_bev.astype(self.dtype), lidar_bev.astype(self.dtype)], axis=-1
        )
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class BevFusion(TransFusion):
    """Camera + lidar BEVFusion (reference detectors/bevfusion.py)."""

    def setup(self):
        super().setup()
        cfg = self.cfg
        ib = cfg.get("IMAGE_BACKBONE", {})
        self.image_backbone = SwinTransformer(
            embed_dim=int(ib.get("EMBED_DIMS", 96)),
            depths=tuple(ib.get("DEPTHS", (2, 2, 6))),
            num_heads=tuple(ib.get("NUM_HEADS", (3, 6, 12))),
            window_size=int(ib.get("WINDOW_SIZE", 7)),
            patch_size=int(ib.get("PATCH_SIZE", 4)),
            out_indices=tuple(ib.get("OUT_INDICES", (0, 1, 2))),
            dtype=self.dtype,
            name="image_backbone",
        )
        neck = cfg.get("NECK", {})
        self.image_neck = GeneralizedLSSFPN(
            in_channels=tuple(neck.get("IN_CHANNELS", (96, 192, 384))),
            out_channels=int(neck.get("OUT_CHANNELS", 128)),
            num_outs=1,
            dtype=self.dtype,
            name="image_neck",
        )
        vt = cfg.get("VTRANSFORM", {})
        pcr = list(self.grid.point_cloud_range)
        vs = list(self.grid.voxel_size)
        self.vtransform = DepthLSSTransform(
            in_channel=int(neck.get("OUT_CHANNELS", 128)),
            out_channel=int(vt.get("OUT_CHANNEL", 80)),
            image_size=tuple(vt.get("IMAGE_SIZE", (256, 704))),
            feature_size=tuple(vt.get("FEATURE_SIZE", (32, 88))),
            xbound=list(vt.get("XBOUND", [pcr[0], pcr[3], vs[0] * 8])),
            ybound=list(vt.get("YBOUND", [pcr[1], pcr[4], vs[1] * 8])),
            zbound=list(vt.get("ZBOUND", [pcr[2], pcr[5], pcr[5] - pcr[2]])),
            dbound=list(vt.get("DBOUND", [1.0, 60.0, 0.5])),
            downsample=int(vt.get("DOWNSAMPLE", 1)),
            dtype=self.dtype,
            name="vtransform",
        )
        self.fuser = ConvFuser(
            out_channels=int(
                self.cfg.get("FUSER", {}).get("OUT_CHANNEL", 128)
            ),
            dtype=self.dtype, name="fuser",
        )

    def _camera_bev(self, batch, train: bool):
        b, n_cam = batch.images.shape[:2]
        ih, iw = batch.images.shape[2:4]
        imgs = batch.images.reshape(b * n_cam, ih, iw, 3)
        stages = self.image_backbone(imgs, train)
        feats = self.image_neck(stages, train)[0]
        fh, fw = feats.shape[1:3]
        feats = feats.reshape(b, n_cam, fh, fw, -1)
        return self.vtransform(
            feats, batch.depth_maps[..., None], batch.cam2lidar_rots,
            batch.cam2lidar_trans, batch.cam_intrinsics, train,
        )

    def _features(self, batch, train: bool):
        lidar_bev = self._lidar_bev(batch, train)
        cam_bev = self._camera_bev(batch, train)
        if cam_bev.shape[1:3] != lidar_bev.shape[1:3]:
            cam_bev = jax.image.resize(
                cam_bev,
                (cam_bev.shape[0],) + lidar_bev.shape[1:3] + (cam_bev.shape[-1],),
                "bilinear",
            ).astype(self.dtype)
        fused = self.fuser(cam_bev, lidar_bev, train)
        spatial = self.backbone_2d(fused, train)
        return self.dense_head(spatial, train)
