"""PillarNet — reference-exact pipeline (pcdet detectors/pillarnet.py):

DynamicPillarVFESimple2D (dynamic_pillar_vfe.py:145-240: f_center + abs-xyz
features through PFNLayerV2 with per-pillar scatter-max) → sparse 2D pillar
pyramid to stride 8 (spconv_backbone_2d.py PillarBackBone8x/Res18: expressed
here as the nz=1 sparse voxel backbone — 3×3×3 submanifold kernels
degenerate to 3×3 2D sparse convs on pillars) → dense x_conv5 stage (three
conv-BN-ReLU, first at stride 2, :153-155) → BaseBEVBackboneV1 (deblock the
raw stride-8 map, refine the concat) → CenterHead (waymo configs) or
AnchorHeadSingle (kitti config).

`PillarNet` is a build_network-compatible factory dispatching on
DENSE_HEAD.NAME, mirroring the reference where Detector3DTemplate is
head-agnostic.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.voxel import VoxelGrid, dynamic_voxelize
from ..core.voxel.sparse_ops import SparseGrid
from .backbone_2d import BaseBEVBackboneV1, ConvBNReLU
from .center_head import CenterHead
from .detectors import CenterPoint
from .pointpillar import AnchorDetectorBase
from .sparse_backbone import VoxelBackBone8x, height_compression
from .vfe import PFNLayer


class DynPillarVFESimple2D(nn.Module):
    """DynamicPillarVFESimple2D (dynamic_pillar_vfe.py:145-240): per-point
    [f_center, (abs xyz +) extra feats] → PFNLayerV2 stack with scatter-max
    per pillar. Returns SPARSE per-sample pillar features for the 2D-sparse
    pyramid (the reference's pillar_features/pillar_coords contract)."""

    num_filters: Sequence[int]
    grid: VoxelGrid
    use_norm: bool = True
    use_absolute_xyz: bool = True
    with_distance: bool = False
    max_pillars: int = 32768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, points_valid, train: bool):
        """points (B, N, C) → (feats (B, V, F), coords (B, V, 3),
        valid (B, V))."""
        b, n, c = points.shape
        g = self.grid
        pcr = jnp.asarray(g.point_cloud_range, jnp.float32)
        vs = jnp.asarray(g.voxel_size, jnp.float32)

        vox = jax.vmap(
            lambda p, v: dynamic_voxelize(g, p, v, self.max_pillars)
        )(points, points_valid)

        xyz = points[..., :3].astype(jnp.float32)
        cf = jnp.floor((xyz[..., :2] - pcr[:2]) / vs[:2])
        f_center = jnp.stack(
            [
                xyz[..., 0] - (cf[..., 0] * vs[0] + vs[0] / 2 + pcr[0]),
                xyz[..., 1] - (cf[..., 1] * vs[1] + vs[1] / 2 + pcr[1]),
                xyz[..., 2] - (vs[2] / 2 + pcr[2]),
            ],
            axis=-1,
        )
        feats = [f_center]
        if self.use_absolute_xyz:
            feats.append(points.astype(jnp.float32))
        else:
            feats.append(points[..., 3:].astype(jnp.float32))
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1).astype(self.dtype)
        ok = points_valid & (vox.point_to_voxel < self.max_pillars)
        x = jnp.where(ok[..., None], x, 0.0)

        # global segment ids so PFNLayer's MaskedBatchNorm sees the whole
        # batch (reference BatchNorm1d over all points)
        seg = jnp.where(
            ok,
            vox.point_to_voxel
            + jnp.arange(b, dtype=jnp.int32)[:, None] * self.max_pillars,
            b * self.max_pillars,
        ).reshape(b * n)
        flat = x.reshape(b * n, x.shape[-1])
        ok_flat = ok.reshape(b * n)

        x_max = None
        for i, nf in enumerate(self.num_filters):
            last = i >= len(self.num_filters) - 1
            flat, x_max = PFNLayer(
                out_channels=nf, use_norm=self.use_norm, last_layer=last,
                dtype=self.dtype, name=f"pfn_{i}",
            )(flat, ok_flat, seg, b * self.max_pillars, train)

        feats_out = x_max.reshape(b, self.max_pillars, -1)
        return feats_out, vox.voxel_coords, vox.voxel_valid


class _PillarNetFeaturesMixin:
    """Shared feature stack: VFE → sparse pyramid → x4/x5 → V1 neck."""

    def _setup_pillarnet(self, cfg):
        vfe_cfg = cfg.VFE
        assert vfe_cfg.NAME in (
            "DynamicPillarVFESimple2D", "DynPillarVFESimple2D", "MeanVFE",
        ), vfe_cfg.NAME
        nx, ny, nz = self.grid.grid_size
        assert nz == 1, f"PillarNet needs a pillar grid (nz == 1), got {nz}"
        self._mean_vfe = vfe_cfg.NAME == "MeanVFE"
        if not self._mean_vfe:
            self.vfe = DynPillarVFESimple2D(
                num_filters=tuple(vfe_cfg.get("NUM_FILTERS", (32,))),
                grid=self.grid,
                use_norm=vfe_cfg.get("USE_NORM", True),
                use_absolute_xyz=vfe_cfg.get("USE_ABSLOTE_XYZ", True),
                with_distance=vfe_cfg.get("WITH_DISTANCE", False),
                max_pillars=self.max_voxels,
                dtype=self.dtype,
            )
        bb3d = cfg.get("BACKBONE_3D", {})
        # PillarRes18BackBone8x (spconv_backbone_2d.py:207) uses residual
        # SparseBasicBlocks; PillarBackBone8x plain post-act blocks
        from .sparse_backbone import VoxelResBackBone8x

        bb_cls = (VoxelResBackBone8x
                  if "Res" in bb3d.get("NAME", "") else VoxelBackBone8x)
        self.backbone_3d = bb_cls(
            grid=SparseGrid(nx, ny, nz),
            voxel_cap=self.max_voxels,
            channels=tuple(bb3d.get("CHANNELS", (32, 32, 64, 128, 256))),
            out_channels=bb3d.get("OUT_CHANNELS", 256),
            dtype=self.dtype,
        )
        c5 = int(bb3d.get("CONV5_CHANNELS", 256))
        self.conv5_blocks = [
            ConvBNReLU(c5, stride=2, dtype=self.dtype, name="conv5_down"),
            ConvBNReLU(c5, dtype=self.dtype, name="conv5_a"),
            ConvBNReLU(c5, dtype=self.dtype, name="conv5_b"),
        ]
        bb = cfg.BACKBONE_2D
        assert bb.NAME == "BaseBEVBackboneV1", bb.NAME
        self.backbone_2d = BaseBEVBackboneV1(
            layer_nums=tuple(bb.LAYER_NUMS),
            num_filters=tuple(bb.NUM_FILTERS),
            upsample_strides=tuple(bb.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(bb.NUM_UPSAMPLE_FILTERS),
            dtype=self.dtype,
        )

    def _pillar_inputs(self, batch, train):
        if not self._mean_vfe:
            return self.vfe(batch.points, batch.points_valid, train)

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

        return jax.vmap(voxelize_one)(batch.points, batch.points_valid)

    def _spatial_features(self, batch, train: bool):
        feats, coords, valid = self._pillar_inputs(batch, train)
        st = self.backbone_3d(feats, coords, valid, train)
        x4 = height_compression(st).astype(self.dtype)  # stride-8 dense
        x5 = x4
        for blk in self.conv5_blocks:
            x5 = blk(x5, train)                          # stride-16 dense
        return self.backbone_2d([x4, x5], train)


class PillarNetCenter(_PillarNetFeaturesMixin, CenterPoint):
    """PillarNet with CenterHead (waymo pillarnet.yaml family)."""

    def setup(self):
        cfg = self.cfg
        self._setup_pillarnet(cfg)
        dh = cfg.DENSE_HEAD
        assert dh.NAME == "CenterHead", dh.NAME
        ta = dh.TARGET_ASSIGNER_CONFIG
        self.dense_head = CenterHead(
            class_names=tuple(self.class_names),
            class_names_each_head=tuple(
                tuple(x) for x in dh.CLASS_NAMES_EACH_HEAD
            ),
            shared_conv_channel=dh.SHARED_CONV_CHANNEL,
            num_hm_conv=dh.NUM_HM_CONV,
            head_order=tuple(dh.SEPARATE_HEAD_CFG.HEAD_ORDER),
            head_dict=dict(dh.SEPARATE_HEAD_CFG.HEAD_DICT),
            point_cloud_range=tuple(self.grid.point_cloud_range),
            voxel_size=tuple(self.grid.voxel_size),
            feature_map_stride=ta.FEATURE_MAP_STRIDE,
            gaussian_overlap=ta.GAUSSIAN_OVERLAP,
            min_radius=ta.MIN_RADIUS,
            use_bias_before_norm=dh.get("USE_BIAS_BEFORE_NORM", False),
            dtype=self.dtype,
        )

    def _features(self, batch, train: bool):
        spatial = self._spatial_features(batch, train)
        return self.dense_head(spatial, train)


class PillarNetAnchor(_PillarNetFeaturesMixin, AnchorDetectorBase):
    """PillarNet with AnchorHeadSingle (kitti pillarnet.yaml)."""

    max_voxels: int = 32768

    def setup(self):
        cfg = self.cfg
        self._setup_pillarnet(cfg)
        self._setup_anchors(cfg)

    def _features(self, batch, train: bool):
        spatial = self._spatial_features(batch, train)
        return self.dense_head(spatial)


def PillarNet(model_cfg, class_names, grid, dtype=jnp.float32, **overrides):
    """build_network-compatible factory: head-dispatched PillarNet."""
    head = model_cfg.DENSE_HEAD.get("NAME", "CenterHead")
    cls = PillarNetCenter if head == "CenterHead" else PillarNetAnchor
    return cls(model_cfg=model_cfg, class_names=class_names, grid=grid,
               dtype=dtype, **overrides)
