"""Detector assembly: config-driven module topology.

Reference contract: Detector3DTemplate builds `vfe → backbone_3d → map_to_bev →
pfe → backbone_2d → dense_head → point_head → roi_head` from MODEL config
(detector3d_template.py:24-27) and `build_network` dispatches by MODEL.NAME
(models/__init__.py:16-20). Here each detector is a flax module whose
`__call__` runs the train path (loss) and `predict` the eval path (decoded,
fixed-size masked boxes).

In the dense-pillar formulation the VFE already scatters into the BEV grid, so
`PointPillarScatter` (map_to_bev) is an identity marker kept for config parity.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.voxel import VoxelGrid
from .backbone_2d import BaseBEVBackbone, BaseBEVResBackbone
from .center_head import CenterHead
from .vfe import DynPillarVFE


class CenterPoint(nn.Module):
    """CenterPoint-pillar (the DFU3D flagship config,
    tools/cfgs/kitti_models/centerpoint_nuscenes2kitti.yaml)."""

    model_cfg: Any          # CfgDict MODEL tree
    class_names: Sequence[str]
    grid: VoxelGrid         # from DATA_CONFIG (POINT_CLOUD_RANGE + VOXEL_SIZE)
    dtype: jnp.dtype = jnp.float32

    @property
    def cfg(self):
        from ..utils.config import thaw_cfg

        return thaw_cfg(self.model_cfg)

    max_voxels: int = 60000  # voxel-variant capacity (MeanVFE path)

    def setup(self):
        cfg = self.cfg
        vfe_cfg = cfg.VFE
        # BACKBONE_3D with a null/empty NAME counts as absent so derived
        # configs can switch a voxel base back to the pillar path (yaml
        # inheritance can override but not delete keys)
        self._use_voxel_backbone = bool(
            cfg.get("BACKBONE_3D") and cfg.BACKBONE_3D.get("NAME")
        )
        self._use_dsvt = (
            self._use_voxel_backbone
            and cfg.BACKBONE_3D.get("NAME", "") == "DSVT"
        )
        if self._use_dsvt:
            # DSVT pillar transformer (backbones_3d/dsvt.py; N7 ingroup_inds)
            from .dsvt import DSVTBackbone
            from .vfe import DynVoxelVFE

            if vfe_cfg.NAME in ("DynamicVoxelVFE", "DynVoxelVFE"):
                # the reference DSVT configs' learned VFE
                # (dsvt_pillar.yaml:65, dynamic_voxel_vfe.py:15)
                self.vfe = DynVoxelVFE(
                    num_filters=tuple(vfe_cfg.NUM_FILTERS),
                    grid=self.grid,
                    use_norm=vfe_cfg.get("USE_NORM", True),
                    use_absolute_xyz=vfe_cfg.get("USE_ABSLOTE_XYZ", True),
                    with_distance=vfe_cfg.get("WITH_DISTANCE", False),
                    max_voxels=self.max_voxels,
                    dtype=self.dtype,
                )
            else:
                # MeanVFE fallback (also accepted when a derived config
                # leaves the base pillar VFE in place)
                assert vfe_cfg.NAME in (
                    "MeanVFE", "DynPillarVFE", "DynamicPillarVFE"), vfe_cfg.NAME
                self.vfe = None

            nx, ny, nz_grid = self.grid.grid_size
            bb3d = cfg.BACKBONE_3D
            self._dsvt_voxel = False
            if "set_info" in bb3d:
                # the reference's native schema (dsvt_pillar.yaml:70-92):
                # set_info [[set_size, num_blocks]], d_model/nhead/
                # dim_feedforward lists, INPUT_LAYER.window_shape
                # [[wx, wy, wz]] + hybrid_factor
                il = bb3d.get("INPUT_LAYER", {})
                stages = [tuple(si) for si in bb3d.set_info]
                wins3 = [tuple(w) for w in il.get(
                    "window_shape", [[12, 12, 1]])]
                hyb3 = tuple(il.get("hybrid_factor", [2, 2, 1]))
                sparse3 = tuple(il.get("sparse_shape", [nx, ny, nz_grid]))
                self._dsvt_voxel = len(stages) > 1 or sparse3[2] > 1
                if self._dsvt_voxel:
                    # multi-stage 3D DSVT (dsvt_voxel.yaml:71-94)
                    from .dsvt import DSVTVoxelBackbone

                    self.backbone_3d = DSVTVoxelBackbone(
                        dim=int(bb3d.d_model[0]),
                        num_heads=int(bb3d.nhead[0]),
                        set_info=tuple(stages),
                        window_shape=tuple(wins3),
                        downsample_stride=tuple(
                            tuple(d) for d in il.get(
                                "downsample_stride", [])),
                        sparse_shape=sparse3,
                        hybrid_factor=hyb3,
                        max_sets=int(bb3d.get("MAX_SETS", 1024)),
                        dim_ff=int(bb3d.get("dim_feedforward", [0])[0]),
                        dtype=self.dtype,
                    )
                else:
                    self.backbone_3d = DSVTBackbone(
                        dim=int(bb3d.d_model[0]),
                        num_heads=int(bb3d.nhead[0]),
                        num_blocks=int(stages[0][1]),
                        window_shape=wins3[0][:2],
                        set_size=int(stages[0][0]),
                        max_sets=int(bb3d.get("MAX_SETS", 1024)),
                        grid_size=(nx, ny),
                        hybrid_factor=hyb3[:2],
                        dim_ff=int(bb3d.get("dim_feedforward", [0])[0]),
                        dtype=self.dtype,
                    )
            else:
                self.backbone_3d = DSVTBackbone(
                    dim=int(bb3d.get("DIM", 128)),
                    num_heads=int(bb3d.get("NUM_HEADS", 8)),
                    num_blocks=int(bb3d.get("NUM_BLOCKS", 4)),
                    window_shape=tuple(bb3d.get("WINDOW_SHAPE", (12, 12))),
                    set_size=int(bb3d.get("SET_SIZE", 36)),
                    max_sets=int(bb3d.get("MAX_SETS", 1024)),
                    grid_size=(nx, ny),
                    hybrid_factor=tuple(bb3d.get("HYBRID_FACTOR", (2, 2))),
                    dim_ff=int(bb3d.get("DIM_FEEDFORWARD", 0)),
                    dtype=self.dtype,
                )
        elif self._use_voxel_backbone:
            # voxel CenterPoint: MeanVFE + sparse 3D backbone (the reference's
            # alternative config, centerpoint_nuscenes2kitti.yaml:100-180)
            from ..core.voxel.sparse_ops import SparseGrid
            from .column_sparse import select_backbone8x
            from .sparse_backbone import VoxelResBackBone8x

            assert vfe_cfg.NAME == "MeanVFE", vfe_cfg.NAME
            nx, ny, nz = self.grid.grid_size
            bb3d = cfg.BACKBONE_3D
            if bb3d.NAME == "VoxelResBackBone8x":
                self.backbone_3d = VoxelResBackBone8x(
                    grid=SparseGrid(nx, ny, nz),
                    voxel_cap=self.max_voxels,
                    channels=tuple(bb3d.get("CHANNELS", (16, 32, 64, 128))),
                    out_channels=bb3d.get("OUT_CHANNELS", 128),
                    dtype=self.dtype,
                )
            else:
                self.backbone_3d = select_backbone8x(bb3d)(
                    grid=SparseGrid(nx, ny, nz),
                    voxel_cap=self.max_voxels,
                    channels=tuple(bb3d.get("CHANNELS", (16, 16, 32, 64, 64))),
                    out_channels=bb3d.get("OUT_CHANNELS", 128),
                    dtype=self.dtype,
                )
        else:
            assert vfe_cfg.NAME in ("DynPillarVFE", "DynamicPillarVFE"), vfe_cfg.NAME
            self.vfe = DynPillarVFE(
                num_filters=tuple(vfe_cfg.NUM_FILTERS),
                grid=self.grid,
                use_norm=vfe_cfg.get("USE_NORM", True),
                use_absolute_xyz=vfe_cfg.get("USE_ABSLOTE_XYZ", True),
                with_distance=vfe_cfg.get("WITH_DISTANCE", False),
                dtype=self.dtype,
            )
        bb = cfg.BACKBONE_2D
        assert bb.NAME in ("BaseBEVBackbone", "BaseBEVResBackbone"), bb.NAME
        bb_cls = (BaseBEVBackbone if bb.NAME == "BaseBEVBackbone"
                  else BaseBEVResBackbone)
        self.backbone_2d = bb_cls(
            layer_nums=tuple(bb.LAYER_NUMS),
            layer_strides=tuple(bb.LAYER_STRIDES),
            num_filters=tuple(bb.NUM_FILTERS),
            upsample_strides=tuple(bb.UPSAMPLE_STRIDES),
            num_upsample_filters=tuple(bb.NUM_UPSAMPLE_FILTERS),
            dtype=self.dtype,
        )
        dh = cfg.DENSE_HEAD
        assert dh.NAME == "CenterHead", dh.NAME
        ta = dh.TARGET_ASSIGNER_CONFIG
        self.dense_head = CenterHead(
            class_names=tuple(self.class_names),
            class_names_each_head=tuple(tuple(x) for x in dh.CLASS_NAMES_EACH_HEAD),
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
        if self._use_dsvt:
            from ..core.voxel import dynamic_voxelize

            nx, ny, _ = self.grid.grid_size

            if self.vfe is not None:
                feats, coords3, valid = self.vfe(
                    batch.points, batch.points_valid, train)
                coords = coords3[..., :2]
            else:

                def pillarize_one(points, valid):
                    vox = dynamic_voxelize(
                        self.grid, points, valid, self.max_voxels)
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

                feats, coords3, valid = jax.vmap(pillarize_one)(
                    batch.points, batch.points_valid
                )
                coords = coords3[..., :2]
            b = feats.shape[0]
            cells = nx * ny
            if self._dsvt_voxel:
                # multi-stage 3D DSVT: flat output with per-voxel batch ids
                out, bev_xy, bidx, out_valid = self.backbone_3d(
                    feats, coords3, valid, train)
                lin = jnp.where(
                    out_valid,
                    bidx * cells + bev_xy[:, 1] * nx + bev_xy[:, 0],
                    b * cells)
            else:
                out = self.backbone_3d(feats, coords, valid, train)
                out = out.reshape(-1, out.shape[-1])
                lin = coords[..., 1] * nx + coords[..., 0]
                lin = jnp.where(
                    valid, lin + jnp.arange(b)[:, None] * cells, b * cells
                ).reshape(-1)
            # scatter pillars to the dense BEV
            dense = (
                jnp.zeros((b * cells + 1, out.shape[-1]), out.dtype)
                .at[lin]
                .set(out, mode="drop")
            )[: b * cells]
            bev = dense.reshape(b, ny, nx, -1)
        elif self._use_voxel_backbone:
            from ..core.voxel import dynamic_voxelize
            from .sparse_backbone import height_compression

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

            feats, coords, valid = jax.vmap(voxelize_one)(
                batch.points, batch.points_valid
            )
            st = self.backbone_3d(feats, coords, valid, train)
            bev = height_compression(st).astype(self.dtype)
        else:
            bev = self.vfe(batch.points, batch.points_valid, train)
        spatial_features_2d = self.backbone_2d(bev, train)
        return self.dense_head(spatial_features_2d, train)

    def __call__(self, batch, train: bool = True):
        """Train path → (loss, tb_dict). Eval path handled by `predict`."""
        pred_dicts = self._features(batch, train)
        h, w = pred_dicts[0]["hm"].shape[1:3]
        targets = self.dense_head.assign_targets(
            batch.gt_boxes, batch.gt_valid, (h, w)
        )
        loss, tb = self.dense_head.get_loss(
            pred_dicts, targets, self.cfg.DENSE_HEAD.LOSS_CONFIG.LOSS_WEIGHTS
        )
        return loss, tb

    def predict(self, batch):
        """Eval: decoded, NMS'd boxes. Returns (boxes, scores, labels, valid)."""
        pred_dicts = self._features(batch, train=False)
        return self.dense_head.generate_predicted_boxes(
            pred_dicts, self.cfg.DENSE_HEAD.POST_PROCESSING
        )


from .pointpillar import PointPillar, SECONDNet  # noqa: E402
from .second_iou import SECONDNetIoU  # noqa: E402
from .pillarnet import PillarNet  # noqa: E402
from .pointrcnn import PointRCNN  # noqa: E402
from .voxelnext import VoxelNeXt  # noqa: E402
from .parta2 import PartA2Net  # noqa: E402
from .pvrcnn import PVRCNN, PVRCNNPlusPlus  # noqa: E402
from .voxelrcnn import VoxelRCNN  # noqa: E402
from .caddn import CaDDN  # noqa: E402
from .bevfusion import BevFusion, TransFusion  # noqa: E402
from .mppnet import MPPNet, MPPNetE2E  # noqa: E402

__all_detectors__ = {
    "CenterPoint": CenterPoint,
    "PointPillar": PointPillar,
    "SECONDNet": SECONDNet,
    "PointRCNN": PointRCNN,
    "VoxelNeXt": VoxelNeXt,
    "PartA2Net": PartA2Net,
    "SECONDNetIoU": SECONDNetIoU,
    "PVRCNN": PVRCNN,
    "PVRCNNPlusPlus": PVRCNNPlusPlus,
    "VoxelRCNN": VoxelRCNN,
    "CaDDN": CaDDN,
    "TransFusion": TransFusion,
    "BevFusion": BevFusion,
    "PillarNet": PillarNet,
    "MPPNet": MPPNet,
    "MPPNetE2E": MPPNetE2E,
}


def build_network(model_cfg, class_names, grid: VoxelGrid, dtype=jnp.float32,
                  **overrides):
    """Mirror of the reference build_network surface (models/__init__.py:16-20).

    `overrides` are extra dataclass fields of the detector (e.g. max_voxels,
    the static per-frame voxel capacity — reference MAX_NUMBER_OF_VOXELS,
    transform_points_to_voxels in data_processor.py:133).
    """
    cls = __all_detectors__[model_cfg.NAME]
    return cls(model_cfg=model_cfg, class_names=class_names, grid=grid,
               dtype=dtype, **overrides)
