"""Config-catalog tests: every shipped YAML under tools/cfgs/*_models/ must
load (including chained _BASE_CONFIG_ inheritance), reference only known
dataset/augmentor/processor/detector names, and build. A representative
subset per detector family also runs init + loss + grads at reduced grid
scale, driven entirely by the YAML-produced config.

Mirrors the reference catalog (tools/cfgs/: 22 kitti + 10 nuscenes +
22 waymo + 5 once + 2 lyft + 1 argo2 + 2 custom model configs, 12+ dataset
configs) — `test_reference_catalog_names` pins the name-for-name inventory.
"""
from pathlib import Path

import jax
import numpy as np
import pytest

from dfu3d_tpu.core.voxel import VoxelGrid
from dfu3d_tpu.data import __all_datasets__
from dfu3d_tpu.data.data_augmentor import DataAugmentor
from dfu3d_tpu.data.dataset import MultimodalBatch, PointBatch
from dfu3d_tpu.data.processor import DataProcessor
from dfu3d_tpu.models import build_network
from dfu3d_tpu.models.detectors import __all_detectors__
from dfu3d_tpu.utils.config import CfgDict, cfg_from_yaml_file

CFG_ROOT = Path(__file__).resolve().parent.parent / "tools" / "cfgs"
ALL_MODEL_YAMLS = sorted(CFG_ROOT.glob("*_models/*.yaml"))

# the reference's model-config inventory, name for name
# (reference tools/cfgs/<family>/ listings)
REFERENCE_CATALOG = {
    "kitti_models": [
        "CaDDN", "PartA2", "PartA2_free", "centerpoint",
        "centerpoint_nuscenes2kitti", "pillarnet", "pointpillar",
        "pointpillar_newaugs", "pointpillar_ori", "pointpillar_pyramid_aug",
        "pointrcnn", "pointrcnn_iou", "pointrcnn_nuscenes2kitti", "pv_rcnn",
        "pv_rcnn_plusplus_reproduced_by_community", "pv_rcnn_ps", "second",
        "second_iou", "second_multihead", "second_ps", "voxel_rcnn_car",
        "voxel_rcnn_car_focal_multimodal",
    ],
    "nuscenes_models": [
        "bevfusion", "cbgs_dyn_pp_centerpoint",
        "cbgs_pillar0075_res2d_centerpoint", "cbgs_pp_multihead",
        "cbgs_second_multihead", "cbgs_voxel0075_res3d_centerpoint",
        "cbgs_voxel0075_voxelnext", "cbgs_voxel0075_voxelnext_doubleflip",
        "cbgs_voxel01_res3d_centerpoint", "transfusion_lidar",
    ],
    "waymo_models": [
        "PartA2", "centerpoint", "centerpoint_4frames",
        "centerpoint_dyn_pillar_1x", "centerpoint_pillar_1x",
        "centerpoint_without_resnet", "dsvt_pillar", "dsvt_voxel",
        "mppnet_16frames", "mppnet_4frames",
        "mppnet_e2e_memorybank_inference", "pillarnet", "pointpillar_1x",
        "pv_rcnn", "pv_rcnn_plusplus", "pv_rcnn_plusplus_resnet",
        "pv_rcnn_plusplus_resnet_2frames", "pv_rcnn_with_centerhead_rpn",
        "second", "voxel_rcnn_with_centerhead_dyn_voxel",
        "voxelnext2d_ioubranch", "voxelnext_ioubranch_large",
    ],
    "once_models": ["centerpoint", "pointpillar", "pointrcnn", "pv_rcnn",
                    "second"],
    "lyft_models": ["cbgs_second-nores_multihead", "cbgs_second_multihead"],
    "argo2_models": ["cbgs_voxel01_voxelnext"],
    "custom_models": ["pv_rcnn", "second"],
}


def load_cfg(path):
    cfg = CfgDict()
    cfg_from_yaml_file(path, cfg)
    return cfg


def test_reference_catalog_names():
    for family, names in REFERENCE_CATALOG.items():
        have = {p.stem for p in (CFG_ROOT / family).glob("*.yaml")}
        missing = set(names) - have
        assert not missing, f"{family} missing configs: {sorted(missing)}"


@pytest.mark.parametrize("path", ALL_MODEL_YAMLS, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_loads_validates_and_builds(path):
    cfg = load_cfg(path)
    assert cfg.MODEL.NAME in __all_detectors__, cfg.MODEL.NAME
    d = cfg.DATA_CONFIG
    assert d.DATASET in __all_datasets__, d.DATASET
    for aug in d.get("DATA_AUGMENTOR", {}).get("AUG_CONFIG_LIST", []):
        assert callable(getattr(DataAugmentor, aug["NAME"], None)), (
            f"unknown augmentor {aug['NAME']}")
    for proc in d.get("DATA_PROCESSOR", []):
        assert callable(getattr(DataProcessor, proc["NAME"], None)), (
            f"unknown processor {proc['NAME']}")
    assert "OPTIMIZATION" in cfg and "POINT_CLOUD_RANGE" in d
    grid = tiny_grid(cfg)
    model = _build(cfg, grid, 256)
    assert model is not None


def _build(cfg, grid, cap):
    try:
        return build_network(cfg.MODEL, cfg.CLASS_NAMES, grid, max_voxels=cap)
    except TypeError:  # point/pillar/camera detectors take no voxel cap
        return build_network(cfg.MODEL, cfg.CLASS_NAMES, grid)


def tiny_grid(cfg, nxy=32):
    """Small test grid over the config's real range: xy shrunk to nxy cells,
    z level count preserved from the config's voxel size (capped at 8)."""
    pcr = [float(v) for v in cfg.DATA_CONFIG.POINT_CLOUD_RANGE]
    vz = None
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p["NAME"].startswith("transform_points_to_voxels"):
            vz = float(p["VOXEL_SIZE"][2])
    zext = pcr[5] - pcr[2]
    nz = max(1, min(8, int(round(zext / (vz or zext)))))
    vs = [(pcr[3] - pcr[0]) / nxy, (pcr[4] - pcr[1]) / nxy, zext / nz]
    return VoxelGrid.create(pcr, vs)


def _points_batch(cfg, rng, b=1, n=512, m=8, with_time=False):
    pcr = [float(v) for v in cfg.DATA_CONFIG.POINT_CLOUD_RANGE]
    nc = len(cfg.CLASS_NAMES)
    f = 5 if with_time else 4
    pts = np.zeros((b, n, f), np.float32)
    for i in range(3):
        pts[..., i] = rng.uniform(pcr[i], pcr[3 + i], (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    if with_time:
        pts[..., 4] = rng.randint(0, 4, (b, n)).astype(np.float32) * 0.1
    # velocity-width gt when any head regresses 'vel' (nuScenes family)
    head_orders = str(cfg.MODEL.get("DENSE_HEAD", {}).get(
        "SEPARATE_HEAD_CFG", {}).get("HEAD_ORDER", []))
    width = 10 if "vel" in head_orders else 8
    gt = np.zeros((b, m, width), np.float32)
    for i in range(2):
        ext = pcr[3 + i] - pcr[i]
        gt[..., i] = rng.uniform(pcr[i] + 0.05 * ext, pcr[3 + i] - 0.05 * ext,
                                 (b, m))
    gt[..., 2] = rng.uniform(pcr[2] + 1, min(pcr[5] - 1, pcr[2] + 3), (b, m))
    gt[..., 3:6] = rng.uniform(0.8, 4.5, (b, m, 3))
    gt[..., 6] = rng.uniform(-3, 3, (b, m))
    if width == 10:
        gt[..., 7:9] = rng.uniform(-3, 3, (b, m, 2))
    gt[..., -1] = rng.randint(1, nc + 1, (b, m))
    return PointBatch(pts, np.ones((b, n), bool), gt, np.ones((b, m), bool))


# representative init+loss+grads smoke per detector family / new code path
SMOKE_CONFIGS = [
    "kitti_models/centerpoint.yaml",          # VoxelResBackBone8x dispatch
    "waymo_models/centerpoint_pillar_1x.yaml",  # null-BACKBONE_3D inheritance
    "kitti_models/PartA2_free.yaml",
    "kitti_models/pointrcnn_iou.yaml",
    "kitti_models/pv_rcnn.yaml",
    "nuscenes_models/cbgs_pp_multihead.yaml",   # 10-class AnchorHeadMulti
    "nuscenes_models/cbgs_dyn_pp_centerpoint.yaml",  # velocity ('vel') branch
    "nuscenes_models/cbgs_voxel0075_voxelnext_doubleflip.yaml",
    "waymo_models/voxelnext_ioubranch_large.yaml",
    "waymo_models/dsvt_pillar.yaml",
    "kitti_models/pillarnet.yaml",   # Simple2D VFE + 2D-sparse + V1 + anchors
    "waymo_models/pillarnet.yaml",   # PillarRes18 + V1 + CenterHead
    "waymo_models/mppnet_4frames.yaml",
    "once_models/second.yaml",
]


@pytest.mark.parametrize("rel", SMOKE_CONFIGS, ids=lambda r: r)
def test_smoke_init_loss_grads(rel):
    cfg = load_cfg(CFG_ROOT / rel)
    grid = tiny_grid(cfg)
    with_time = cfg.MODEL.NAME.startswith("MPPNet")
    model = _build(cfg, grid, 512)
    rng = np.random.RandomState(0)
    batch = _points_batch(cfg, rng, with_time=with_time)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           train=False)
    (loss, _), _ = model.apply(variables, batch, train=True,
                               mutable=["batch_stats"])
    assert np.isfinite(float(loss)) and float(loss) > 0, rel

    def loss_fn(params):
        (l, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        return l

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves), rel
    boxes, *_ = model.apply(variables, batch,
                            method=lambda m, b: m.predict(b))
    assert np.isfinite(np.asarray(boxes)).all(), rel


def test_nested_base_config_chain():
    """Three-deep inheritance (second_ps → second → inline kitti data; plus
    a nested dataset-base override) resolves: the loader expands base files
    recursively (utils/config.py merge_new_config)."""
    cfg = load_cfg(CFG_ROOT / "kitti_models" / "second_ps.yaml")
    assert cfg.MODEL.NAME == "SECONDNet"
    assert cfg.CLASS_NAMES == ["Car", "Pedestrian", "Bicycle"]
    # the nested DATA_CONFIG._BASE_CONFIG_ swapped the dataset contract
    assert cfg.DATA_CONFIG.INFO_PATH["train"] == [
        "pandasetkitti_infos_train.pkl"]
    assert cfg.DATA_CONFIG.POINT_CLOUD_RANGE == [0, -40, -3, 70, 40, 1]
    # while the model trunk comes from second.yaml
    assert cfg.MODEL.BACKBONE_3D.NAME == "VoxelBackBone8x"


@pytest.mark.parametrize("rel", [
    "cbgs_voxel0075_res3d_centerpoint.yaml",
    "cbgs_voxel0075_voxelnext.yaml",
    "cbgs_voxel0075_voxelnext_doubleflip.yaml",
    "cbgs_pillar0075_res2d_centerpoint.yaml",
    "transfusion_lidar.yaml",
], ids=lambda r: r)
def test_0075_configs_resolve_to_1440_grid(rel):
    """The 0.075 m nuScenes configs must yield the reference's 1440x1440 BEV
    grid (POINT_CLOUD_RANGE [-54, 54] / 0.075 — reference
    cbgs_voxel0075_res3d_centerpoint.yaml). A regression to the default
    [-51.2, 51.2] range gives a 1365-cell grid that breaks the 8x-stride
    backbone; pin it (ADVICE r3)."""
    cfg = load_cfg(CFG_ROOT / "nuscenes_models" / rel)
    pcr = [float(v) for v in cfg.DATA_CONFIG.POINT_CLOUD_RANGE]
    vs = None
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p["NAME"].startswith("transform_points_to_voxels"):
            vs = [float(v) for v in p["VOXEL_SIZE"]]
    assert vs is not None and vs[:2] == [0.075, 0.075], rel
    grid = VoxelGrid.create(pcr, vs)
    nz = int(round((pcr[5] - pcr[2]) / vs[2]))
    assert tuple(grid.grid_size)[:2] == (1440, 1440), (rel, grid.grid_size)
    assert int(grid.grid_size[2]) == nz, (rel, grid.grid_size)
