from .dataset import DatasetTemplate, PointBatch
from .kitti_dataset import KittiDataset, KittiKittiDataset
from .loader import build_dataloader
from .nuscenes_dataset import NuScenesDataset

__all_datasets__ = {
    "DatasetTemplate": DatasetTemplate,
    "KittiDataset": KittiDataset,
    "KittiKittiDataset": KittiKittiDataset,
    "NuScenesDataset": NuScenesDataset,
}
