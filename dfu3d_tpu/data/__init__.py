from .dataset import DatasetTemplate, PointBatch
from .kitti_dataset import KittiDataset
from .loader import build_dataloader

__all_datasets__ = {
    "DatasetTemplate": DatasetTemplate,
    "KittiDataset": KittiDataset,
}
