from .argo2_dataset import Argo2Dataset
from .custom_dataset import CustomDataset
from .dataset import DatasetTemplate, MultimodalBatch, PointBatch
from .kitti_dataset import KittiDataset, KittiKittiDataset
from .loader import build_dataloader
from .lyft_dataset import LyftDataset
from .nuscenes_dataset import NuScenesDataset
from .once_dataset import ONCEDataset
from .pandaset_dataset import PandasetDataset
from .waymo_dataset import WaymoDataset

__all_datasets__ = {
    "DatasetTemplate": DatasetTemplate,
    "KittiDataset": KittiDataset,
    "KittiKittiDataset": KittiKittiDataset,
    "NuScenesDataset": NuScenesDataset,
    "ONCEDataset": ONCEDataset,
    "CustomDataset": CustomDataset,
    "LyftDataset": LyftDataset,
    "WaymoDataset": WaymoDataset,
    "PandasetDataset": PandasetDataset,
    "Argo2Dataset": Argo2Dataset,
}
