"""Camera-branch modules: Swin backbone, LSS-FPN neck, depth-LSS view
transform (SURVEY §2.3 backbones_image; reference swin.py, generalized_lss.py,
view_transforms/depth_lss.py)."""
from .deeplab import RESNET_LAYERS, DDNDeepLabV3
from .depth_lss import DepthLSSTransform
from .fpn import GeneralizedLSSFPN
from .swin import SwinTransformer

__all__ = ["DDNDeepLabV3", "DepthLSSTransform", "GeneralizedLSSFPN",
           "RESNET_LAYERS", "SwinTransformer"]
