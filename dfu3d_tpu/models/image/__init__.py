"""Camera-branch modules: Swin backbone, LSS-FPN neck, depth-LSS view
transform (SURVEY §2.3 backbones_image; reference swin.py, generalized_lss.py,
view_transforms/depth_lss.py)."""
from .depth_lss import DepthLSSTransform
from .fpn import GeneralizedLSSFPN
from .swin import SwinTransformer

__all__ = ["DepthLSSTransform", "GeneralizedLSSFPN", "SwinTransformer"]
