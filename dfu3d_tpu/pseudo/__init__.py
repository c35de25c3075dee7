from .ops import (
    above_plane,
    ball_gate_mask,
    connected_components,
    fit_ground_plane,
    radius_outlier_mask,
    rectangle_search,
)
from .factory import PseudoBoxFactory, FrameInputs
