from .voxelize import (
    VoxelGrid,
    bev_scatter,
    dynamic_voxelize,
    segment_broadcast,
    segment_max,
    segment_max_fast,
    segment_mean,
    segment_sum,
    voxel_coords_of_points,
)
from .spherical import spherical_min_range_resample
