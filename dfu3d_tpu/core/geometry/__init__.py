from .boxes import (
    boxes3d_kitti_camera_to_imageboxes,
    boxes3d_kitti_camera_to_lidar,
    boxes3d_lidar_to_aligned_bev_boxes,
    boxes3d_lidar_to_kitti_camera,
    boxes3d_nearest_bev_iou,
    boxes3d_to_corners3d_kitti_camera,
    boxes_iou_normal,
    boxes_to_corners_3d,
    boxes_to_corners_bev,
    enlarge_box3d,
    limit_period,
    mask_boxes_outside_range,
    points_in_boxes,
    rotate_points_along_z,
    rotation_matrix_z,
)
from .calibration import (
    Calibration,
    CalibMatrices,
    corners3d_to_img_boxes,
    get_calib_from_file,
    img_to_rect,
    lidar_to_img,
    lidar_to_rect,
    rect_to_img,
    rect_to_lidar,
)
from .iou import (
    aligned_iou3d,
    pairwise_iou3d,
    pairwise_iou_bev,
    pairwise_overlap_bev,
)
from .nms import class_agnostic_nms, class_specific_nms, multi_classes_nms, nms_bev
