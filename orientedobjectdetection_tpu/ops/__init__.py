from .boxes import (gt2gaussian, hbb2obb, norm_angle, obb2hbb, obb2poly,
                    obb2poly_np, obb2xyxy, poly2obb, poly2obb_np, rbbox_flip)
from .iou import box_iou_rotated, diff_iou_rotated_2d, rbbox_overlaps
from .points import (chamfer_distance, convex_giou, convex_hull,
                     convex_iou, min_area_polygons, points_in_polygons)
from .roi_align_rotated import roi_align_rotated
from .feature_align import (align_conv_sample, bilinear_sample,
                            deform_conv_sample, rotated_feature_align)
from .nms import (batched_nms_hbb, hbb_overlaps, multiclass_nms_rotated,
                  nms_hbb, nms_rotated)

__all__ = [
    'norm_angle', 'poly2obb', 'obb2poly', 'obb2hbb', 'hbb2obb', 'obb2xyxy',
    'poly2obb_np', 'obb2poly_np', 'rbbox_flip', 'gt2gaussian',
    'box_iou_rotated', 'diff_iou_rotated_2d', 'rbbox_overlaps',
    'nms_rotated', 'nms_hbb', 'multiclass_nms_rotated', 'batched_nms_hbb',
    'hbb_overlaps', 'points_in_polygons', 'convex_iou', 'convex_giou',
    'convex_hull', 'min_area_polygons', 'chamfer_distance',
    'roi_align_rotated', 'rotated_feature_align', 'align_conv_sample',
    'bilinear_sample', 'deform_conv_sample',
]
