from .common import (CrossEntropyLoss, FocalLoss, IoULoss, L1Loss, SmoothFocalLoss,
                     SmoothL1Loss, reduce_loss, sigmoid_focal_loss,
                     smooth_l1_loss, weighted_loss)
from .gaussian_dist_loss import GDLoss, GDLoss_v1, xy_wh_r_2_xy_sigma
from .kf_iou_loss import KFLoss
from .rotated_iou_loss import RotatedIoULoss

__all__ = [
    'reduce_loss', 'weighted_loss', 'sigmoid_focal_loss', 'smooth_l1_loss',
    'FocalLoss', 'SmoothFocalLoss', 'L1Loss', 'SmoothL1Loss',
    'CrossEntropyLoss', 'IoULoss', 'GDLoss', 'GDLoss_v1', 'KFLoss', 'RotatedIoULoss',
    'xy_wh_r_2_xy_sigma',
]
from .common import ObjectnessLoss2, ObjectnessLoss3, VarifocalLoss
from .spatial_border_loss import SpatialBorderLoss
from .kld_reppoints_loss import KLDRepPointsLoss
__all__ += ['VarifocalLoss', 'ObjectnessLoss2', 'ObjectnessLoss3',
            'SpatialBorderLoss', 'KLDRepPointsLoss']
