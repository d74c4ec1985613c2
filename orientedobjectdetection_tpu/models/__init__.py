from ..utils.registry import (BACKBONES, DETECTORS, HEADS, LOSSES, MODELS,
                              NECKS)
from . import losses  # noqa: F401  (registers losses)
from .backbones.csp_darknet import YOLOv8CSPDarknet
from .backbones.cspnext import CSPNeXt, CSPNeXtLarge
from .backbones.jy_modules import (AdaptiveRotatedConv2d,
                                   DAttentionBaseline, MSARCModule,
                                   RotationallyDeformableConvolution,
                                   RountingFunction)
from .backbones.re_resnet import ReFPN, ReResNet, ri_roi_align_rotated
from .backbones.resnet import ResNet
from .backbones.convnext import ConvNeXt
from .backbones.swin import Swin, SwinTransformer
from . import yolo_blocks  # noqa: F401
from .dense_heads.rotated_anchor_head import (CSLRRetinaHead,
                                              KFIoURRetinaHead,
                                              RotatedATSSHead,
                                              RotatedRetinaHead)
from .dense_heads.rotated_fcos_head import CSLRFCOSHead, RotatedFCOSHead
from .detectors.single_stage import (RotatedFCOS, RotatedRetinaNet,
                                     RotatedRepPoints,
                                     RotatedSingleStageDetector,
                                     RotatedYOLOv8)
from .dense_heads.oriented_rpn_head import OrientedRPNHead
from .dense_heads.rotated_rpn_head import RotatedRPNHead
from .detectors.two_stage import (GlidingVertex, OrientedRCNN, ReDet,
                                  RoITransformer, RotatedFasterRCNN,
                                  RotatedTwoStageDetector)
from .roi_heads.gv_trans_heads import (GVBBoxHead, GVRatioRoIHead,
                                       RoITransRoIHead)
from .dense_heads.refine_heads import (ODMRefineHead,
                                       RotatedRetinaRefineHead)
from .detectors.refine_detectors import R3Det, S2ANet
from .dense_heads.jy_heads import (RotatedDecoupledBGHead,
                                   RotatedDecoupledObjHead,
                                   RotatedMSDCNHead)
from .dense_heads.rotated_reppoints_head import (ConvexAssigner,
                                                 ConvexGIoULoss,
                                                 MaxConvexIoUAssigner,
                                                 OrientedRepPointsHead,
                                                 RotatedRepPointsHead,
                                                 SAMRepPointsHead)
from .dense_heads.rotated_yolov8_head import (OBBLabelAssigner,
                                              RotatedYOLOv8Head)
from .necks.fpn import FPN
from .necks.pafpn import YOLOv8PAFPN
from .roi_heads import OrientedStandardRoIHead, RotatedShared2FCBBoxHead


def build_detector(cfg, train_cfg=None, test_cfg=None, dtype=None):
    """mmdet-compatible detector factory (reference
    ``models/builder.py:45-56``): train_cfg/test_cfg may live in the model
    config or be passed explicitly."""
    cfg = dict(cfg)
    if train_cfg is not None:
        cfg['train_cfg'] = train_cfg
    if test_cfg is not None:
        cfg['test_cfg'] = test_cfg
    kw = {}
    if dtype is not None:
        kw['dtype'] = dtype
    return DETECTORS.build(cfg, **kw)


__all__ = [
    'ResNet', 'CSPNeXt', 'CSPNeXtLarge', 'YOLOv8CSPDarknet', 'FPN',
    'RotatedMSDCNHead', 'RotatedDecoupledObjHead', 'RotatedDecoupledBGHead',
    'AdaptiveRotatedConv2d', 'MSARCModule', 'DAttentionBaseline', 'YOLOv8PAFPN', 'RotatedYOLOv8',
    'RotatedYOLOv8Head', 'OBBLabelAssigner', 'RotatedRepPointsHead',
    'OrientedRepPointsHead', 'SAMRepPointsHead', 'RotatedRepPoints',
    'ConvexAssigner', 'MaxConvexIoUAssigner', 'ConvexGIoULoss', 'RotatedRetinaHead', 'KFIoURRetinaHead', 'RotatedATSSHead',
    'CSLRRetinaHead', 'RotatedFCOSHead', 'CSLRFCOSHead',
    'RotatedFCOS', 'RotatedSingleStageDetector', 'OrientedRPNHead',
    'OrientedRCNN', 'RotatedFasterRCNN', 'RotatedTwoStageDetector',
    'GlidingVertex', 'RoITransformer', 'RotatedRPNHead', 'GVBBoxHead',
    'ReDet', 'ReResNet', 'ReFPN',
    'GVRatioRoIHead', 'RoITransRoIHead',
    'OrientedStandardRoIHead', 'RotatedShared2FCBBoxHead',
    'ODMRefineHead', 'RotatedRetinaRefineHead', 'S2ANet', 'R3Det',
    'RotatedRetinaNet', 'build_detector', 'MODELS', 'BACKBONES', 'NECKS',
    'HEADS', 'LOSSES', 'DETECTORS',
]
