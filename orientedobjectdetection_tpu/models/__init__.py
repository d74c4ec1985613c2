from ..utils.registry import (BACKBONES, DETECTORS, HEADS, LOSSES, MODELS,
                              NECKS)
from . import losses  # noqa: F401  (registers losses)
from .backbones.resnet import ResNet
from .dense_heads.rotated_anchor_head import RotatedRetinaHead
from .detectors.single_stage import (RotatedRetinaNet,
                                     RotatedSingleStageDetector)
from .necks.fpn import FPN


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
    'ResNet', 'FPN', 'RotatedRetinaHead', 'RotatedSingleStageDetector',
    'RotatedRetinaNet', 'build_detector', 'MODELS', 'BACKBONES', 'NECKS',
    'HEADS', 'LOSSES', 'DETECTORS',
]
