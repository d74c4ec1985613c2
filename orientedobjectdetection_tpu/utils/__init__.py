from .config import Config, ConfigDict
from .registry import (BACKBONES, BBOX_ASSIGNERS, BBOX_CODERS, BBOX_SAMPLERS,
                       DATASETS, DETECTORS, HEADS, IOU_CALCULATORS, LOSSES,
                       MODELS, NECKS, PIPELINES, PRIOR_GENERATORS, Registry,
                       ROI_EXTRACTORS, build_from_cfg)

__all__ = [
    'Config', 'ConfigDict', 'Registry', 'build_from_cfg', 'MODELS',
    'BACKBONES', 'NECKS', 'HEADS', 'LOSSES', 'DETECTORS', 'ROI_EXTRACTORS',
    'BBOX_CODERS', 'BBOX_ASSIGNERS', 'BBOX_SAMPLERS', 'IOU_CALCULATORS',
    'PRIOR_GENERATORS', 'DATASETS', 'PIPELINES',
]
