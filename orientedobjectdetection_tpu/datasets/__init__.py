from ..utils.registry import DATASETS, PIPELINES
from . import pipelines  # noqa: F401  (registers transforms)
from .dota import DOTADataset, DOTAv2Dataset, DOTAv15Dataset, SARDataset
from .hrsc import HRSCDataset
from .loader import DataLoader, pad_collate
from . import wrappers  # noqa: F401  (registers wrappers)


def build_dataset(cfg):
    return DATASETS.build(dict(cfg))


__all__ = [
    'DOTADataset', 'DOTAv15Dataset', 'DOTAv2Dataset', 'SARDataset',
    'HRSCDataset', 'DataLoader', 'pad_collate', 'build_dataset', 'DATASETS',
    'PIPELINES',
]
