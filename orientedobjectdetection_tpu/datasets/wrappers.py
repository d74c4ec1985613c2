"""Dataset wrappers (reference ``datasets/builder.py:49`` delegates to mmdet
ConcatDataset / ClassBalancedDataset / MultiImageMixDataset)."""

from __future__ import annotations

import math

import numpy as np

from ..utils.registry import DATASETS


@DATASETS.register_module()
class ConcatDataset:
    """Chain several datasets; shared CLASSES from the first."""

    def __init__(self, datasets):
        from . import build_dataset
        self.datasets = [d if not isinstance(d, dict) else build_dataset(d)
                         for d in datasets]
        self.CLASSES = self.datasets[0].CLASSES
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def _locate(self, idx):
        k = int(np.searchsorted(self._offsets, idx, side='right') - 1)
        return self.datasets[k], idx - int(self._offsets[k])

    def __getitem__(self, idx):
        ds, i = self._locate(idx)
        return ds[i]

    def get_ann_info(self, idx):
        ds, i = self._locate(idx)
        return ds.get_ann_info(i)


@DATASETS.register_module()
class ClassBalancedDataset:
    """Repeat-factor sampling (reference/mmdet ClassBalancedDataset; LVIS
    recipe): images whose rarest category has frequency f get repeated
    max(1, sqrt(t/f)) times."""

    def __init__(self, dataset, oversample_thr: float = 1e-3):
        from . import build_dataset
        self.dataset = dataset if not isinstance(dataset, dict) \
            else build_dataset(dataset)
        self.CLASSES = self.dataset.CLASSES
        n = len(self.dataset)
        num_classes = len(self.CLASSES)
        counts = np.zeros(num_classes, np.int64)
        img_cats = []
        for i in range(n):
            labels = np.unique(self.dataset.get_ann_info(i)['labels'])
            img_cats.append(labels)
            counts[labels] += 1
        freq = np.maximum(counts / max(n, 1), 1e-12)
        cat_repeat = np.maximum(1.0, np.sqrt(oversample_thr / freq))
        indices = []
        for i, cats in enumerate(img_cats):
            r = cat_repeat[cats].max() if len(cats) else 1.0
            indices.extend([i] * int(math.ceil(r)))
        self._indices = np.asarray(indices)

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, idx):
        return self.dataset[int(self._indices[idx])]

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(int(self._indices[idx]))


@DATASETS.register_module()
class MultiImageMixDataset:
    """Wrapper enabling mix transforms (RMosaic) that need extra images:
    exposes get_indexes-driven mixing by attaching itself to the pipeline
    (reference/mmdet MultiImageMixDataset)."""

    def __init__(self, dataset, pipeline=None):
        from . import build_dataset
        from .pipelines import Compose
        self.dataset = dataset if not isinstance(dataset, dict) \
            else build_dataset(dataset)
        self.CLASSES = self.dataset.CLASSES
        self.pipeline = Compose(pipeline) if pipeline else None

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        results = self.dataset[idx]
        if self.pipeline is None:
            return results
        for t in self.pipeline.transforms:
            # mix transforms (RMosaic) consume 3 extra random samples
            if type(t).__name__ in ('RMosaic',):
                idxs = np.random.randint(0, len(self.dataset), 3)
                results['mix_results'] = [self.dataset[int(i)]
                                          for i in idxs]
            results = t(results)
            if results is None:
                return None
            results.pop('mix_results', None)
        return results

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(idx)
