"""Batching/padding data loader.

Replaces mmcv's DataLoader+collate (reference ``apis/train.py`` build_dataloader)
with a TPU-shaped iterator: every batch is a dict of fixed-shape numpy arrays
(images padded to a static size, gts padded to ``max_gt`` with a mask), ready
for ``jax.device_put`` with a batch sharding. Worker parallelism comes from a
thread pool (cv2 releases the GIL for decode/warp) plus a prefetch queue —
the host pipeline overlaps with device steps.
"""

from __future__ import annotations

import multiprocessing
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np


# Per-worker dataset handle for the process-pool decode path. Each worker
# receives the dataset once at pool start (initializer) instead of
# re-pickling it with every task.
_WORKER_DATASET = None


def _pool_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _pool_get(i):
    return _WORKER_DATASET[i]


_TRUNC_WARNED = [False]


def strip_host_normalize(dataset_cfg):
    """Remove the top-level ``Normalize`` from a dataset config's pipeline.

    Returns ``(new_cfg, norm_dict_or_None)``. When a Normalize step is
    found, the pipeline keeps images as raw uint8 and the returned
    img_norm_cfg is applied INSIDE the jitted train step instead
    (``parallel.train_state.normalize_images``). Measured at the production
    shape (1024 px batch 8, 1-core host): the host pipeline drops from
    ~75 ms to ~58 ms per sample and the per-step H2D transfer shrinks 4x
    (uint8 vs f32). Configs with no top-level Normalize (e.g. wrapper
    datasets) are returned unchanged with ``None``."""
    cfg = dict(dataset_cfg)
    pipeline = cfg.get('pipeline')
    if not pipeline:
        return cfg, None
    norm = None
    kept = []
    for tr in pipeline:
        if (norm is None and isinstance(tr, dict)
                and tr.get('type') == 'Normalize'):
            norm = {k: v for k, v in tr.items() if k != 'type'}
        else:
            kept.append(tr)
    if norm is None:
        return cfg, None
    cfg['pipeline'] = kept
    return cfg, norm


def pad_collate(samples, max_gt: int = 512, pad_size=None):
    """List of pipeline outputs -> fixed-shape batch dict.

    Crowded DOTA tiles can exceed ``max_gt`` (small-vehicle scenes run past
    500 instances); overflow keeps the LARGEST-AREA boxes and warns once.
    The dropped boxes are NOT discarded: they fill ``gt_ignore`` /
    ``gt_ignore_mask`` so losses can mask their anchors out instead of
    training them as background (measured on synth-hard: 36% of instances
    truncate at max_gt=256 — treating those as negatives actively
    suppresses real objects; see RESULTS.md "single-stage starvation").
    The reference routes dataset ignore boxes the same way
    (``gt_bboxes_ignore`` through ``forward_train`` ->
    ``MaxIoUAssigner(ignore_iof_thr)``).
    """
    imgs = [s['img'] for s in samples]
    if pad_size is None:
        h = max(i.shape[0] for i in imgs)
        w = max(i.shape[1] for i in imgs)
    else:
        h, w = pad_size
    b = len(samples)
    # keep the samples' dtype: pipelines with a host Normalize yield f32,
    # device-normalized pipelines (strip_host_normalize) yield raw uint8 —
    # the batch then crosses to the device at 1/4 the bytes
    img_dtype = imgs[0].dtype if imgs[0].dtype == np.uint8 else np.float32
    images = np.zeros((b, h, w, 3), img_dtype)
    gt_bboxes = np.zeros((b, max_gt, 5), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_mask = np.zeros((b, max_gt), bool)
    gt_ignore = np.zeros((b, max_gt, 5), np.float32)
    gt_ignore_mask = np.zeros((b, max_gt), bool)
    metas = []
    for i, s in enumerate(samples):
        im = s['img']
        images[i, :im.shape[0], :im.shape[1]] = im
        boxes = s.get('gt_bboxes')
        if boxes is not None and len(boxes):
            labels = np.asarray(s['gt_labels'])
            if len(boxes) > max_gt:
                if not _TRUNC_WARNED[0]:
                    import warnings
                    warnings.warn(
                        f'pad_collate: {len(boxes)} gts > max_gt={max_gt}; '
                        'keeping the largest-area boxes, masking the rest '
                        'as ignore regions. Raise max_gt in the '
                        'dataset/loader config to keep all.')
                    _TRUNC_WARNED[0] = True
                area = np.asarray(boxes)[:, 2] * np.asarray(boxes)[:, 3]
                order = np.argsort(-area)
                keep, drop = order[:max_gt], order[max_gt:max_gt * 2]
                dropped = np.asarray(boxes)[drop]
                gt_ignore[i, :len(dropped)] = dropped
                gt_ignore_mask[i, :len(dropped)] = True
                boxes = np.asarray(boxes)[keep]
                labels = labels[keep]
            n = len(boxes)
            gt_bboxes[i, :n] = boxes[:n]
            gt_labels[i, :n] = labels[:n]
            gt_mask[i, :n] = True
        metas.append(s.get('img_metas', {}))
    return dict(images=images, gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                gt_mask=gt_mask, gt_ignore=gt_ignore,
                gt_ignore_mask=gt_ignore_mask, img_metas=metas)


class DataLoader:
    """Shuffling, prefetching loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, max_gt: int = 512,
                 pad_size=None, shuffle: bool = True, seed: int = 0,
                 num_workers: int = 8, prefetch: int = 4,
                 drop_last: bool = True, shard_id: int = 0,
                 num_shards: int = 1, worker_type: str = 'thread'):
        """``worker_type``:

        - ``'thread'`` (default): ThreadPoolExecutor. cv2 releases the GIL
          for decode/warp, so threads scale to the imdecode core count with
          zero pickling cost — the right choice whenever cv2 dominates.
        - ``'process'``: persistent ``multiprocessing.Pool``, the analog of
          mmcv's ``workers_per_gpu`` subprocess dataloader (reference
          ``apis/train.py`` build_dataloader). Sidesteps the GIL for
          *Python-bound* pipelines (heavy pure-numpy transforms) at the
          cost of pickling each sample back to the parent. Workers are
          started once (fork by default; ``OODTPU_MP_START=spawn`` to
          override) and hold the dataset via a pool initializer, so the
          dataset itself is never re-pickled per task. On a single-core
          host both types hit the same decode ceiling (RESULTS.md "input
          pipeline"); on multi-core hosts 'process' wins when py-bound.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.pad_size = pad_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        if worker_type not in ('thread', 'process'):
            raise ValueError(f'worker_type must be thread|process, '
                             f'got {worker_type!r}')
        self.worker_type = worker_type
        self._proc_pool = None
        self.epoch = 0

    def _process_pool(self):
        """Persistent worker pool, started on first use, reused across
        epochs (mmcv's ``persistent_workers=True`` behavior)."""
        if self._proc_pool is None:
            ctx = multiprocessing.get_context(
                os.environ.get('OODTPU_MP_START', 'fork'))
            self._proc_pool = ctx.Pool(self.num_workers,
                                       initializer=_pool_init,
                                       initargs=(self.dataset,))
        return self._proc_pool

    def close(self):
        if self._proc_pool is not None:
            self._proc_pool.terminate()
            self._proc_pool.join()
            self._proc_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # shard across hosts (replaces DistributedSampler)
        idx = idx[self.shard_id::self.num_shards]
        return idx

    def __iter__(self) -> Iterator[Dict]:
        idx = self._indices()
        nb = len(self)
        if self.worker_type == 'process':
            proc_pool = self._process_pool()
            pool = None

            def fetch(batch_idx):
                return proc_pool.map(_pool_get, list(batch_idx))
        else:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)

            def fetch(batch_idx):
                return list(pool.map(self.dataset.__getitem__, batch_idx))
        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    batch_idx = idx[b * self.batch_size:
                                    (b + 1) * self.batch_size]
                    q.put(pad_collate(fetch(batch_idx), self.max_gt,
                                      self.pad_size))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            if pool is not None:
                pool.shutdown(wait=False)
        self.epoch += 1
