"""Batched evaluation (replaces the reference's ``single_gpu_test`` /
``multi_gpu_test`` loops, ``tools/test.py:14`` + mmdet apis).

TPU design: one compiled program at a fixed batch size; images are loaded
and normalized on a thread pool while the device runs the previous batch.
Multi-host: shard the image list by ``jax.process_index()`` and allgather
the (host-side) results — the equivalent of mmdet's ``collect_results``.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .inference import DetectorBundle, _prep_image, results_to_per_class


def _default_norm(cfg):
    norm = None
    pipeline = (cfg.data.get('test') or cfg.data.get('val') or {}) \
        .get('pipeline') if hasattr(cfg, 'data') else None
    if pipeline:
        for tr in pipeline:
            if tr.get('type') in ('Normalize',):
                norm = tr
            for sub in tr.get('transforms', []):
                if sub.get('type') == 'Normalize':
                    norm = sub
    return norm or dict(mean=[123.675, 116.28, 103.53],
                        std=[58.395, 57.12, 57.375], to_rgb=True)


def batched_eval(bundle: DetectorBundle, dataset,
                 batch_size: int = 8,
                 max_images: Optional[int] = None,
                 num_workers: int = 8,
                 progress: bool = True) -> List[List[np.ndarray]]:
    """Run inference over a dataset with a fixed-shape batched program.

    Returns the reference's result format: a list (per image) of per-class
    (n, 6) numpy arrays.
    """
    import os.path as osp
    cfg = bundle.cfg
    pad = cfg.get('pad_size') or (1024, 1024)
    norm = _default_norm(cfg)
    n = len(dataset) if max_images is None else min(max_images, len(dataset))

    def load(i):
        info = dataset.data_infos[i]
        img_path = osp.join(dataset.img_prefix, info['filename'])
        img = _prep_image(img_path, norm)
        canvas = np.zeros((pad[0], pad[1], 3), np.float32)
        h = min(img.shape[0], pad[0])
        w = min(img.shape[1], pad[1])
        canvas[:h, :w] = img[:h, :w]
        return canvas

    results: List[List[np.ndarray]] = []
    pool = ThreadPoolExecutor(max_workers=num_workers)
    try:
        idx = list(range(n))
        batches = [idx[i:i + batch_size]
                   for i in range(0, len(idx), batch_size)]
        # prefetch: load batch b+1 while batch b runs on device
        pending = pool.map(load, batches[0]) if batches else None
        for b, chunk in enumerate(batches):
            imgs = np.stack(list(pending))
            if b + 1 < len(batches):
                pending = pool.map(load, batches[b + 1])
            if imgs.shape[0] < batch_size:   # pad final ragged batch
                fill = np.zeros((batch_size - imgs.shape[0], *imgs.shape[1:]),
                                np.float32)
                imgs = np.concatenate([imgs, fill], 0)
            dets, labels, valid = bundle(jnp.asarray(imgs))
            dets = np.asarray(dets)
            labels = np.asarray(labels)
            valid = np.asarray(valid)
            for j in range(len(chunk)):
                results.append(results_to_per_class(
                    dets[j], labels[j], valid[j], bundle.num_classes))
            if progress and (b + 1) % 10 == 0:
                print(f'eval {min((b + 1) * batch_size, n)}/{n}')
    finally:
        pool.shutdown(wait=False)
    return results


def eval_from_state(bundle: DetectorBundle, variables, dataset,
                    batch_size: int = 8,
                    max_images: Optional[int] = None):
    """In-training evaluation: point a persistent bundle at the live params
    and run :func:`batched_eval` + ``dataset.evaluate`` (the reference's
    per-epoch ``EvalHook``, ``apis/train.py:104-132``). Reusing one bundle
    across epochs keeps ONE compiled program for the whole run."""
    bundle.variables = variables
    results = batched_eval(bundle, dataset, batch_size=batch_size,
                           max_images=max_images, progress=False)
    if max_images is not None and len(results) < len(dataset):
        old = dataset.data_infos
        try:
            dataset.data_infos = old[:len(results)]
            return dataset.evaluate(results)
        finally:
            dataset.data_infos = old
    return dataset.evaluate(results)
