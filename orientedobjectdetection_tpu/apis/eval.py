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
                 progress: bool = True,
                 collect_dir: Optional[str] = None) -> List[List[np.ndarray]]:
    """Run inference over a dataset with a fixed-shape batched program.

    Multi-process (`jax.process_count() > 1`): each process evaluates an
    interleaved slice of the dataset and partial results are gathered
    through ``collect_dir`` (a shared filesystem path, default
    ``<tempdir>/oodtpu_eval``) — the equivalent of mmdet's
    ``multi_gpu_test`` + ``collect_results_cpu`` (reference
    ``tools/test.py:14``). Every process returns the full result list.

    Returns the reference's result format: a list (per image) of per-class
    (n, 6) numpy arrays.
    """
    import os.path as osp
    cfg = bundle.cfg
    pad = cfg.get('pad_size') or (1024, 1024)
    # device-normalizing bundle: feed raw uint8 canvases (1/4 the H2D
    # bytes, no host normalize pass — the 1-core host is the bottleneck)
    norm = None if bundle.device_norm is not None else _default_norm(cfg)
    n = len(dataset) if max_images is None else min(max_images, len(dataset))

    n_proc = jax.process_count()
    if n_proc > 1:
        my = [i for i in range(n) if i % n_proc == jax.process_index()]
        part = _eval_indices(bundle, dataset, my, batch_size, num_workers,
                             pad, norm, progress)
        return _collect_results(part, my, n, collect_dir)
    return _eval_indices(bundle, dataset, list(range(n)), batch_size,
                         num_workers, pad, norm, progress)


def _eval_indices(bundle, dataset, idx, batch_size, num_workers, pad, norm,
                  progress):
    import os.path as osp
    n = len(idx)

    def load(i):
        info = dataset.data_infos[i]
        img_path = osp.join(dataset.img_prefix, info['filename'])
        img = _prep_image(img_path, norm)
        canvas = np.zeros((pad[0], pad[1], 3),
                          np.uint8 if norm is None else np.float32)
        h = min(img.shape[0], pad[0])
        w = min(img.shape[1], pad[1])
        canvas[:h, :w] = img[:h, :w]
        return canvas

    results: List[List[np.ndarray]] = []
    pool = ThreadPoolExecutor(max_workers=num_workers)
    try:
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
                                imgs.dtype)
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


# Monotonic per-process gather round; part of the collect dir name so
# repeated calls (per-epoch eval) never reuse a directory and a fast
# process can't clobber round k's parts while a slow one still reads them.
_GATHER_ROUND = [0]


def _collect_results(part, my_indices, total, collect_dir=None):
    """File-based cross-process gather (mmdet ``collect_results_cpu``):
    each process pickles its partial list to a shared dir; everyone loads
    all parts and re-interleaves. Barriers (tiny device allgathers) keep
    readers behind writers and writers of round k+1 behind readers of
    round k; part files are deleted by rank 0 afterwards."""
    import os
    import pickle
    if collect_dir is None:
        if jax.process_count() > 1:
            # tempdir is per-host on multi-host pods; a silent default
            # would gather stale/missing parts. Force an explicit path.
            raise ValueError(
                'multi-process eval needs collect_dir on a SHARED '
                'filesystem (tempdir is per-host); pass collect_dir= or '
                'tools/test.py --collect-dir')
        import tempfile
        collect_dir = os.path.join(tempfile.gettempdir(), 'oodtpu_eval')
    round_dir = os.path.join(collect_dir, f'round_{_GATHER_ROUND[0]}')
    _GATHER_ROUND[0] += 1
    os.makedirs(round_dir, exist_ok=True)
    rank = jax.process_index()
    part_path = os.path.join(round_dir, f'part_{rank}.pkl')
    tmp_path = part_path + '.tmp'
    with open(tmp_path, 'wb') as f:
        pickle.dump((my_indices, part), f)
    os.replace(tmp_path, part_path)   # atomic: readers never see partials
    # device-backed barrier: all writers done before anyone reads
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(f'oodtpu_eval_write_{round_dir}')
    merged: List = [None] * total
    for r in range(jax.process_count()):
        with open(os.path.join(round_dir, f'part_{r}.pkl'), 'rb') as f:
            indices, res = pickle.load(f)
        for i, item in zip(indices, res):
            merged[i] = item
    # all readers done before rank 0 deletes the round dir
    multihost_utils.sync_global_devices(f'oodtpu_eval_read_{round_dir}')
    if rank == 0:
        import shutil
        shutil.rmtree(round_dir, ignore_errors=True)
    return merged


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
