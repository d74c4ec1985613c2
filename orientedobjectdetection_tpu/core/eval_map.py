"""DOTA-style rotated mAP evaluation.

Reimplements reference ``core/evaluation/eval_map.py:12-313`` with the
rotated IoU computed by the in-house device kernel (batched over all dets of
a class at once) instead of mmcv's CPU op + a multiprocessing pool — the
host only does the cheap greedy matching.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial

from ..ops.iou import box_iou_rotated


def _next_bucket(n: int) -> int:
    """Round up to a power of two (min 16) so the device IoU kernel sees a
    handful of distinct shapes across the whole evaluation instead of one
    compile per (n_det, n_gt) pair."""
    b = 16
    while b < n:
        b *= 2
    return b


def _bucketed_iou(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    n, m = dets.shape[0], gts.shape[0]
    nb, mb = _next_bucket(n), _next_bucket(m)
    dp = np.zeros((nb, 5), np.float32)
    gp = np.zeros((mb, 5), np.float32)
    dp[:n] = dets
    gp[:m] = gts
    ious = np.asarray(_iou_jit(jnp.asarray(dp), jnp.asarray(gp)))
    return ious[:n, :m]


@partial(jax.jit)
def _iou_jit(a, b):
    return box_iou_rotated(a, b)


def tpfp_default(det_bboxes: np.ndarray, gt_bboxes: np.ndarray,
                 gt_bboxes_ignore: Optional[np.ndarray] = None,
                 iou_thr: float = 0.5):
    """Greedy TP/FP marking for one image/class.

    Matching semantics follow the reference exactly
    (``eval_map.py:12-94``): each det (descending score) matches its argmax
    gt; a det whose argmax gt is an ignore-gt counts as neither tp nor fp.
    Returns (tp, fp) float arrays of shape (num_dets,).
    """
    det_bboxes = np.asarray(det_bboxes, np.float32).reshape(-1, 6)
    gt_bboxes = np.asarray(gt_bboxes, np.float32).reshape(-1, 5)
    if gt_bboxes_ignore is None:
        gt_bboxes_ignore = np.zeros((0, 5), np.float32)
    gt_bboxes_ignore = np.asarray(gt_bboxes_ignore, np.float32).reshape(-1, 5)

    gt_ignore_inds = np.concatenate([
        np.zeros(gt_bboxes.shape[0], bool),
        np.ones(gt_bboxes_ignore.shape[0], bool)])
    all_gts = np.vstack([gt_bboxes, gt_bboxes_ignore])

    num_dets = det_bboxes.shape[0]
    tp = np.zeros(num_dets, np.float32)
    fp = np.zeros(num_dets, np.float32)
    if all_gts.shape[0] == 0:
        fp[:] = 1
        return tp, fp
    if num_dets == 0:
        return tp, fp

    ious = _bucketed_iou(det_bboxes[:, :5], all_gts)
    ious_max = ious.max(axis=1)
    ious_argmax = ious.argmax(axis=1)
    sort_inds = np.argsort(-det_bboxes[:, -1])
    gt_covered = np.zeros(all_gts.shape[0], bool)
    for i in sort_inds:
        if ious_max[i] >= iou_thr:
            matched = ious_argmax[i]
            if not gt_ignore_inds[matched]:
                if not gt_covered[matched]:
                    gt_covered[matched] = True
                    tp[i] = 1
                else:
                    fp[i] = 1
            # else: ignored gt -> neither tp nor fp
        else:
            fp[i] = 1
    return tp, fp


def average_precision(recalls: np.ndarray, precisions: np.ndarray,
                      mode: str = '11points') -> float:
    """VOC AP (11-point interpolation by default, like the reference's
    use_07_metric=True path, ``eval_map.py:215-216``)."""
    if mode == '11points':
        ap = 0.0
        for thr in np.arange(0, 1.01, 0.1):
            prec = precisions[recalls >= thr]
            ap += (prec.max() if prec.size else 0.0) / 11
        return float(ap)
    # 'area': precision envelope integral
    mrec = np.concatenate([[0.0], recalls, [1.0]])
    mpre = np.concatenate([[0.0], precisions, [0.0]])
    for i in range(mpre.size - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def eval_rbbox_map(det_results: List[List[np.ndarray]],
                   annotations: List[Dict],
                   iou_thr: float = 0.5,
                   use_07_metric: bool = True,
                   dataset: Optional[Sequence[str]] = None,
                   logger=None,
                   nproc: int = 4) -> Tuple[float, List[Dict]]:
    """DOTA VOC-style rotated mAP (reference ``eval_map.py:126-246``).

    Args:
        det_results: per image, per class (n_i, 6) arrays [cx,cy,w,h,a,score].
        annotations: per image dict with 'bboxes' (n, 5), 'labels' (n,),
            optional 'bboxes_ignore'/'labels_ignore'.
    Returns (mean_ap, per-class eval dicts).
    """
    num_imgs = len(det_results)
    num_classes = len(det_results[0])
    mode = '11points' if use_07_metric else 'area'

    eval_results = []
    for cls in range(num_classes):
        cls_dets, cls_gts, cls_gts_ig = [], [], []
        for res, ann in zip(det_results, annotations):
            cls_dets.append(np.asarray(res[cls], np.float32).reshape(-1, 6))
            m = np.asarray(ann['labels']).reshape(-1) == cls
            cls_gts.append(np.asarray(ann['bboxes'],
                                      np.float32).reshape(-1, 5)[m])
            if ann.get('labels_ignore') is not None:
                mi = np.asarray(ann['labels_ignore']).reshape(-1) == cls
                cls_gts_ig.append(np.asarray(
                    ann['bboxes_ignore'], np.float32).reshape(-1, 5)[mi])
            else:
                cls_gts_ig.append(np.zeros((0, 5), np.float32))

        tpfp = [tpfp_default(d, g, gi, iou_thr)
                for d, g, gi in zip(cls_dets, cls_gts, cls_gts_ig)]
        tp = np.concatenate([t for t, _ in tpfp])
        fp = np.concatenate([f for _, f in tpfp])
        all_scores = np.concatenate([d[:, -1] for d in cls_dets])
        num_gts = sum(g.shape[0] for g in cls_gts)

        order = np.argsort(-all_scores)
        tp_cum = np.cumsum(tp[order])
        fp_cum = np.cumsum(fp[order])
        eps = np.finfo(np.float32).eps
        recalls = tp_cum / max(num_gts, eps)
        precisions = tp_cum / np.maximum(tp_cum + fp_cum, eps)
        ap = average_precision(recalls, precisions, mode) if num_gts > 0 \
            else 0.0
        eval_results.append(dict(
            num_gts=num_gts, num_dets=int(tp.shape[0]),
            recall=float(recalls[-1]) if recalls.size else 0.0,
            precision=float(precisions[-1]) if precisions.size else 0.0,
            ap=ap))

    aps = [r['ap'] for r in eval_results if r['num_gts'] > 0]
    mean_ap = float(np.mean(aps)) if aps else 0.0
    print_map_summary(mean_ap, eval_results, dataset, logger=logger)
    return mean_ap, eval_results


def print_map_summary(mean_ap, results, dataset=None, logger=None):
    """ASCII per-class table (reference ``eval_map.py:249-313``)."""
    if logger == 'silent':
        return
    names = dataset if dataset is not None else [
        f'class_{i}' for i in range(len(results))]
    header = f'{"class":>20} {"gts":>7} {"dets":>8} {"recall":>7} {"ap":>7}'
    lines = [header, '-' * len(header)]
    for name, r in zip(names, results):
        lines.append(f'{name:>20} {r["num_gts"]:>7d} {r["num_dets"]:>8d} '
                     f'{r["recall"]:>7.3f} {r["ap"]:>7.3f}')
    lines.append('-' * len(header))
    lines.append(f'{"mAP":>20} {"":>7} {"":>8} {"":>7} {mean_ap:>7.3f}')
    msg = '\n'.join(lines)
    if logger is None:
        print(msg)
    else:
        logger.info(msg)
