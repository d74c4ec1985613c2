"""Rotated and axis-aligned NMS — static-shape, on-device.

Replaces ``mmcv.ops.nms_rotated`` / ``nms`` / ``batched_nms`` (reference use
sites: ``core/post_processing/bbox_nms_rotated.py:3``,
``core/patch/merge_results.py:4``, ``datasets/dota.py:16``,
``dense_heads/{oriented,rotated}_rpn_head.py:6-7``).

TPU design: no dynamic filtering. Candidates are fixed-size, padded, and
masked (padding has score ``-inf``); NMS returns a keep *mask* plus
score-sorted fixed-size detections. The greedy suppression is exact (same
result order as the CUDA kernel): boxes are visited in descending-score
order and each surviving box suppresses later overlapping boxes. Pairwise
IoU is computed in row blocks to bound memory.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .iou import box_iou_rotated
from .iou_pallas import nms_pair_mask_pallas, pallas_available
from .sort import argsort_desc, topk_unsorted

NEG_INF = -1e10

# Exact-set radix top-k (ops.sort.topk_unsorted) for candidate
# pre-selection on TPU: same selected SET as lax.top_k, no sort network.
# Candidate-list consumers are order-insensitive (NMS re-sorts), so this
# is a pure perf substitution above the size where it wins. Default off
# until measured on the chip (flip after the TPU tier validates it).
RADIX_TOPK = False
_RADIX_MIN_N = 16384


def topk_candidates(scores, k: int, exact: bool = True):
    """Top-k for candidate PRE-selection (nms_pre / max_candidates caps).

    Exact ``jax.lax.top_k`` by DEFAULT — the reference's candidate
    selection is exact (``rotated_anchor_head.py:514-690``), and
    ``approx_max_k(recall_target=0.95)`` silently drops up to ~5% of true
    top candidates on TPU. Pass ``exact=False`` (plumbed from the
    ``test_cfg`` key ``approx_topk=True``) to opt into the hardware-native
    aggregated top-k (6x faster than exact top_k at 129k -> 2000 on v5e)
    where the selection feeds an order-insensitive consumer (NMS re-sorts
    by score) and the recall loss has been judged acceptable. Measured
    accuracy/speed deltas: RESULTS.md "approx top-k"."""
    if (not exact and k < scores.shape[-1]
            and jnp.issubdtype(scores.dtype, jnp.floating)
            and pallas_available()):
        return jax.lax.approx_max_k(scores, k, recall_target=0.95)
    if (RADIX_TOPK and scores.ndim == 1 and k < scores.shape[0]
            and scores.shape[0] >= _RADIX_MIN_N
            and scores.dtype == jnp.float32
            and pallas_available()):
        # exact SET, ascending-index order (candidate consumers re-sort)
        return topk_unsorted(scores, k)
    return jax.lax.top_k(scores, k)

# Candidate count above which the compiled Pallas tile kernel beats the jnp
# rotated-IoU path on TPU (measured v5e: N=512 1.2x, N=2048 7.2x).
_PALLAS_MIN_N = 256


def hbb_overlaps(boxes1, boxes2):
    """Axis-aligned IoU matrix for (N, 4) x (M, 4) xyxy boxes."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = jnp.maximum(boxes1[:, 2] - boxes1[:, 0], 0) * \
        jnp.maximum(boxes1[:, 3] - boxes1[:, 1], 0)
    a2 = jnp.maximum(boxes2[:, 2] - boxes2[:, 0], 0) * \
        jnp.maximum(boxes2[:, 3] - boxes2[:, 1], 0)
    return inter / jnp.maximum(a1[:, None] + a2[None, :] - inter, 1e-6)


def _blocked_pair_mask(boxes, iou_fn, iou_thr, block: int = 256):
    """Boolean (N, N) matrix: pair IoU > thr, computed in row blocks.

    Blocking keeps the 24-candidate intermediate tensors of the rotated-IoU
    kernel at (block, N, 24, 2) instead of (N, N, 24, 2), bounding VMEM/HBM
    pressure; XLA fuses each block's computation.
    """
    n = boxes.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    rows = boxes_p.reshape(nb, block, boxes.shape[-1])

    def one_block(row_boxes):
        return iou_fn(row_boxes, boxes) > iou_thr

    mask = jax.lax.map(one_block, rows)           # (nb, block, N)
    return mask.reshape(nb * block, n)[:n]


def _upper_pair_mask(boxes, iou_fn, iou_thr, block=None, class_ids=None):
    """Boolean (N, N) matrix: pair IoU > thr for i < j ONLY (strict upper
    triangle; lower triangle and diagonal are False).

    Greedy suppression only consumes i-suppresses-j>i pairs, so block rows
    skip every all-lower-triangle column block: row block r computes IoU
    against columns [r*block, N) instead of [0, N). For N = 8 blocks this
    drops the pairwise rotated-IoU work ~45% (the dominant NMS cost on TPU).
    Each row block is a separate statically-shaped fused kernel (unrolled
    python loop — nb kernels, bounded by nb <= N/block).
    """
    n = boxes.shape[0]
    if (iou_fn is box_iou_rotated and n >= _PALLAS_MIN_N
            and pallas_available()):
        # Compiled Mosaic tile kernel with threshold + strict-upper-triangle
        # folded in; tiles strictly below the diagonal skip the clip math
        # (~2x fewer pair evaluations than the full matrix; the jnp path is
        # ~10x slower again at N = 2048 on v5e, honest device timing).
        # Works under vmap (batch becomes an extra grid dimension).
        return nms_pair_mask_pallas(boxes, iou_thr, class_ids=class_ids)
    if block is None:
        # measured on v5e (N=2000, R50 e2e bench, post-sincos-hoist):
        # block 16 -> 135.8 imgs/s, 64 -> 84.9, 256 -> 71. Small row blocks
        # keep the rotated-IoU intermediates VMEM-resident inside the fused
        # e2e program (model weights + activations already occupy HBM);
        # large blocks only win on an otherwise-empty device (103 Mboxes/s
        # standalone at 256), which is not the production condition.
        block = 16 if n >= 1024 else 64
    nb = -(-n // block)
    pad = nb * block - n
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    rows = []
    for r in range(nb):
        row_boxes = boxes_p[r * block:(r + 1) * block]
        col_boxes = boxes_p[r * block:]
        m = iou_fn(row_boxes, col_boxes) > iou_thr
        rows.append(jnp.pad(m, ((0, 0), (r * block, 0))))
    mask = jnp.concatenate(rows, 0)[:n, :n]
    if class_ids is not None:
        # Same intra-class pruning the Pallas kernel folds into its tile
        # skip: cross-class pairs never suppress (the class-offset trick
        # guarantees they cannot overlap anyway, but keeping the masks
        # identical means the jnp fallback and the TPU kernel execute the
        # same suppression logic, not merely logic with the same outcome).
        mask = mask & (class_ids[:, None] == class_ids[None, :])
    idx = jnp.arange(n)
    return mask & (idx[:, None] < idx[None, :])


def _greedy_suppress(over_thr):
    """Exact greedy NMS given a (N, N) over-threshold matrix for boxes
    already sorted by descending score. Returns keep mask (N,).

    TPU formulation: the greedy result is the UNIQUE fixpoint of
        keep[j] = not exists i < j : keep[i] and over[i, j]
    (induction over j). Instead of N sequential steps (a 2000-iteration
    ``fori_loop`` costs ~40 ms), iterate the whole-vector update — one
    masked (N, N) reduction per round on the VPU — until it stops changing.
    Convergence is guaranteed (each round fixes at least the first
    not-yet-stable prefix index); typical suppression chains converge in
    <10 rounds, worst case N.

    ``over_thr`` must be strict-upper-triangular (both
    :func:`_upper_pair_mask` paths guarantee it); re-masking the triangle
    here would cost a full (N, N) read-modify-write per call.
    """
    n = over_thr.shape[0]
    lower = over_thr                                   # i suppresses j>i

    def cond(state):
        keep, prev_keep, it = state
        return (it < n) & jnp.any(keep != prev_keep)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(lower & keep[:, None], axis=0)
        return ~suppressed, keep, it + 1

    init = jnp.ones((n,), bool)
    keep, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.zeros((n,), bool), jnp.zeros((), jnp.int32)))
    return keep


def nms_rotated(boxes, scores, iou_threshold: float,
                valid_mask=None, block=None, class_ids=None):
    """Rotated NMS over padded candidates.

    Args:
        boxes: (N, 5) rotated boxes (may include padding).
        scores: (N,) scores; padding should carry ``-inf`` (or pass
            ``valid_mask``).
        iou_threshold: suppression threshold.
        valid_mask: optional (N,) bool marking real candidates.
        class_ids: optional (N,) int32. Suppression becomes intra-class:
            cross-class pairs never suppress (identical per-pair masking on
            the jnp and Pallas paths). The greedy pass visits candidates
            class-major (same keep set, since suppression is intra-class)
            and the Pallas kernel additionally prunes whole cross-class
            tiles. With the multiclass class-offset layout the per-pair
            mask is a no-op and the pruning is a pure perf win. Padded
            entries should carry a class larger than any real one.

    Returns:
        keep: (N,) bool — survivors, in the *original* index order.
        order: (N,) int32 — indices sorted by descending score (apply
            ``keep[order]`` for the score-ranked survivor list, matching
            the CUDA kernel's sorted output); class-major when
            ``class_ids`` is given.
    """
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    # O(N^2) comparison rank instead of XLA's bitonic sort: the sort was
    # the single largest NMS cost on TPU (4.6 ms vs ~5 ms for the whole
    # pairwise-IoU kernel at 8x2000). Exact same ordering (stable,
    # descending score, class-major when class_ids is given).
    order, rank = argsort_desc(scores, class_ids)
    sorted_cls = None if class_ids is None else class_ids[order]
    sorted_boxes = boxes[order]
    over = _upper_pair_mask(sorted_boxes, box_iou_rotated, iou_threshold,
                            block, class_ids=sorted_cls)
    keep_sorted = _greedy_suppress(over)
    if valid_mask is not None:
        keep_sorted = keep_sorted & (scores[order] > NEG_INF / 2)
    keep = keep_sorted[rank]            # unscramble: gather, not scatter
    return keep, order


def nms_hbb(boxes, scores, iou_threshold: float, valid_mask=None,
            block: int = 512):
    """Axis-aligned NMS with the same static-shape contract as
    :func:`nms_rotated` (for the RPN paths).

    Uses the same block-triangular pair mask as the rotated path — the RPN
    runs this at 4096 candidates/img, so skipping the lower triangle halves
    the pairwise-IoU work (HBB IoU is cheap per element; coarse 512-row
    blocks keep compile time flat)."""
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, NEG_INF)
    order, rank = argsort_desc(scores)
    sorted_boxes = boxes[order]
    over = _upper_pair_mask(sorted_boxes, hbb_overlaps, iou_threshold,
                            block=min(block, boxes.shape[0]))
    keep_sorted = _greedy_suppress(over)
    if valid_mask is not None:
        keep_sorted = keep_sorted & (scores[order] > NEG_INF / 2)
    keep = keep_sorted[rank]
    return keep, order


def multiclass_nms_rotated(multi_bboxes,
                           multi_scores,
                           score_thr: float,
                           iou_thr: float,
                           max_per_img: int,
                           score_factors=None,
                           max_candidates: int = 2000,
                           exact_topk: bool = True):
    """Multi-class rotated NMS via the class-offset trick.

    Static-shape rework of reference
    ``core/post_processing/bbox_nms_rotated.py:6-92``: all (box, class)
    pairs become one candidate list; low-score candidates are masked rather
    than filtered; boxes are shifted per class by ``label * (max_coord + 1)``
    so a single rotated NMS handles all classes; finally the top
    ``max_per_img`` survivors are emitted as fixed-size padded outputs.

    Args:
        multi_bboxes: (N, 5) or (N, C*5).
        multi_scores: (N, C + 1); last column is background (ignored).
        score_factors: optional (N,) multiplier (e.g. centerness).

    Returns:
        dets: (max_per_img, 6) [cx, cy, w, h, a, score], padded with zeros.
        labels: (max_per_img,) int32, padding = -1.
        valid: (max_per_img,) bool.
    """
    num_classes = multi_scores.shape[1] - 1
    n = multi_scores.shape[0]
    if multi_bboxes.shape[-1] > 5:
        bboxes = multi_bboxes.reshape(n, num_classes, 5)
    else:
        bboxes = jnp.broadcast_to(multi_bboxes[:, None, :],
                                  (n, num_classes, 5))
    scores = multi_scores[:, :-1]
    if score_factors is not None:
        scores = scores * score_factors[:, None]

    labels = jnp.broadcast_to(jnp.arange(num_classes)[None], (n, num_classes))
    bboxes = bboxes.reshape(-1, 5)
    scores = scores.reshape(-1)
    labels = labels.reshape(-1)

    valid = scores > score_thr
    scores = jnp.where(valid, scores, NEG_INF)

    # Cap the NMS problem size: keep top max_candidates by score.
    k = min(max_candidates, scores.shape[0])
    top_scores, top_idx = topk_candidates(scores, k, exact=exact_topk)
    top_boxes = bboxes[top_idx]
    top_labels = labels[top_idx]
    top_valid = top_scores > NEG_INF / 2

    # Class-offset trick (reference bbox_nms_rotated.py:67-80): shift centers
    # so different classes can never overlap.
    safe_boxes = jnp.where(top_valid[:, None], top_boxes,
                           jnp.zeros_like(top_boxes))
    max_coordinate = jnp.max(jnp.where(top_valid, safe_boxes[:, :2].max(-1) +
                                       safe_boxes[:, 2:4].max(-1), 0.0))
    offsets = top_labels.astype(safe_boxes.dtype) * (max_coordinate + 1)
    boxes_for_nms = safe_boxes.at[:, :2].add(offsets[:, None])

    # padded candidates sort behind every real class so the kernel's
    # class-range skip prunes their tiles too
    nms_cls = jnp.where(top_valid, top_labels, num_classes)
    keep, _ = nms_rotated(boxes_for_nms, top_scores, iou_thr,
                          valid_mask=top_valid, class_ids=nms_cls)
    kept_scores = jnp.where(keep & top_valid, top_scores, NEG_INF)

    if kept_scores.shape[0] < max_per_img:
        pad = max_per_img - kept_scores.shape[0]
        kept_scores = jnp.pad(kept_scores, (0, pad),
                              constant_values=NEG_INF)
        top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
        top_labels = jnp.pad(top_labels, (0, pad))
    # exact top-k by comparison rank (max_per_img is within ~2x of N here,
    # so top_k degenerates to a full bitonic sort — the rank path is ~10x
    # cheaper at these shapes and keeps the same stable ordering)
    out_idx = argsort_desc(kept_scores)[0][:max_per_img]
    out_scores = kept_scores[out_idx]
    out_valid = out_scores > NEG_INF / 2
    out_boxes = jnp.where(out_valid[:, None], top_boxes[out_idx], 0.0)
    out_scores_clean = jnp.where(out_valid, out_scores, 0.0)
    dets = jnp.concatenate([out_boxes, out_scores_clean[:, None]], axis=-1)
    out_labels = jnp.where(out_valid, top_labels[out_idx], -1)
    return dets, out_labels, out_valid


def _nms_bucket(n: int) -> int:
    """Round a host-side candidate count up to a power of two (min 32) so
    repeated NMS calls with ragged N reuse a handful of compiled programs
    (same trick as ``core/eval_map._next_bucket``; a DOTA submission merge
    calls NMS thousands of times with distinct per-class counts)."""
    b = 32
    while b < n:
        b *= 2
    return b


@partial(jax.jit, static_argnames=('iou_threshold',))
def _nms_rotated_masked(boxes, scores, iou_threshold, valid_mask):
    return nms_rotated(boxes, scores, iou_threshold, valid_mask=valid_mask)


def nms_rotated_np(boxes, scores, iou_thr: float):
    """Host-convenience rotated NMS over numpy arrays with shape bucketing.

    Args:
        boxes: (N, 5) numpy; scores: (N,) numpy.
    Returns:
        keep: (K,) numpy int indices of survivors, descending-score order.
    """
    import numpy as np
    boxes = np.asarray(boxes, np.float32).reshape(-1, 5)
    scores = np.asarray(scores, np.float32).reshape(-1)
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    # native C++ greedy NMS (orientedobjectdetection_tpu/native): no padded
    # O(N^2) pair matrix, no device transfer, early-exits on suppressed
    # rows — the host analog of mmcv's native nms_rotated. Falls back to
    # the bucketed device kernel when no compiler is available.
    from .. import native
    if native.available():
        return native.nms_rotated(boxes, scores, float(iou_thr))
    nb = _nms_bucket(n)
    bp = np.zeros((nb, 5), np.float32)
    sp = np.full((nb,), NEG_INF, np.float32)
    bp[:n] = boxes
    sp[:n] = scores
    valid = np.zeros((nb,), bool)
    valid[:n] = True
    keep, order = _nms_rotated_masked(jnp.asarray(bp), jnp.asarray(sp),
                                      float(iou_thr), jnp.asarray(valid))
    keep = np.asarray(keep)
    order = np.asarray(order)
    kept_sorted = order[keep[order]]
    return kept_sorted[kept_sorted < n]


def batched_nms_hbb(boxes, scores, labels, iou_thr: float, valid_mask=None):
    """Class-offset axis-aligned batched NMS (RPN proposals are class-
    agnostic in practice: pass labels=zeros)."""
    if valid_mask is None:
        valid_mask = jnp.ones_like(scores, bool)
    safe_boxes = jnp.where(valid_mask[:, None], boxes, 0.0)
    max_coordinate = jnp.max(safe_boxes)
    offsets = labels.astype(boxes.dtype) * (max_coordinate + 1)
    shifted = safe_boxes + offsets[:, None]
    return nms_hbb(shifted, scores, iou_thr, valid_mask=valid_mask)


def aug_multiclass_nms_rotated(merged_bboxes, merged_labels, num_classes,
                               iou_thr: float = 0.1,
                               max_per_img: int = 2000):
    """Merge TTA detections with per-class rotated NMS (reference
    ``core/post_processing/bbox_nms_rotated.py:95-144``).

    merged_bboxes: (N, 6) [cx,cy,w,h,a,score] already mapped back to the
    original frame; merged_labels: (N,).  Returns (dets (M,6), labels (M,))
    numpy arrays, score-sorted.
    """
    import numpy as np
    merged_bboxes = np.asarray(merged_bboxes, np.float32).reshape(-1, 6)
    merged_labels = np.asarray(merged_labels)
    out_d, out_l = [], []
    for c in range(num_classes):
        sel = merged_bboxes[merged_labels == c]
        if not len(sel):
            continue
        kept = nms_rotated_np(sel[:, :5], sel[:, 5], iou_thr)
        out_d.append(sel[kept])
        out_l.append(np.full(len(kept), c, np.int64))
    if not out_d:
        return (np.zeros((0, 6), np.float32), np.zeros((0,), np.int64))
    dets = np.concatenate(out_d)
    labels = np.concatenate(out_l)
    rank = np.argsort(-dets[:, 5])[:max_per_img]
    return dets[rank], labels[rank]
