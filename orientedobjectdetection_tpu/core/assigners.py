"""Label assignment — fully vectorized, padded, inside-jit.

The reference assigns per image with dynamic shapes (mmdet ``MaxIoUAssigner``
via ``dense_heads/rotated_anchor_head.py:231-239``; ``ATSSObbAssigner``;
jy's ``OBBLabelAssigner`` ``assigners/obb_label_assigner.py:20-252``). Here
every assigner consumes a *padded* gt set (``gt_bboxes (G, 5)``,
``gt_labels (G,)``, ``gt_mask (G,)``) and emits per-prior results with no
data-dependent shapes, so assignment runs inside the jitted train step on
TPU (the reference wraps assignment in ``@torch.no_grad``; we simply use
``jax.lax.stop_gradient`` on inputs).

Output convention (AssignResult):
    assigned_gt_inds: (N,) int32 — index into the gt axis, -1 = negative,
        -2 = ignore (between thresholds).
    labels: (N,) int32 — class label of the assigned gt, -1 for non-positive.
    max_overlaps: (N,) float32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.boxes import obb2hbb
from ..ops.gather import take_rows
from ..ops.iou import rbbox_overlaps
from ..utils.registry import BBOX_ASSIGNERS

NEG = -1
IGNORE = -2


def _nan_mean_std_unbiased(x, axis=0):
    """Mean and UNBIASED std over non-NaN entries (matches ``torch.std(0)``
    with its N-1 denominator, used by the reference ATSS assigners'
    candidate-IoU statistics — ``atss_obb_assigner.py`` et al.)."""
    cnt = jnp.sum(~jnp.isnan(x), axis=axis).astype(jnp.float32)
    mean = jnp.nanmean(x, axis=axis)
    var = jnp.nanmean((x - jnp.expand_dims(mean, axis)) ** 2, axis=axis)
    var = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
    return mean, jnp.sqrt(var)


def random_sample_masks(pos, neg, num: int, pos_fraction: float,
                        rng: jax.Array, neg_pos_ub: int = -1):
    """Mask-based random pos/neg sampling (mmdet ``RandomSampler``
    semantics, static shapes): keep at most ``num * pos_fraction`` positives
    uniformly at random, then fill with random negatives up to ``num``
    (optionally capping negatives at ``neg_pos_ub * num_pos``).

    Returns (pos_keep, neg_keep) boolean masks over the prior axis.
    """
    num_pos_max = int(num * pos_fraction)
    k1, k2 = jax.random.split(rng)
    pos_scores = jnp.where(pos, jax.random.uniform(k1, pos.shape), -1.0)
    pos_rank = jnp.argsort(jnp.argsort(-pos_scores))
    pos_keep = pos & (pos_rank < num_pos_max)

    num_pos = jnp.minimum(pos.sum(), num_pos_max)
    num_neg_target = num - num_pos
    if neg_pos_ub >= 0:
        num_neg_target = jnp.minimum(num_neg_target,
                                     neg_pos_ub * jnp.maximum(num_pos, 1))
    neg_scores = jnp.where(neg, jax.random.uniform(k2, neg.shape), -1.0)
    neg_rank = jnp.argsort(jnp.argsort(-neg_scores))
    neg_keep = neg & (neg_rank < num_neg_target)
    return pos_keep, neg_keep


def rng_from_gt(gt_bboxes) -> jax.Array:
    """Derive a deterministic per-image PRNG key from the gt content.

    Loss paths that need sampling randomness but aren't threaded an rng
    (single-stage/RPN losses) fold the gt coordinates into a key: distinct
    images — and the same image under different augmentations — sample
    different anchor subsets, while the whole train step stays a pure
    function of its inputs.
    """
    folded = jnp.sum(gt_bboxes.astype(jnp.float32) * 997.0)
    seed = jnp.mod(jnp.abs(folded), 2.0 ** 31).astype(jnp.uint32)
    return jax.random.fold_in(jax.random.PRNGKey(0), seed)


class AssignResult(NamedTuple):
    assigned_gt_inds: jnp.ndarray   # (N,) int32; >=0 gt index, -1 neg, -2 ignore
    max_overlaps: jnp.ndarray       # (N,) float32
    labels: jnp.ndarray             # (N,) int32; -1 if not positive


@BBOX_ASSIGNERS.register_module()
class MaxIoUAssigner:
    """Max-IoU assignment with mmdet tie-breaking semantics.

    Matches mmdet's ``MaxIoUAssigner`` as used by
    ``rotated_anchor_head.py:231-239``:

    1. every prior starts negative if its max IoU < neg_iou_thr
       (or ignore if within the (neg, pos) band),
    2. priors with max IoU >= pos_iou_thr are positive to their argmax gt,
    3. (``match_low_quality``) each gt claims *all* priors whose IoU to it
       equals the gt's max IoU, if that max >= min_pos_iou — applied in gt
       order so later gts overwrite earlier ones (reference semantics).

    ``assign_by_circumhbbox``: optionally assign on the gts' circumscribed
    horizontal boxes (``rotated_anchor_head.py`` option; version string).
    """

    def __init__(self,
                 pos_iou_thr: float,
                 neg_iou_thr,
                 min_pos_iou: float = 0.0,
                 gt_max_assign_all: bool = True,
                 ignore_iof_thr: float = -1,
                 match_low_quality: bool = True,
                 assign_by_circumhbbox: Optional[str] = None,
                 iou_calculator: Optional[dict] = None):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.ignore_iof_thr = ignore_iof_thr
        self.match_low_quality = match_low_quality
        self.assign_by_circumhbbox = assign_by_circumhbbox

    def __call__(self, priors, gt_bboxes, gt_labels, gt_mask,
                 gt_bboxes_ignore=None, gt_ignore_mask=None) -> AssignResult:
        """priors (N, 5); gt_bboxes (G, 5); gt_labels (G,); gt_mask (G,)."""
        priors = jax.lax.stop_gradient(priors)
        gt_bboxes = jax.lax.stop_gradient(gt_bboxes)

        if self.assign_by_circumhbbox is not None:
            gt_for_iou = obb2hbb(gt_bboxes, self.assign_by_circumhbbox)
        else:
            gt_for_iou = gt_bboxes

        overlaps = rbbox_overlaps(gt_for_iou, priors)      # (G, N)
        # Padded gts contribute 0 overlap — with no valid gt every prior has
        # max_overlap 0 and becomes a negative (mmdet's empty-gt semantics).
        overlaps = jnp.where(gt_mask[:, None], overlaps, 0.0)

        max_overlaps = overlaps.max(axis=0)                 # (N,)
        argmax_overlaps = overlaps.argmax(axis=0)

        if isinstance(self.neg_iou_thr, (tuple, list)):
            lo, hi = self.neg_iou_thr
            is_neg = (max_overlaps >= lo) & (max_overlaps < hi)
        else:
            is_neg = max_overlaps < self.neg_iou_thr
        is_pos = max_overlaps >= self.pos_iou_thr

        assigned = jnp.full(priors.shape[:1], IGNORE, jnp.int32)
        assigned = jnp.where(is_neg, NEG, assigned)
        assigned = jnp.where(is_pos, argmax_overlaps.astype(jnp.int32),
                             assigned)

        if self.match_low_quality:
            # For each gt, its best prior(s) become positive to it. Applied
            # in ascending gt order with overwrite (reference semantics).
            gt_max = overlaps.max(axis=1)                    # (G,)
            if self.gt_max_assign_all:
                claim = (overlaps == gt_max[:, None]) & \
                        (gt_max[:, None] >= self.min_pos_iou) & \
                        gt_mask[:, None]                     # (G, N)
            else:
                best = overlaps.argmax(axis=1)
                claim = jnp.zeros_like(overlaps, bool)
                claim = claim.at[jnp.arange(overlaps.shape[0]), best].set(
                    (gt_max >= self.min_pos_iou) & gt_mask)
            # last gt to claim a prior wins -> use the highest claiming index
            gt_idx = jnp.arange(overlaps.shape[0])[:, None]
            claimed_idx = jnp.where(claim, gt_idx, -1).max(axis=0)   # (N,)
            assigned = jnp.where(claimed_idx >= 0,
                                 claimed_idx.astype(jnp.int32), assigned)

        if self.ignore_iof_thr > 0 and gt_bboxes_ignore is not None:
            iof = rbbox_overlaps(priors, gt_bboxes_ignore, mode='iof')
            iof = jnp.where(gt_ignore_mask[None, :], iof, -1.0)
            ignore_hit = iof.max(axis=1) > self.ignore_iof_thr
            assigned = jnp.where(ignore_hit, IGNORE, assigned)

        labels = jnp.where(
            assigned >= 0,
            take_rows(gt_labels.astype(jnp.int32),
                      jnp.clip(assigned, 0, None)), -1)
        return AssignResult(assigned, max_overlaps, labels)


@BBOX_ASSIGNERS.register_module()
class ATSSObbAssigner:
    """Adaptive Training Sample Selection for rotated boxes.

    Reference ``assigners/atss_obb_assigner.py:13-157``: per gt, take the
    ``topk`` closest priors (center distance) per level as candidates;
    threshold = mean + std of candidate IoUs; positives are candidates above
    threshold whose center falls inside the gt box; each prior goes to the
    gt with the highest IoU among its claimants.
    """

    def __init__(self, topk: int = 9, angle_version: str = 'le90',
                 iou_calculator: Optional[dict] = None):
        self.topk = topk
        self.angle_version = angle_version

    def __call__(self, priors, num_level_priors, gt_bboxes, gt_labels,
                 gt_mask) -> AssignResult:
        """priors (N, 5) anchors; num_level_priors: python list of ints."""
        priors = jax.lax.stop_gradient(priors)
        gt_bboxes = jax.lax.stop_gradient(gt_bboxes)
        G = gt_bboxes.shape[0]
        N = priors.shape[0]

        overlaps = rbbox_overlaps(priors, gt_bboxes)       # (N, G)
        overlaps = jnp.where(gt_mask[None, :], overlaps, 0.0)

        gt_ctr = gt_bboxes[:, :2]
        prior_ctr = priors[:, :2]
        dist = jnp.linalg.norm(prior_ctr[:, None] - gt_ctr[None], axis=-1)
        dist = jnp.where(gt_mask[None, :], dist, 1e9)      # (N, G)

        # top-k closest per level per gt
        is_cand = jnp.zeros((N, G), bool)
        start = 0
        for n_lvl in num_level_priors:
            lvl_dist = dist[start:start + n_lvl]           # (n_lvl, G)
            k = min(self.topk, n_lvl)
            _, top_idx = jax.lax.top_k(-lvl_dist.T, k)     # (G, k)
            lvl_mask = jnp.zeros((G, n_lvl), bool)
            lvl_mask = lvl_mask.at[
                jnp.arange(G)[:, None], top_idx].set(True)
            is_cand = is_cand.at[start:start + n_lvl].set(lvl_mask.T)
            start += n_lvl

        cand_iou = jnp.where(is_cand, overlaps, jnp.nan)    # (N, G)
        mean, std = _nan_mean_std_unbiased(cand_iou, axis=0)
        thr = mean + std                                    # (G,)

        # center-inside-gt test in the gt frame
        ga = gt_bboxes[:, 4]
        cos_a, sin_a = jnp.cos(ga), jnp.sin(ga)
        d = prior_ctr[:, None] - gt_ctr[None]               # (N, G, 2)
        lx = d[..., 0] * cos_a + d[..., 1] * sin_a
        ly = -d[..., 0] * sin_a + d[..., 1] * cos_a
        inside = (jnp.abs(lx) < gt_bboxes[:, 2] / 2) & \
                 (jnp.abs(ly) < gt_bboxes[:, 3] / 2)

        is_pos = is_cand & (overlaps >= thr[None]) & inside & gt_mask[None]

        pos_iou = jnp.where(is_pos, overlaps, -1.0)
        max_overlaps = pos_iou.max(axis=1)
        assigned = jnp.where(max_overlaps > -1,
                             pos_iou.argmax(axis=1).astype(jnp.int32), NEG)
        labels = jnp.where(
            assigned >= 0,
            take_rows(gt_labels.astype(jnp.int32),
                      jnp.clip(assigned, 0, None)), -1)
        return AssignResult(assigned, overlaps.max(axis=1), labels)


class SamplingResult(NamedTuple):
    """Masked 'sampling' result: no index gathering, just weight masks —
    the TPU replacement for mmdet samplers (dynamic index sets)."""
    pos_mask: jnp.ndarray     # (N,) bool
    neg_mask: jnp.ndarray     # (N,) bool
    assigned_gt_inds: jnp.ndarray
    labels: jnp.ndarray


@BBOX_ASSIGNERS.register_module()
class PseudoSampler:
    """All positives + all negatives (the single-stage default; mmdet
    ``PseudoSampler``)."""

    def __call__(self, assign_result: AssignResult) -> SamplingResult:
        pos = assign_result.assigned_gt_inds >= 0
        neg = assign_result.assigned_gt_inds == NEG
        return SamplingResult(pos, neg, assign_result.assigned_gt_inds,
                              assign_result.labels)


@BBOX_ASSIGNERS.register_module()
class RRandomSampler:
    """Random pos/neg sampling, mask-based (reference
    ``samplers/rotate_random_sampler.py``): keep at most
    ``num * pos_fraction`` positives and fill with negatives up to ``num``.

    Randomness comes from an explicit rng key (functional style); selection
    is done by ranking random scores so shapes stay static.
    """

    def __init__(self, num: int, pos_fraction: float,
                 neg_pos_ub: int = -1, add_gt_as_proposals: bool = True):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def __call__(self, assign_result: AssignResult,
                 rng: jax.Array) -> SamplingResult:
        pos = assign_result.assigned_gt_inds >= 0
        neg = assign_result.assigned_gt_inds == NEG
        pos_keep, neg_keep = random_sample_masks(
            pos, neg, self.num, self.pos_fraction, rng,
            neg_pos_ub=self.neg_pos_ub)
        return SamplingResult(pos_keep, neg_keep,
                              assign_result.assigned_gt_inds,
                              assign_result.labels)


@BBOX_ASSIGNERS.register_module()
class SASAssigner:
    """SASM's shape-adaptive selection over point SETS (reference
    ``assigners/sas_assigner.py:72-222``): quality = convex-hull IoU of the
    pointset against the gt polygon; candidates = top-k by (pointset mean
    center -> gt hbb center) distance per level; dynamic threshold =
    (mean + std of candidate IoUs) * exp(-mean_gt_aspect_ratio / 4);
    positives must have their mean center inside the gt polygon. Vectorized
    over padded gts."""

    def __init__(self, topk: int = 9):
        self.topk = topk

    def __call__(self, pointsets, num_level_points, gt_polys, gt_labels,
                 gt_mask) -> AssignResult:
        """pointsets (N, 18); gt_polys (G, 8) padded."""
        from ..ops.points import convex_iou, points_in_polygons
        pointsets = jax.lax.stop_gradient(pointsets)
        G = gt_polys.shape[0]
        N = pointsets.shape[0]

        overlaps = convex_iou(pointsets, gt_polys)           # (N, G)
        overlaps = jnp.where(gt_mask[None], overlaps, 0.0)

        pts = pointsets.reshape(N, -1, 2)
        ctr = pts.mean(1)                                    # (N, 2)
        xs = gt_polys[:, 0::2]
        ys = gt_polys[:, 1::2]
        gt_ctr = jnp.stack([(xs.min(1) + xs.max(1)) / 2,
                            (ys.min(1) + ys.max(1)) / 2], -1)
        dist = jnp.linalg.norm(ctr[:, None] - gt_ctr[None], axis=-1)
        dist = jnp.where(gt_mask[None], dist, 1e9)

        is_cand = jnp.zeros((N, G), bool)
        start = 0
        for n_lvl in num_level_points:
            lvl = dist[start:start + n_lvl]
            k = min(self.topk, n_lvl)
            _, idx = jax.lax.top_k(-lvl.T, k)
            m = jnp.zeros((G, n_lvl), bool).at[
                jnp.arange(G)[:, None], idx].set(True)
            is_cand = is_cand.at[start:start + n_lvl].set(m.T)
            start += n_lvl

        q = jnp.where(is_cand, overlaps, jnp.nan)
        mean, std = _nan_mean_std_unbiased(q, axis=0)
        # shape-adaptive threshold: scale by exp(-ratio/4) with ratio the
        # MEAN gt aspect ratio (the reference's ``.mean(0)`` collapses the
        # per-gt ratios to a scalar — replicated)
        e1 = jnp.linalg.norm(gt_polys[:, 2:4] - gt_polys[:, 0:2], axis=-1)
        e2 = jnp.linalg.norm(gt_polys[:, 4:6] - gt_polys[:, 2:4], axis=-1)
        ratio = jnp.maximum(e1, e2) / jnp.maximum(jnp.minimum(e1, e2), 1e-6)
        mean_ratio = jnp.sum(jnp.where(gt_mask, ratio, 0.0)) / \
            jnp.maximum(gt_mask.sum(), 1)
        thr = (mean + std) * jnp.exp(-0.25 * mean_ratio)

        inside = points_in_polygons(ctr, gt_polys)           # (N, G)
        is_pos = is_cand & (overlaps >= thr[None]) & inside & gt_mask[None]

        posq = jnp.where(is_pos, overlaps, -1.0)
        maxq = posq.max(-1)
        assigned = jnp.where(maxq > -1, posq.argmax(-1).astype(jnp.int32),
                             NEG)
        labels = jnp.where(assigned >= 0,
                           take_rows(gt_labels.astype(jnp.int32),
                                     jnp.clip(assigned, 0, None)), -1)
        return AssignResult(assigned, overlaps.max(-1), labels)


@BBOX_ASSIGNERS.register_module()
class ATSSKldAssigner(ATSSObbAssigner):
    """ATSS with a KLD similarity metric instead of rotated IoU (reference
    ``assigners/atss_kld_assigner.py``)."""

    def __call__(self, priors, num_level_priors, gt_bboxes, gt_labels,
                 gt_mask) -> AssignResult:
        from ..models.losses.gaussian_dist_loss import (kld_distance,
                                                        xy_wh_r_2_xy_sigma)
        priors = jax.lax.stop_gradient(priors)
        gt_bboxes = jax.lax.stop_gradient(gt_bboxes)
        G = gt_bboxes.shape[0]
        N = priors.shape[0]
        # KLD similarity 1/(1+kld) as overlaps
        p = xy_wh_r_2_xy_sigma(
            jnp.broadcast_to(priors[:, None], (N, G, 5)))
        t = xy_wh_r_2_xy_sigma(
            jnp.broadcast_to(gt_bboxes[None], (N, G, 5)))
        kld = kld_distance(p, t, sqrt=False)
        overlaps = 1.0 / (1.0 + jnp.clip(kld, 0))
        overlaps = jnp.where(gt_mask[None], overlaps, 0.0)

        dist = jnp.linalg.norm(priors[:, None, :2] - gt_bboxes[None, :, :2],
                               axis=-1)
        dist = jnp.where(gt_mask[None], dist, 1e9)
        is_cand = jnp.zeros((N, G), bool)
        start = 0
        for n_lvl in num_level_priors:
            lvl = dist[start:start + n_lvl]
            k = min(self.topk, n_lvl)
            _, idx = jax.lax.top_k(-lvl.T, k)
            m = jnp.zeros((G, n_lvl), bool).at[
                jnp.arange(G)[:, None], idx].set(True)
            is_cand = is_cand.at[start:start + n_lvl].set(m.T)
            start += n_lvl

        cand = jnp.where(is_cand, overlaps, jnp.nan)
        mean, std = _nan_mean_std_unbiased(cand, axis=0)
        thr = mean + std

        ga = gt_bboxes[:, 4]
        cos_a, sin_a = jnp.cos(ga), jnp.sin(ga)
        d = priors[:, None, :2] - gt_bboxes[None, :, :2]
        lx = d[..., 0] * cos_a + d[..., 1] * sin_a
        ly = -d[..., 0] * sin_a + d[..., 1] * cos_a
        inside = (jnp.abs(lx) < gt_bboxes[:, 2] / 2) & \
                 (jnp.abs(ly) < gt_bboxes[:, 3] / 2)
        is_pos = is_cand & (overlaps >= thr[None]) & inside & gt_mask[None]
        posq = jnp.where(is_pos, overlaps, -1.0)
        maxq = posq.max(-1)
        assigned = jnp.where(maxq > -1, posq.argmax(-1).astype(jnp.int32),
                             NEG)
        labels = jnp.where(assigned >= 0,
                           take_rows(gt_labels.astype(jnp.int32),
                                     jnp.clip(assigned, 0, None)), -1)
        return AssignResult(assigned, overlaps.max(-1), labels)
