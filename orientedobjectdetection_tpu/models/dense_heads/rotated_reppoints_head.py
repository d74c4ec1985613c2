"""RepPoints family heads (Rotated / CFA / Oriented-APAA / SAM-SASM / KLD).

Rebuilds the reference's four point-set heads TPU-first:

- ``RotatedRepPointsHead`` (ref ``rotated_reppoints_head.py``, incl. the
  CFA ``use_reassign`` path at ``:552-1000``),
- ``OrientedRepPointsHead`` with the APAA quality assessment + dynamic
  top-k sampling (ref ``oriented_reppoints_head.py:432-620``),
- ``SAMRepPointsHead`` with SASM's shape-adaptive weighting (ref
  ``sam_reppoints_head.py:296-580``),
- ``KLDRepPointsHead`` (G-RepPoints, ref ``configs/g_reppoints``).

TPU design: the reference's per-gt/per-level python loops with dynamic
index sets become static-shape *rank-in-group* computations — one lexsort
ranks every positive within its (gt, level) group, per-gt candidate tables
are fixed (G, L*K) scatters, and the whole selection runs batched inside
the jitted train step. DeformConv is the gather+matmul decomposition
(:func:`ops.feature_align.deform_conv_sample`).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.gather import take_rows
from ...core.anchors import MlvlPointGenerator
from ...ops.boxes import obb2poly, poly2obb
from ...ops.feature_align import deform_conv_sample
from ...ops.nms import multiclass_nms_rotated
from ...ops.points import (chamfer_distance, convex_giou, convex_iou,
                           min_area_polygons, points_in_polygons)
from ...utils.registry import BBOX_ASSIGNERS, HEADS, LOSSES
from .rotated_anchor_head import _build


# ---------------------------------------------------------------------------
# assigners
# ---------------------------------------------------------------------------

@BBOX_ASSIGNERS.register_module()
class ConvexAssigner:
    """Scale-matched nearest-point assignment (reference
    ``assigners/convex_assigner.py:10-170``), vectorized over padded gts."""

    def __init__(self, scale: float = 4, pos_num: int = 3):
        self.scale = scale
        self.pos_num = pos_num

    def __call__(self, points_xy, points_lvl, gt_polys, gt_labels, gt_mask,
                 num_classes: int):
        """points_xy (N,2); points_lvl (N,) int; gt_polys (G,8) padded."""
        xs = gt_polys[:, 0::2]
        ys = gt_polys[:, 1::2]
        cx = (xs.min(1) + xs.max(1)) / 2
        cy = (ys.min(1) + ys.max(1)) / 2
        w = jnp.maximum(xs.max(1) - xs.min(1), 1e-6)
        h = jnp.maximum(ys.max(1) - ys.min(1), 1e-6)
        lvl_min = points_lvl.min()
        lvl_max = points_lvl.max()
        gt_lvl = jnp.clip(((jnp.log2(w / self.scale) +
                            jnp.log2(h / self.scale)) / 2).astype(jnp.int32),
                          lvl_min, lvl_max)

        dx = (points_xy[:, 0:1] - cx[None]) / w[None]
        dy = (points_xy[:, 1:2] - cy[None]) / h[None]
        dist = jnp.sqrt(dx ** 2 + dy ** 2)                    # (N, G)
        on_lvl = points_lvl[:, None] == gt_lvl[None]
        dist = jnp.where(on_lvl & gt_mask[None], dist, jnp.inf)

        # per gt: pos_num nearest points
        k = self.pos_num
        _, top_idx = jax.lax.top_k(-dist.T, k)                # (G, k)
        claim = jnp.zeros_like(dist, bool).at[
            top_idx, jnp.arange(dist.shape[1])[:, None]].set(True)
        claim = claim & jnp.isfinite(dist)
        # resolve multi-claims by min distance (reference's sequential
        # overwrite keeps the closest gt)
        cd = jnp.where(claim, dist, jnp.inf)
        best = cd.argmin(-1)
        pos = jnp.isfinite(cd.min(-1))
        labels = jnp.where(pos, take_rows(gt_labels, best), num_classes)
        return best, pos, labels


@BBOX_ASSIGNERS.register_module()
class MaxConvexIoUAssigner:
    """MaxIoU-style assignment on convex-hull IoU (reference
    ``assigners/max_convex_iou_assigner.py``). Also returns the full
    (N, G) overlap matrix — CFA's anti-aliasing reweighting consumes it."""

    def __init__(self, pos_iou_thr: float = 0.4, neg_iou_thr: float = 0.3,
                 min_pos_iou: float = 0.0, gt_max_assign_all: bool = True,
                 ignore_iof_thr: float = -1):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all

    def __call__(self, pointsets, gt_polys, gt_labels, gt_mask,
                 num_classes: int):
        """pointsets (N, 18); gt_polys (G, 8)."""
        overlaps = convex_iou(pointsets, gt_polys)            # (N, G)
        overlaps = jnp.where(gt_mask[None], overlaps, 0.0)
        max_o = overlaps.max(-1)
        arg = overlaps.argmax(-1)
        pos = max_o >= self.pos_iou_thr
        neg = max_o < self.neg_iou_thr
        # low-quality: each gt claims its best pointset(s)
        gt_max = overlaps.max(0)
        if self.gt_max_assign_all:
            claim = (overlaps == gt_max[None]) & \
                (gt_max[None] >= self.min_pos_iou) & gt_mask[None]
        else:
            # only the single argmax pointset per gt
            best = overlaps.argmax(0)                         # (G,)
            claim = jnp.zeros_like(overlaps, bool).at[
                best, jnp.arange(overlaps.shape[1])].set(
                (gt_max >= self.min_pos_iou) & gt_mask)
        claimed = jnp.where(claim,
                            jnp.arange(gt_polys.shape[0])[None], -1).max(-1)
        arg = jnp.where(claimed >= 0, claimed, arg)
        pos = pos | (claimed >= 0)
        labels = jnp.where(pos, take_rows(gt_labels, arg), num_classes)
        return arg, pos, neg & ~pos, labels, overlaps


class ATSSKldPointsAssigner:
    """ATSS over point sets with a KLD similarity (reference
    ``assigners/atss_kld_assigner.py:150-282``, the point-set variant used
    by G-RepPoints): quality = 1/(2 + KL(fit(points) || gt_gaussian)),
    candidates = top-k by center distance per level, threshold =
    mean + std, centers must fall inside the gt polygon."""

    def __init__(self, topk: int = 9):
        self.topk = topk

    def __call__(self, pointsets, num_level_points, gt_polys, gt_labels,
                 gt_mask, num_classes: int):
        from ...core.assigners import _nan_mean_std_unbiased
        from ...core.gmm import gmm_fit
        from ...ops.boxes import gt2gaussian_poly
        pointsets = jax.lax.stop_gradient(pointsets)
        N = pointsets.shape[0]
        G = gt_polys.shape[0]

        p = pointsets.reshape(N, 9, 2)
        _, mu_p, cov_p = gmm_fit(p, n_components=1, n_iter=2)
        mu_p = mu_p[:, 0]
        sp = cov_p[:, 0]
        mu_t, st = gt2gaussian_poly(gt_polys)
        det_t = jnp.maximum(st[:, 0, 0] * st[:, 1, 1] -
                            st[:, 0, 1] ** 2, 1e-12)
        det_p = jnp.maximum(sp[:, 0, 0] * sp[:, 1, 1] -
                            sp[:, 0, 1] ** 2, 1e-12)
        i00 = st[:, 1, 1] / det_t
        i01 = -st[:, 0, 1] / det_t
        i11 = st[:, 0, 0] / det_t
        dx = mu_p[:, None, 0] - mu_t[None, :, 0]              # (N, G)
        dy = mu_p[:, None, 1] - mu_t[None, :, 1]
        term1 = dx * (i00[None] * dx + i01[None] * dy) + \
            dy * (i01[None] * dx + i11[None] * dy)
        tr = i00[None] * sp[:, None, 0, 0] + \
            2 * i01[None] * sp[:, None, 0, 1] + \
            i11[None] * sp[:, None, 1, 1]
        kld = 0.5 * (term1 + tr + jnp.log(det_t)[None] -
                     jnp.log(det_p)[:, None]) - 1.0
        overlaps = 1.0 / (2.0 + jnp.clip(kld, 1e-6))
        overlaps = jnp.where(gt_mask[None], overlaps, 0.0)

        xs = gt_polys[:, 0::2]
        ys = gt_polys[:, 1::2]
        gt_ctr = jnp.stack([(xs.min(1) + xs.max(1)) / 2,
                            (ys.min(1) + ys.max(1)) / 2], -1)
        ctr = p.mean(1)
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
        thr = mean + std
        inside = points_in_polygons(ctr, gt_polys)
        is_pos = is_cand & (overlaps >= thr[None]) & inside & gt_mask[None]
        posq = jnp.where(is_pos, overlaps, -1.0)
        pos = posq.max(-1) > -1
        arg = posq.argmax(-1)
        labels = jnp.where(pos, take_rows(gt_labels, arg), num_classes)
        return arg, pos, ~pos, labels, overlaps


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

@LOSSES.register_module()
class ConvexGIoULoss:
    """GIoU loss between predicted point sets and gt polygons (reference
    ``losses/convex_giou_loss.py``)."""

    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred_pointsets, target_polys, weight=None,
                 avg_factor=None):
        from ..losses.common import reduce_loss
        giou = convex_giou(pred_pointsets, target_polys)
        loss = 1 - giou
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class BCConvexGIoULoss(ConvexGIoULoss):
    """Border-constrained convex-GIoU (reference
    ``losses/convex_giou_loss.py`` BCConvexGIoULoss): adds an L1 pull of
    out-of-hull points toward the target polygon's bounds on top of the
    GIoU term."""

    def __call__(self, pred_pointsets, target_polys, weight=None,
                 avg_factor=None):
        from ..losses.common import reduce_loss
        giou = convex_giou(pred_pointsets, target_polys)
        pts = pred_pointsets.reshape(*pred_pointsets.shape[:-1], -1, 2)
        poly = target_polys.reshape(*target_polys.shape[:-1], -1, 2)
        lo = poly.min(-2, keepdims=True)
        hi = poly.max(-2, keepdims=True)
        border = (jnp.clip(lo - pts, 0) + jnp.clip(pts - hi, 0)).sum((-1, -2))
        scale = jnp.maximum((hi - lo).max((-1, -2)), 1.0)
        loss = (1 - giou) + 0.1 * border / scale
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


# ---------------------------------------------------------------------------
# static-shape selection machinery
# ---------------------------------------------------------------------------

def rank_in_group(group_id, quality, valid, num_groups: int):
    """Ascending-quality rank of each element within its group, computed
    with one lexsort + segmented offset (O(N log N), static shapes) — the
    TPU replacement for the reference's per-(gt, level) ``topk`` python
    loops. Invalid elements rank N (outside any top-k)."""
    n = group_id.shape[0]
    q = jnp.where(valid, quality, jnp.inf)
    gid = jnp.where(valid, group_id, num_groups)
    order = jnp.lexsort((q, gid))                     # group-major, q-minor
    g_sorted = gid[order]
    pos = jnp.arange(n)
    is_start = jnp.concatenate([jnp.ones((1,), bool),
                                g_sorted[1:] != g_sorted[:-1]])
    start_pos = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(is_start, pos, 0))
    rank_sorted = (pos - start_pos).astype(jnp.int32)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
    return jnp.where(valid, rank, n)


def sampling_edge_points(polys, points_num: int = 10):
    """(..., 8) polygons -> (..., 4*points_num, 2) evenly-sampled edge
    points (reference ``oriented_reppoints_head.py:329-368``)."""
    p = polys.reshape(polys.shape[:-1] + (4, 2))
    nxt = jnp.roll(p, -1, axis=-2)
    t = jnp.linspace(0.0, 1.0, points_num)
    # (..., 4, points_num, 2)
    pts = p[..., :, None, :] * (1 - t)[None, :, None] + \
        nxt[..., :, None, :] * t[None, :, None]
    return pts.reshape(polys.shape[:-1] + (4 * points_num, 2))


def chamfer_quality(polys_a, polys_b, distance_weight: float = 0.05,
                    points_num: int = 10):
    """Chamfer distance between edge-sampled polygons (reference
    ``ChamferDistance2D``, ``oriented_reppoints_head.py:21-46``)."""
    sa = sampling_edge_points(polys_a, points_num)
    sb = sampling_edge_points(polys_b, points_num)
    d1, d2 = chamfer_distance(sa, sb)
    return distance_weight * (d1 + d2) / 2.0


def _focal_elementwise(logits, labels, num_classes: int,
                       gamma: float = 2.0, alpha: float = 0.25):
    """Per-element sigmoid focal loss summed over classes (the reference's
    ``reduction_override='none'`` quality term)."""
    from ..losses.common import sigmoid_focal_loss
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    return sigmoid_focal_loss(logits, onehot, gamma, alpha).sum(-1)


# ---------------------------------------------------------------------------
# heads
# ---------------------------------------------------------------------------

@HEADS.register_module()
class RotatedRepPointsHead(nn.Module):
    """Two-stage point head; ``use_reassign=True`` enables the CFA
    convex-hull feature-adaption reassignment (reference
    ``rotated_reppoints_head.py:552-1000``, ``configs/cfa``)."""
    num_classes: int = 15
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    use_reassign: bool = False
    topk: int = 6
    anti_factor: float = 0.75
    loss_cls: Optional[dict] = None
    loss_bbox_init: Optional[dict] = None
    loss_bbox_refine: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    version: str = 'oc'
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def prior_generator(self):
        return MlvlPointGenerator(strides=list(self.point_strides),
                                  offset=0.5)

    @nn.compact
    def __call__(self, feats):
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        n_pts = self.num_points

        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        cls_gn = [nn.GroupNorm(num_groups=32, dtype=self.dtype,
                               name=f'cls_gn_{i}')
                  for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_gn = [nn.GroupNorm(num_groups=32, dtype=self.dtype,
                               name=f'reg_gn_{i}')
                  for i in range(self.stacked_convs)]
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                                padding=[(1, 1)] * 2, dtype=self.dtype,
                                name='pts_init_conv')
        pts_init_out = nn.Conv(2 * n_pts, (1, 1), dtype=self.dtype,
                               name='pts_init_out')
        cls_dcn = nn.Dense(self.point_feat_channels, dtype=self.dtype,
                           name='cls_dcn')
        cls_out = nn.Conv(self.num_classes, (1, 1), bias_init=bias_init,
                          dtype=self.dtype, name='cls_out')
        refine_dcn = nn.Dense(self.point_feat_channels, dtype=self.dtype,
                              name='refine_dcn')
        pts_refine_out = nn.Conv(2 * n_pts, (1, 1), dtype=self.dtype,
                                 name='pts_refine_out')

        cls_scores, pts_inits, pts_refines, pocs = [], [], [], []
        for x in feats:
            c = x
            for conv, norm in zip(cls_convs, cls_gn):
                c = nn.relu(norm(conv(c)))
            r = x
            for conv, norm in zip(reg_convs, reg_gn):
                r = nn.relu(norm(conv(r)))
            pts_init = pts_init_out(nn.relu(pts_init_conv(r)))
            # dcn offsets from (gradient-attenuated) init points
            grad_mul_pts = (self.gradient_mul * pts_init +
                            (1 - self.gradient_mul) *
                            jax.lax.stop_gradient(pts_init))
            b, h, w, _ = x.shape
            taps_c = deform_conv_sample(c, grad_mul_pts)
            cls_feat = nn.relu(cls_dcn(taps_c.reshape(b, h, w, -1)))
            cls_scores.append(cls_out(cls_feat))
            taps_r = deform_conv_sample(r, grad_mul_pts)
            ref_feat = nn.relu(refine_dcn(taps_r.reshape(b, h, w, -1)))
            pts_refine = pts_refine_out(ref_feat) + \
                jax.lax.stop_gradient(pts_init)
            pts_inits.append(pts_init)
            pts_refines.append(pts_refine)
            if self.with_poc:
                # APAA's point-wise correlation quality, computed where the
                # sampled taps already exist (the reference re-samples the
                # base features in the loss, oriented_reppoints_head.py:
                # 378-427): max over points of (1 - cos(tap, mean tap)).
                taps = jax.lax.stop_gradient(
                    deform_conv_sample(x, jax.lax.stop_gradient(pts_refine)))
                taps = taps.reshape(b, h, w, n_pts, -1)
                mean_t = taps.mean(-2, keepdims=True)
                tn = taps / jnp.maximum(
                    jnp.linalg.norm(taps, axis=-1, keepdims=True), 1e-2)
                mn = mean_t / jnp.maximum(
                    jnp.linalg.norm(mean_t, axis=-1, keepdims=True), 1e-2)
                cos = (tn * mn).sum(-1)                       # (b, h, w, P)
                pocs.append((1.0 - cos).max(-1))              # (b, h, w)
        if self.with_poc:
            return (tuple(cls_scores), tuple(pts_inits), tuple(pts_refines),
                    tuple(pocs))
        return tuple(cls_scores), tuple(pts_inits), tuple(pts_refines)

    @property
    def with_poc(self) -> bool:
        return False

    # ---- point decoding ---------------------------------------------------
    def _points_to_imgspace(self, pts_flat, centers, strides):
        """(B, N, 18) offsets (dy,dx per point, feature units) -> image-space
        (B, N, 18) as (x, y) pairs."""
        off = pts_flat.reshape(pts_flat.shape[:-1] + (self.num_points, 2))
        y = centers[None, :, None, 1] + off[..., 0] * strides[None, :, None]
        x = centers[None, :, None, 0] + off[..., 1] * strides[None, :, None]
        return jnp.stack([x, y], -1).reshape(pts_flat.shape)

    def _flat(self, outputs):
        cls_scores, pts_inits, pts_refines = outputs[:3]
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.num_classes) for s in cls_scores], 1)
        init_flat = jnp.concatenate(
            [p.reshape(b, -1, 2 * self.num_points) for p in pts_inits], 1)
        ref_flat = jnp.concatenate(
            [p.reshape(b, -1, 2 * self.num_points) for p in pts_refines], 1)
        return cls_flat, init_flat, ref_flat

    def _centers(self, featmap_sizes):
        pts = self.prior_generator.grid_priors(featmap_sizes,
                                               with_stride=True)
        lvls = []
        for i, p in enumerate(pts):
            lvls.append(jnp.full((p.shape[0],), i, jnp.int32))
        return (jnp.concatenate([p[:, :2] for p in pts], 0),
                jnp.concatenate([p[:, 2] for p in pts], 0),
                jnp.concatenate(lvls, 0))

    def _assigners(self):
        tc = self.train_cfg or {}
        init_assigner = ConvexAssigner(**{
            k: v for k, v in dict(tc.get('init', {}).get(
                'assigner', {})).items() if k != 'type'})
        ref_cfg = dict(tc.get('refine', {}).get('assigner', {}))
        ref_type = ref_cfg.pop('type', 'MaxConvexIoUAssigner')
        ref_cfg.pop('ignore_iof_thr', None)
        if ref_type == 'SASAssigner':
            from ...core.assigners import SASAssigner
            refine_assigner = SASAssigner(**ref_cfg)
        elif ref_type == 'ATSSKldAssigner':
            refine_assigner = ATSSKldPointsAssigner(**ref_cfg)
        else:
            refine_assigner = MaxConvexIoUAssigner(**ref_cfg)
        return init_assigner, refine_assigner, ref_type

    def _loss_common(self, outputs, gt_bboxes, gt_labels, gt_mask):
        """Shared target computation for every RepPoints variant."""
        cls_scores = outputs[0]
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        centers, strides, lvl_ids = self._centers(featmap_sizes)
        points_lvl = jnp.log2(strides).astype(jnp.int32)
        cls_flat, init_flat, ref_flat = self._flat(outputs)
        init_img = self._points_to_imgspace(init_flat, centers, strides)
        ref_img = self._points_to_imgspace(ref_flat, centers, strides)
        # per-point loss normalization (reference loss_single
        # ``normalize_term = point_base_scale * stride``)
        norm_term = self.point_base_scale * strides           # (N,)

        init_assigner, refine_assigner, ref_type = self._assigners()
        num_level = [h * w for (h, w) in featmap_sizes]

        def targets_single(gb, gl, gm, init_pts):
            gt_polys = obb2poly(gb, self.version)
            best_i, pos_i, _ = init_assigner(
                centers, points_lvl, gt_polys, gl, gm, self.num_classes)
            if ref_type in ('SASAssigner',):
                assign = refine_assigner(
                    jax.lax.stop_gradient(init_pts), num_level, gt_polys,
                    gl, gm)
                arg_r, pos_r = assign.assigned_gt_inds, \
                    assign.assigned_gt_inds >= 0
                arg_r = jnp.clip(arg_r, 0, None)
                neg_r = ~pos_r
                labels_r = jnp.where(pos_r, assign.labels, self.num_classes)
                overlaps = None
            elif ref_type == 'ATSSKldAssigner':
                arg_r, pos_r, neg_r, labels_r, overlaps = refine_assigner(
                    jax.lax.stop_gradient(init_pts), num_level, gt_polys,
                    gl, gm, self.num_classes)
            else:
                arg_r, pos_r, neg_r, labels_r, overlaps = refine_assigner(
                    jax.lax.stop_gradient(init_pts), gt_polys, gl, gm,
                    self.num_classes)
            if overlaps is None:
                overlaps = jnp.zeros((init_pts.shape[0], gb.shape[0]))
            return (gt_polys, best_i, pos_i.astype(jnp.float32),
                    arg_r.astype(jnp.int32), pos_r, neg_r, labels_r,
                    overlaps)

        (gt_polys, best_i, init_w, arg_r, pos_r, neg_r, labels_r,
         overlaps) = jax.vmap(targets_single)(gt_bboxes, gt_labels, gt_mask,
                                              init_img)
        b = cls_flat.shape[0]
        init_tgt = jnp.take_along_axis(
            gt_polys, best_i[..., None], axis=1)               # (B, N, 8)
        ref_tgt = jnp.take_along_axis(
            gt_polys, arg_r[..., None], axis=1)
        return dict(cls_flat=cls_flat, init_img=init_img, ref_img=ref_img,
                    init_tgt=init_tgt, init_w=init_w, ref_tgt=ref_tgt,
                    arg_r=arg_r, pos_r=pos_r, neg_r=neg_r, labels_r=labels_r,
                    overlaps=overlaps, norm=norm_term, lvl=lvl_ids,
                    centers=centers, num_levels=len(featmap_sizes),
                    gt_mask=gt_mask, batch=b)

    # ---- plain / CFA losses ------------------------------------------------
    def loss(self, outputs, gt_bboxes, gt_labels, gt_mask):
        prep = self._loss_common(outputs, gt_bboxes, gt_labels, gt_mask)
        if self.use_reassign:
            return self._loss_cfa(prep)
        return self._loss_plain(prep)

    def _reg_losses(self, prep, ref_w, num_pos_r):
        """Init + refine point losses with per-point normalization."""
        b, n = prep['init_img'].shape[:2]
        nt = prep['norm'][None, :, None]
        num_pos_i = jnp.maximum(prep['init_w'].sum(), 1.0)
        loss_init = _build(LOSSES, dict(
            self.loss_bbox_init or dict(type='ConvexGIoULoss',
                                        loss_weight=0.375)))(
            (prep['init_img'] / nt).reshape(b * n, -1),
            (prep['init_tgt'] / nt).reshape(b * n, -1),
            weight=prep['init_w'].reshape(-1), avg_factor=num_pos_i)
        loss_refine = _build(LOSSES, dict(
            self.loss_bbox_refine or dict(type='ConvexGIoULoss',
                                          loss_weight=1.0)))(
            (prep['ref_img'] / nt).reshape(b * n, -1),
            (prep['ref_tgt'] / nt).reshape(b * n, -1),
            weight=ref_w.reshape(-1), avg_factor=num_pos_r)
        return loss_init, loss_refine

    def _loss_plain(self, prep):
        ref_w = prep['pos_r'].astype(jnp.float32)
        lw = (prep['pos_r'] | prep['neg_r']).astype(jnp.float32)
        num_pos_r = jnp.maximum(ref_w.sum(), 1.0)
        loss_init, loss_refine = self._reg_losses(prep, ref_w, num_pos_r)
        loss_cls = _build(LOSSES, dict(
            self.loss_cls or dict(type='FocalLoss')))(
            prep['cls_flat'], prep['labels_r'], weight=lw,
            avg_factor=num_pos_r)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                    loss_pts_refine=loss_refine)

    def _loss_cfa(self, prep):
        """CFA reassignment (reference ``reassign``,
        ``rotated_reppoints_head.py:850-1000``): per-gt gaussian split of
        the candidate losses + convex-IoU anti-aliasing reweighting."""
        L = prep['num_levels']
        K = self.topk
        G = prep['gt_mask'].shape[1]
        num_classes = self.num_classes
        cls_cfg = dict(self.loss_cls or dict(type='FocalLoss'))
        gamma = float(cls_cfg.get('gamma', 2.0))
        alpha = float(cls_cfg.get('alpha', 0.25))
        refine_w = float(dict(self.loss_bbox_refine or {}).get(
            'loss_weight', 1.0))

        b = prep['batch']
        cls_flat = prep['cls_flat']
        init_img = prep['init_img']
        labels_r = prep['labels_r']
        pos_r = prep['pos_r']
        arg_r = prep['arg_r']
        lvl = prep['lvl']
        overlaps = prep['overlaps']
        gmask = prep['gt_mask']
        n = cls_flat.shape[1]

        # quality of every point (masked later): focal + refine loss on the
        # init-stage points vs the refine-assigned gt
        qua = _focal_elementwise(cls_flat, labels_r, num_classes, gamma,
                                 alpha)
        qua = qua + refine_w * (1 - convex_giou(
            init_img.reshape(b * n, -1),
            prep['ref_tgt'].reshape(b * n, -1)).reshape(b, n))
        qua = jax.lax.stop_gradient(qua)

        def reassign_single(quality, pos, assigned, overlaps_i, gmask_i):
            # rank within (gt, level), keep per-level top-K
            group = assigned * L + lvl
            r1 = rank_in_group(group, quality, pos, G * L)
            cand = pos & (r1 < K)
            # scatter candidates into a per-gt table (G, L*K)
            row = jnp.where(cand, assigned, G)
            col = jnp.where(cand, lvl * K + r1, 0)
            LK = L * K
            inf = jnp.inf
            q_tbl = jnp.full((G + 1, LK), inf).at[row, col].set(
                jnp.where(cand, quality, inf))[:G]
            idx_tbl = jnp.full((G + 1, LK), n, jnp.int32).at[row, col].set(
                jnp.where(cand, jnp.arange(n), n))[:G]
            col_sum = jnp.where(gmask_i[None], overlaps_i, 0.0).sum(-1)
            ratio_pt = jnp.take_along_axis(
                overlaps_i, assigned[:, None], axis=1)[:, 0] / \
                (col_sum + 1e-6)
            r_tbl = jnp.zeros((G + 1, LK)).at[row, col].set(
                jnp.where(cand, ratio_pt, 0.0))[:G]

            order = jnp.argsort(q_tbl, axis=1)
            qs = jnp.take_along_axis(q_tbl, order, 1)
            rs = jnp.take_along_axis(r_tbl, order, 1)
            idx_s = jnp.take_along_axis(idx_tbl, order, 1)
            valid = jnp.isfinite(qs)
            cnt = valid.sum(1)
            qz = jnp.where(valid, qs, 0.0)
            mean = qz.sum(1) / jnp.maximum(cnt, 1)
            var = (jnp.where(valid, (qs - mean[:, None]) ** 2, 0.0)
                   ).sum(1) / jnp.maximum(cnt - 1, 1)
            var = jnp.maximum(var, 1e-12)
            dens = jnp.where(
                valid,
                jnp.exp(-(qs - mean[:, None]) ** 2 / var[:, None]) /
                jnp.sqrt(var)[:, None], 0.0)
            # cumulative density from the tail (reference's inverted cumsum)
            gp = jnp.cumsum(dens[:, ::-1], axis=1)[:, ::-1]
            gmin = jnp.where(valid, gp, inf).min(1)
            gmax = jnp.where(valid, gp, -inf).max(1)
            gnorm = (gp - gmin[:, None]) / \
                jnp.maximum(gmax[:, None] - gmin[:, None], 1e-6)
            curve = jnp.where(valid, gnorm * qs, -inf)
            thr = curve.argmax(1)
            keep_slot = valid & (jnp.arange(LK)[None] <= thr[:, None])
            w = self.anti_factor * rs * gnorm + 1e-6
            w = jnp.where(keep_slot, w, 0.0)
            nkeep = keep_slot.sum(1)
            w = w * nkeep[:, None] / jnp.maximum(w.sum(1)[:, None], 1e-6)
            small = cnt < 2
            keep_slot = jnp.where(small[:, None], valid, keep_slot)
            w = jnp.where(small[:, None] & valid, 1.0, w)
            keep_slot = keep_slot & gmask_i[:, None]
            w = jnp.where(keep_slot, w, 0.0)
            # scatter back to points
            flat_idx = idx_s.reshape(-1)
            keep_pts = jnp.zeros((n + 1,), bool).at[flat_idx].max(
                keep_slot.reshape(-1))[:n]
            w_pts = jnp.zeros((n + 1,)).at[flat_idx].add(
                w.reshape(-1))[:n]
            return keep_pts, w_pts

        keep, w = jax.vmap(reassign_single)(qua, pos_r, arg_r, overlaps,
                                            gmask)
        num_pos = jnp.maximum(keep.sum().astype(jnp.float32), 1.0)
        labels_final = jnp.where(pos_r & ~keep, num_classes, labels_r)
        lw = (pos_r | prep['neg_r']).astype(jnp.float32)
        lw = jnp.where(keep, w, lw)
        ref_w = jnp.where(keep, w, 0.0)

        loss_init, loss_refine = self._reg_losses(prep, ref_w, num_pos)
        loss_cls = _build(LOSSES, cls_cfg)(
            cls_flat, labels_final, weight=lw, avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                    loss_pts_refine=loss_refine)

    # ---- inference ----------------------------------------------------------
    def pointsets_to_polys(self, pointsets):
        """(K, 18) point sets -> (K, 8) corner polygons. The reference's
        ``points2rotrect(transform_method='rotrect')``
        (``rotated_reppoints_head.py:202-214``): minimum-area enclosing
        rectangle of the predicted points."""
        return min_area_polygons(pointsets)

    def get_bboxes(self, outputs, img_shape=None, scale_factor=None,
                   rescale: bool = False, cfg=None):
        cls_scores = outputs[0]
        cfg = cfg if cfg is not None else self.test_cfg
        nms_pre = int(cfg.get('nms_pre', 2000))
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        centers, strides, _ = self._centers(featmap_sizes)
        cls_flat, _, ref_flat = self._flat(outputs)
        ref_img = self._points_to_imgspace(ref_flat, centers, strides)

        def per_image(scores, pointsets):
            scores = jax.nn.sigmoid(scores)
            k = min(nms_pre, scores.shape[0])
            from ...ops.nms import topk_candidates
            _, top_idx = topk_candidates(
                scores.max(-1), k,
                exact=not bool(cfg.get('approx_topk', False)))
            sel_sets = pointsets[top_idx]
            boxes = poly2obb(self.pointsets_to_polys(sel_sets), self.version)
            sc = jnp.concatenate([scores[top_idx],
                                  jnp.zeros_like(scores[top_idx][:, :1])],
                                 -1)
            nms_cfg = cfg.get('nms', {'iou_thr': 0.1})
            return multiclass_nms_rotated(
                boxes, sc, score_thr=float(cfg.get('score_thr', 0.05)),
                iou_thr=float(nms_cfg.get('iou_thr', 0.1)),
                max_per_img=int(cfg.get('max_per_img', 2000)),
                max_candidates=int(cfg.get('max_candidates', 2000)))

        return jax.vmap(per_image)(cls_flat, ref_img)


@HEADS.register_module()
class OrientedRepPointsHead(RotatedRepPointsHead):
    """Oriented RepPoints with APAA (reference
    ``oriented_reppoints_head.py:432-620``): every positive point set is
    scored by classification + localization + orientation (chamfer) +
    point-wise feature correlation quality; per (gt, level) the 6 best
    survive, then a dynamic top-``top_ratio`` per gt keeps the final
    positives. Spatial border losses on both stages."""
    top_ratio: float = 0.4
    init_qua_weight: float = 0.2
    ori_qua_weight: float = 0.3
    poc_qua_weight: float = 0.1
    loss_spatial_init: Optional[dict] = None
    loss_spatial_refine: Optional[dict] = None

    @property
    def with_poc(self) -> bool:
        return True

    def loss(self, outputs, gt_bboxes, gt_labels, gt_mask):
        prep = self._loss_common(outputs, gt_bboxes, gt_labels, gt_mask)
        pocs = outputs[3]
        b = prep['batch']
        poc_flat = jnp.concatenate([p.reshape(b, -1) for p in pocs], 1)

        num_classes = self.num_classes
        cls_cfg = dict(self.loss_cls or dict(type='FocalLoss'))
        gamma = float(cls_cfg.get('gamma', 2.0))
        alpha = float(cls_cfg.get('alpha', 0.25))
        refine_w = float(dict(self.loss_bbox_refine or {}).get(
            'loss_weight', 1.0))

        cls_flat = prep['cls_flat']
        init_img = prep['init_img']
        ref_img = prep['ref_img']
        ref_tgt = prep['ref_tgt']
        labels_r = prep['labels_r']
        pos_r = prep['pos_r']
        arg_r = prep['arg_r']
        lvl = prep['lvl']
        n = cls_flat.shape[1]
        L = prep['num_levels']
        G = gt_mask.shape[1]

        # ---- APAA quality for every point (no_grad in the reference) ----
        def quality_terms(init_i, ref_i, tgt_i, cls_i, labels_i, poc_i):
            qua_cls = _focal_elementwise(cls_i, labels_i, num_classes,
                                         gamma, alpha)
            poly_init = min_area_polygons(init_i)
            poly_ref = min_area_polygons(ref_i)
            ori_init = self.ori_qua_weight * chamfer_quality(tgt_i,
                                                             poly_init)
            ori_ref = self.ori_qua_weight * chamfer_quality(tgt_i, poly_ref)
            loc_init = refine_w * (1 - convex_giou(init_i, tgt_i))
            loc_ref = refine_w * (1 - convex_giou(ref_i, tgt_i))
            iqw = self.init_qua_weight
            return (qua_cls + iqw * (loc_init + ori_init) +
                    (1 - iqw) * (loc_ref + ori_ref) +
                    self.poc_qua_weight * poc_i)

        qua = jax.lax.stop_gradient(jax.vmap(quality_terms)(
            init_img, ref_img, ref_tgt, cls_flat, labels_r, poc_flat))

        # ---- dynamic top-k selection (static-shape rank-in-group) -------
        def select_single(quality, pos, assigned):
            group = assigned * L + lvl
            r1 = rank_in_group(group, quality, pos, G * L)
            cand = pos & (r1 < 6)                  # top-6 per (gt, level)
            r2 = rank_in_group(assigned, quality, cand, G)
            cnt = jnp.zeros((G,), jnp.int32).at[assigned].add(
                cand.astype(jnp.int32))
            topk_g = jnp.where(cnt < 2, cnt,
                               jnp.ceil(cnt * self.top_ratio).astype(
                                   jnp.int32))
            return cand & (r2 < topk_g[assigned])

        keep = jax.vmap(select_single)(qua, pos_r, arg_r)
        num_pos = jnp.maximum(keep.sum().astype(jnp.float32), 1.0)
        labels_final = jnp.where(pos_r & ~keep, num_classes, labels_r)
        lw = (pos_r | prep['neg_r']).astype(jnp.float32)
        ref_w = keep.astype(jnp.float32)

        loss_init, loss_refine = self._reg_losses(prep, ref_w, num_pos)
        loss_cls = _build(LOSSES, cls_cfg)(
            cls_flat, labels_final, weight=lw, avg_factor=num_pos)

        # spatial border losses on both stages
        nt = prep['norm'][None, :, None]
        bn = b * n
        num_pos_i = jnp.maximum(prep['init_w'].sum(), 1.0)
        sb_init = _build(LOSSES, dict(
            self.loss_spatial_init or dict(type='SpatialBorderLoss',
                                           loss_weight=0.05)))(
            (init_img / nt).reshape(bn, -1),
            (prep['init_tgt'] / nt).reshape(bn, -1),
            weight=prep['init_w'].reshape(-1), avg_factor=num_pos_i)
        sb_ref = _build(LOSSES, dict(
            self.loss_spatial_refine or dict(type='SpatialBorderLoss',
                                             loss_weight=0.1)))(
            (ref_img / nt).reshape(bn, -1),
            (ref_tgt / nt).reshape(bn, -1),
            weight=ref_w.reshape(-1), avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                    loss_pts_refine=loss_refine, loss_spatial_init=sb_init,
                    loss_spatial_refine=sb_ref)


@HEADS.register_module()
class SAMRepPointsHead(RotatedRepPointsHead):
    """SASM head (reference ``sam_reppoints_head.py``): the SASAssigner's
    shape-adaptive selection for the refine stage plus SA distance weights
    ``exp(1/(1+d))`` multiplying both reg-stage and cls losses, where d is
    the width/height-normalized center offset (``:376-415``)."""

    def _sam_weights(self, tgt_polys, points_xy, lw):
        """tgt_polys (N, 8) assigned-gt polygons (zeros for non-pos);
        points_xy (N, 2) sample centers; lw (N,) label weights."""
        obb = poly2obb(tgt_polys, self.version)
        cx, cy, w, h, a = [obb[:, i] for i in range(5)]
        dx2 = (cx - points_xy[:, 0]) ** 2
        dy2 = (cy - points_xy[:, 1]) ** 2
        w_s = jnp.maximum(w, 1e-6)
        h_s = jnp.maximum(h, 1e-6)
        cond_wh = (w > 0) & (a >= 0) & (a <= 1.57)
        cond_hw = (w > 0) & ((a < 0) | (a > 1.57))
        d = jnp.where(cond_wh, jnp.sqrt(dx2 / w_s + dy2 / h_s),
                      jnp.where(cond_hw, jnp.sqrt(dx2 / h_s + dy2 / w_s),
                                0.0))
        sam = lw * jnp.exp(1.0 / (d + 1.0))
        return jnp.where(jnp.isfinite(sam), sam, 0.0)

    def loss(self, outputs, gt_bboxes, gt_labels, gt_mask):
        prep = self._loss_common(outputs, gt_bboxes, gt_labels, gt_mask)
        b, n = prep['init_img'].shape[:2]
        nt = prep['norm'][None, :, None]

        lw_i = jnp.ones_like(prep['init_w'])       # init: all points weighted
        centers = jnp.broadcast_to(prep['centers'][None], (b, n, 2))
        sam_i = jax.vmap(self._sam_weights)(
            jnp.where(prep['init_w'][..., None] > 0, prep['init_tgt'], 0.0),
            centers, lw_i)

        lw_r = (prep['pos_r'] | prep['neg_r']).astype(jnp.float32)
        ref_centers = prep['init_img'].reshape(b, n, -1, 2).mean(-2)
        sam_r = jax.vmap(self._sam_weights)(
            jnp.where(prep['pos_r'][..., None], prep['ref_tgt'], 0.0),
            jax.lax.stop_gradient(ref_centers), lw_r)

        ref_w = prep['pos_r'].astype(jnp.float32)
        num_pos_i = jnp.maximum(prep['init_w'].sum(), 1.0)
        num_pos_r = jnp.maximum(ref_w.sum(), 1.0)

        loss_init = _build(LOSSES, dict(
            self.loss_bbox_init or dict(type='BCConvexGIoULoss',
                                        loss_weight=0.375)))(
            (prep['init_img'] / nt).reshape(b * n, -1),
            (prep['init_tgt'] / nt).reshape(b * n, -1),
            weight=(prep['init_w'] * sam_i).reshape(-1),
            avg_factor=num_pos_i)
        loss_refine = _build(LOSSES, dict(
            self.loss_bbox_refine or dict(type='ConvexGIoULoss',
                                          loss_weight=1.0)))(
            (prep['ref_img'] / nt).reshape(b * n, -1),
            (prep['ref_tgt'] / nt).reshape(b * n, -1),
            weight=(ref_w * sam_r).reshape(-1), avg_factor=num_pos_r)
        loss_cls = _build(LOSSES, dict(
            self.loss_cls or dict(type='FocalLoss')))(
            prep['cls_flat'], prep['labels_r'], weight=lw_r * sam_r,
            avg_factor=num_pos_r)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                    loss_pts_refine=loss_refine)


@HEADS.register_module()
class KLDRepPointsHead(RotatedRepPointsHead):
    """G-RepPoints head (reference ``configs/g_reppoints``): KLD point-set
    losses (Gaussian fitted by the batched GMM) + ATSS-KLD refine
    assignment. Network is the shared RepPoints tower."""

    def pointsets_to_polys(self, pointsets):
        """G-RepPoints decode: the KLD losses train the point set's fitted
        GAUSSIAN toward the gt Gaussian (nothing constrains the raw point
        hull), so the box must be read from the same statistic — fit a
        1-component Gaussian and invert the L=3 bridge
        (``ops/boxes.py:gaussian2bbox``; reference ``transforms.py:883-913``
        via torch_batch_svd). Decoding the raw hull with
        ``min_area_polygons`` is a train/test mismatch that scores ~0 mAP.
        """
        from ...core.gmm import gmm_fit
        from ...ops.boxes import gaussian2bbox
        p = pointsets.reshape(-1, self.num_points, 2)
        _, mu, cov = gmm_fit(p, n_components=1, n_iter=2)
        return gaussian2bbox(mu[..., 0, :], cov[..., 0, :, :]).reshape(
            pointsets.shape[:-1] + (8,))

    def _reg_losses(self, prep, ref_w, num_pos_r):
        b, n = prep['init_img'].shape[:2]
        nt = prep['norm'][None, :, None]
        num_pos_i = jnp.maximum(prep['init_w'].sum(), 1.0)
        loss_init = _build(LOSSES, dict(
            self.loss_bbox_init or dict(type='KLDRepPointsLoss')))(
            (prep['init_img'] / nt).reshape(b * n, -1),
            (prep['init_tgt'] / nt).reshape(b * n, -1),
            weight=prep['init_w'].reshape(-1), avg_factor=num_pos_i)
        loss_refine = _build(LOSSES, dict(
            self.loss_bbox_refine or dict(type='KLDRepPointsLoss')))(
            (prep['ref_img'] / nt).reshape(b * n, -1),
            (prep['ref_tgt'] / nt).reshape(b * n, -1),
            weight=ref_w.reshape(-1), avg_factor=num_pos_r)
        return loss_init, loss_refine
