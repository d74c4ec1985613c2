"""Rotated RepPoints head (+ Oriented/SAM aliases).

Rebuilds reference ``dense_heads/rotated_reppoints_head.py`` (1172 LoC)
TPU-first: two-stage point prediction (init offsets -> deformable-sampled
refine), ConvexAssigner for the init stage, MaxConvexIoUAssigner for the
refine stage, ConvexGIoU losses, and min-area-rectangle decode — all
running as batched masked computations in one jitted program. DeformConv is
the gather+matmul decomposition (:func:`ops.feature_align.deform_conv_sample`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.anchors import MlvlPointGenerator
from ...ops.boxes import obb2poly, poly2obb
from ...ops.feature_align import deform_conv_sample
from ...ops.iou import _cross2
from ...ops.nms import multiclass_nms_rotated
from ...ops.points import convex_giou, convex_iou, min_area_polygons
from ...utils.registry import BBOX_ASSIGNERS, HEADS, LOSSES
from .rotated_anchor_head import _build


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
        labels = jnp.where(pos, gt_labels[best], num_classes)
        return best, pos, labels


@BBOX_ASSIGNERS.register_module()
class MaxConvexIoUAssigner:
    """MaxIoU-style assignment on convex-hull IoU (reference
    ``assigners/max_convex_iou_assigner.py``)."""

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
        # low-quality: each gt claims its best pointset
        gt_max = overlaps.max(0)
        claim = (overlaps == gt_max[None]) & \
            (gt_max[None] >= self.min_pos_iou) & gt_mask[None]
        claimed = jnp.where(claim,
                            jnp.arange(gt_polys.shape[0])[None], -1).max(-1)
        arg = jnp.where(claimed >= 0, claimed, arg)
        pos = pos | (claimed >= 0)
        labels = jnp.where(pos, gt_labels[arg], num_classes)
        return arg, pos, neg & ~pos, labels


@LOSSES.register_module()
class ConvexGIoULoss:
    """GIoU loss between predicted point sets and gt polygons (reference
    ``losses/convex_giou_loss.py``)."""

    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred_pointsets, target_polys, weight=None,
                 avg_factor=None):
        from .rotated_anchor_head import _build  # noqa (avoid cycle)
        from ..losses.common import reduce_loss
        giou = convex_giou(pred_pointsets, target_polys)
        loss = 1 - giou
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@HEADS.register_module()
class RotatedRepPointsHead(nn.Module):
    num_classes: int = 15
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Sequence[int] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    loss_cls: Optional[dict] = None
    loss_bbox_init: Optional[dict] = None
    loss_bbox_refine: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    version: str = 'oc'
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def prior_generator(self):
        return MlvlPointGenerator(strides=list(self.point_strides),
                                  offset=0.5)

    @nn.compact
    def __call__(self, feats):
        import math
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

        cls_scores, pts_inits, pts_refines = [], [], []
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
        return tuple(cls_scores), tuple(pts_inits), tuple(pts_refines)

    # ---- point decoding -----------------------------------------------------
    def _points_to_imgspace(self, pts_flat, centers, strides):
        """(B, N, 18) offsets (dy,dx per point, feature units) -> image-space
        (B, N, 18) as (x, y) pairs."""
        off = pts_flat.reshape(pts_flat.shape[:-1] + (self.num_points, 2))
        y = centers[None, :, None, 1] + off[..., 0] * strides[None, :, None]
        x = centers[None, :, None, 0] + off[..., 1] * strides[None, :, None]
        return jnp.stack([x, y], -1).reshape(pts_flat.shape)

    def _flat(self, outputs):
        cls_scores, pts_inits, pts_refines = outputs
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

    # ---- loss -----------------------------------------------------------------
    def loss(self, outputs, gt_bboxes, gt_labels, gt_mask):
        cls_scores, pts_inits, pts_refines = outputs
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        centers, strides, lvl_ids = self._centers(featmap_sizes)
        points_lvl = jnp.log2(strides).astype(jnp.int32)
        cls_flat, init_flat, ref_flat = self._flat(outputs)
        init_img = self._points_to_imgspace(init_flat, centers, strides)
        ref_img = self._points_to_imgspace(ref_flat, centers, strides)

        tc = self.train_cfg or {}
        init_assigner = ConvexAssigner(**{
            k: v for k, v in dict(tc.get('init', {}).get(
                'assigner', {})).items() if k != 'type'})
        refine_assigner = MaxConvexIoUAssigner(**{
            k: v for k, v in dict(tc.get('refine', {}).get(
                'assigner', {})).items() if k != 'type'})

        def targets_single(gb, gl, gm, init_pts):
            gt_polys = obb2poly(gb, self.version)
            best_i, pos_i, _ = init_assigner(
                centers, points_lvl, gt_polys, gl, gm, self.num_classes)
            arg_r, pos_r, neg_r, labels_r = refine_assigner(
                jax.lax.stop_gradient(init_pts), gt_polys, gl, gm,
                self.num_classes)
            return (gt_polys[best_i], pos_i.astype(jnp.float32),
                    gt_polys[arg_r], pos_r.astype(jnp.float32),
                    (pos_r | neg_r).astype(jnp.float32), labels_r)

        (init_tgt, init_w, ref_tgt, ref_w, lw, labels) = jax.vmap(
            targets_single)(gt_bboxes, gt_labels, gt_mask, init_img)

        num_pos_i = jnp.maximum(init_w.sum(), 1.0)
        num_pos_r = jnp.maximum(ref_w.sum(), 1.0)

        b, n = init_img.shape[:2]
        loss_init = _build(LOSSES, dict(
            self.loss_bbox_init or dict(type='ConvexGIoULoss',
                                        loss_weight=0.375)))(
            init_img.reshape(b * n, -1), init_tgt.reshape(b * n, -1),
            weight=init_w.reshape(-1), avg_factor=num_pos_i)
        loss_refine = _build(LOSSES, dict(
            self.loss_bbox_refine or dict(type='ConvexGIoULoss',
                                          loss_weight=1.0)))(
            ref_img.reshape(b * n, -1), ref_tgt.reshape(b * n, -1),
            weight=ref_w.reshape(-1), avg_factor=num_pos_r)
        loss_cls = _build(LOSSES, dict(
            self.loss_cls or dict(type='FocalLoss')))(
            cls_flat, labels, weight=lw, avg_factor=num_pos_r)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_init,
                    loss_pts_refine=loss_refine)

    # ---- inference ----------------------------------------------------------
    def get_bboxes(self, outputs, img_shape=None, scale_factor=None,
                   rescale: bool = False, cfg=None):
        cls_scores, _, pts_refines = outputs
        cfg = cfg if cfg is not None else self.test_cfg
        nms_pre = int(cfg.get('nms_pre', 2000))
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        centers, strides, _ = self._centers(featmap_sizes)
        cls_flat, _, ref_flat = self._flat(outputs)
        ref_img = self._points_to_imgspace(ref_flat, centers, strides)

        def per_image(scores, pointsets):
            scores = jax.nn.sigmoid(scores)
            k = min(nms_pre, scores.shape[0])
            _, top_idx = jax.lax.top_k(scores.max(-1), k)
            sel_sets = pointsets[top_idx]
            polys = min_area_polygons(sel_sets)
            boxes = poly2obb(polys, self.version)
            sc = jnp.concatenate([scores[top_idx],
                                  jnp.zeros_like(scores[top_idx][:, :1])],
                                 -1)
            nms_cfg = cfg.get('nms', {'iou_thr': 0.1})
            return multiclass_nms_rotated(
                boxes, sc, score_thr=float(cfg.get('score_thr', 0.05)),
                iou_thr=float(nms_cfg.get('iou_thr', 0.1)),
                max_per_img=int(cfg.get('max_per_img', 2000)))

        return jax.vmap(per_image)(cls_flat, ref_img)


@HEADS.register_module()
class OrientedRepPointsHead(RotatedRepPointsHead):
    """Alias for the oriented variant (reference
    ``oriented_reppoints_head.py``; the APAA quality-assessment sampling is
    a round-2 refinement — base dynamics match RotatedRepPointsHead)."""
    pass


@HEADS.register_module()
class SAMRepPointsHead(RotatedRepPointsHead):
    """Alias for the SASM variant (reference ``sam_reppoints_head.py``)."""
    pass


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
