"""Rotated FCOS head (anchor-free).

Rebuilds reference ``dense_heads/rotated_fcos_head.py:17-667`` TPU-first: the
per-point target assignment (regress-range gating, min-area gt selection,
center sampling in the gt's rotated frame) is one fully-vectorized masked
computation over (num_points, num_gt) — no per-image python, no dynamic
shapes — and runs inside the jitted train step.

Supports the config surface of ``configs/rotated_fcos/*.py``: norm_on_bbox,
centerness_on_reg, center_sampling/radius, scale_angle, separate_angle
(+ CSL angle coder via ``CSLRFCOSHead`` config alias ``angle_coder``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.gather import take_rows
from ...core.anchors import MlvlPointGenerator
from ...core.coders import CSLCoder, DistanceAnglePointCoder
from ...ops.nms import multiclass_nms_rotated
from ...utils.registry import BBOX_CODERS, HEADS, LOSSES

INF = 1e8


class Scale(nn.Module):
    """Learnable per-level scalar (mmcv Scale)."""
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param('scale', nn.initializers.constant(self.init_value),
                       ())
        return x * s


@HEADS.register_module()
class RotatedFCOSHead(nn.Module):
    num_classes: int = 15
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple = ((-1, 64), (64, 128), (128, 256), (256, 512),
                             (512, INF))
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    norm_on_bbox: bool = False
    centerness_on_reg: bool = False
    separate_angle: bool = False
    scale_angle: bool = True
    bbox_coder: Optional[dict] = None
    h_bbox_coder: Optional[dict] = None
    angle_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    loss_centerness: Optional[dict] = None
    loss_angle: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    # ---- helpers --------------------------------------------------------
    @property
    def coder(self):
        cfg = dict(self.bbox_coder or dict(type='DistanceAnglePointCoder'))
        t = cfg.pop('type')
        cfg.pop('angle_version', None) and None
        version = (self.bbox_coder or {}).get('angle_version', 'le90')
        return DistanceAnglePointCoder(angle_range=version)

    @property
    def angle_coder_obj(self):
        if self.angle_coder is None:
            return None
        return BBOX_CODERS.build(dict(self.angle_coder))

    @property
    def prior_generator(self):
        return MlvlPointGenerator(strides=list(self.strides), offset=0.5)

    def _loss(self, cfg, default_type):
        return LOSSES.build(dict(cfg) if cfg else dict(type=default_type))

    # ---- network --------------------------------------------------------
    @nn.compact
    def __call__(self, feats):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        gn = [nn.GroupNorm(num_groups=32, dtype=self.dtype,
                           name=f'cls_gn_{i}')
              for i in range(self.stacked_convs)]
        gn_r = [nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f'reg_gn_{i}')
                for i in range(self.stacked_convs)]
        import math
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                           bias_init=bias_init, dtype=self.dtype,
                           name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype, name='conv_reg')
        angle_out = self.angle_coder_obj.encode_size \
            if self.separate_angle and self.angle_coder_obj else 1
        conv_angle = nn.Conv(angle_out, (3, 3), padding=[(1, 1)] * 2,
                             dtype=self.dtype, name='conv_angle')
        conv_centerness = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2,
                                  dtype=self.dtype, name='conv_centerness')

        cls_scores, bbox_preds, angle_preds, centernesses = [], [], [], []
        for lvl, x in enumerate(feats):
            c = x
            for conv, norm in zip(cls_convs, gn):
                c = nn.relu(norm(conv(c)))
            r = x
            for conv, norm in zip(reg_convs, gn_r):
                r = nn.relu(norm(conv(r)))
            cls_scores.append(conv_cls(c))
            bbox_pred = Scale(name=f'scale_{lvl}')(conv_reg(r))
            if self.norm_on_bbox:
                bbox_pred = nn.relu(bbox_pred)
                # at train time targets are stride-normalized; decode
                # multiplies back (loss/get_bboxes handle it)
            else:
                bbox_pred = jnp.exp(bbox_pred)
            bbox_preds.append(bbox_pred)
            ang = conv_angle(r)
            if self.scale_angle and not self.separate_angle:
                ang = Scale(name=f'scale_angle_{lvl}')(ang)
            angle_preds.append(ang)
            centernesses.append(conv_centerness(
                r if self.centerness_on_reg else c))
        return (tuple(cls_scores), tuple(bbox_preds), tuple(angle_preds),
                tuple(centernesses))

    # ---- targets --------------------------------------------------------
    def _targets_single(self, points, ranges, strides, gt_bboxes, gt_labels,
                        gt_mask):
        """points (N, 2); ranges (N, 2); strides (N,); gt (G, ...).

        Returns labels (N,), bbox_targets (N, 4), angle_targets (N,),
        pos (N,), matched gt index (N,).
        """
        gx, gy, gw, gh, ga = [gt_bboxes[:, i] for i in range(5)]
        areas = gw * gh                                       # (G,)
        cos_a, sin_a = jnp.cos(ga), jnp.sin(ga)
        dx = points[:, 0:1] - gx[None]                        # (N, G)
        dy = points[:, 1:2] - gy[None]
        ox = dx * cos_a[None] + dy * sin_a[None]
        oy = -dx * sin_a[None] + dy * cos_a[None]
        left = gw[None] / 2 + ox
        right = gw[None] / 2 - ox
        top = gh[None] / 2 + oy
        bottom = gh[None] / 2 - oy
        inside = (left > 0) & (right > 0) & (top > 0) & (bottom > 0)

        if self.center_sampling:
            radius = self.center_sample_radius * strides[:, None]   # (N, 1)
            cb_x = jnp.minimum(radius, gw[None] / 2)
            cb_y = jnp.minimum(radius, gh[None] / 2)
            inside_center = (jnp.abs(ox) < cb_x) & (jnp.abs(oy) < cb_y)
            inside = inside & inside_center

        max_reg = jnp.maximum(jnp.maximum(left, right),
                              jnp.maximum(top, bottom))      # (N, G)
        in_range = (max_reg >= ranges[:, 0:1]) & (max_reg <= ranges[:, 1:2])

        valid = inside & in_range & gt_mask[None]             # (N, G)
        cand_areas = jnp.where(valid, areas[None], INF)
        min_area = cand_areas.min(axis=1)
        matched = cand_areas.argmin(axis=1)                   # (N,)
        pos = min_area < INF

        take = lambda v: v[matched]
        labels = jnp.where(pos, take_rows(gt_labels, matched),
                           self.num_classes)
        idx = jnp.arange(points.shape[0])
        bbox_targets = jnp.stack([left[idx, matched], top[idx, matched],
                                  right[idx, matched],
                                  bottom[idx, matched]], -1)
        angle_targets = take(ga)
        return labels, bbox_targets, angle_targets, pos, matched

    def _flat_points(self, featmap_sizes):
        pts = self.prior_generator.grid_priors(featmap_sizes,
                                               with_stride=True)
        ranges = []
        strides = []
        for lvl, p in enumerate(pts):
            n = p.shape[0]
            ranges.append(jnp.tile(jnp.asarray(
                self.regress_ranges[lvl], jnp.float32)[None], (n, 1)))
            strides.append(jnp.full((n,), self.strides[lvl], jnp.float32))
        return (jnp.concatenate([p[:, :2] for p in pts], 0),
                jnp.concatenate(ranges, 0), jnp.concatenate(strides, 0))

    @staticmethod
    def centerness_target(bbox_targets):
        """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b)))."""
        lr = bbox_targets[..., [0, 2]]
        tb = bbox_targets[..., [1, 3]]
        c = (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6)) * \
            (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6))
        return jnp.sqrt(jnp.clip(c, 0))

    # ---- loss -----------------------------------------------------------
    def loss(self, outputs, gt_bboxes, gt_labels, gt_mask):
        cls_scores, bbox_preds, angle_preds, centernesses = outputs
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        points, ranges, strides = self._flat_points(featmap_sizes)
        b = cls_scores[0].shape[0]

        labels, bt, at, pos, _ = jax.vmap(
            lambda gb, gl, gm: self._targets_single(
                points, ranges, strides, gb, gl, gm)
        )(gt_bboxes, gt_labels, gt_mask)

        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.num_classes) for s in cls_scores], 1)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)
        ang_flat = jnp.concatenate(
            [a.reshape(b, -1, a.shape[-1]) for a in angle_preds], 1)
        ctr_flat = jnp.concatenate(
            [c.reshape(b, -1) for c in centernesses], 1)

        if self.norm_on_bbox:
            box_flat = box_flat * strides[None, :, None]

        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        loss_cls = self._loss(self.loss_cls, 'FocalLoss')(
            cls_flat, labels, weight=jnp.ones_like(labels, jnp.float32),
            avg_factor=num_pos)

        pw = pos.astype(jnp.float32)
        ctr_targets = self.centerness_target(bt)
        ctr_denom = jnp.maximum((ctr_targets * pw).sum(), 1e-6)

        if self.separate_angle:
            # HBB IoU on (l,t,r,b) + separate angle loss
            hcoder = DistanceAnglePointCoder(angle_range='le90')
            zeros = jnp.zeros_like(ang_flat[..., :1])
            pred_box = hcoder.decode(
                points[None], jnp.concatenate([box_flat, zeros], -1))
            tgt_box = hcoder.decode(
                points[None], jnp.concatenate([bt, zeros], -1))
            loss_bbox = self._loss(self.loss_bbox, 'RotatedIoULoss')(
                pred_box, tgt_box, weight=pw * ctr_targets,
                avg_factor=ctr_denom)
            acoder = self.angle_coder_obj
            if acoder is not None:
                at_enc = acoder.encode(at[..., None])
                loss_angle = self._loss(self.loss_angle, 'SmoothFocalLoss')(
                    ang_flat, at_enc, weight=pw, avg_factor=num_pos)
            else:
                loss_angle = self._loss(self.loss_angle, 'L1Loss')(
                    ang_flat[..., 0], at, weight=pw, avg_factor=num_pos)
            losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                          loss_angle=loss_angle)
        else:
            pred_full = jnp.concatenate([box_flat, ang_flat[..., :1]], -1)
            tgt_full = jnp.concatenate([bt, at[..., None]], -1)
            pred_box = self.coder.decode(points[None], pred_full)
            tgt_box = self.coder.decode(points[None], tgt_full)
            loss_bbox = self._loss(self.loss_bbox, 'RotatedIoULoss')(
                pred_box, tgt_box, weight=pw * ctr_targets,
                avg_factor=ctr_denom)
            losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

        loss_ctr = self._loss(self.loss_centerness, 'CrossEntropyLoss')(
            ctr_flat[..., None], ctr_targets[..., None], weight=pw,
            avg_factor=num_pos)
        losses['loss_centerness'] = loss_ctr
        return losses

    # ---- inference ------------------------------------------------------
    def get_bboxes(self, outputs, img_shape=None, scale_factor=None,
                   rescale: bool = False, cfg=None):
        cls_scores, bbox_preds, angle_preds, centernesses = outputs
        cfg = cfg if cfg is not None else self.test_cfg
        nms_pre = int(cfg.get('nms_pre', 1000))
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        level_points = self.prior_generator.grid_priors(featmap_sizes)

        def per_image(cls_list, box_list, ang_list, ctr_list):
            cand_boxes, cand_scores, cand_ctr = [], [], []
            for lvl, (scores, deltas, angles, ctr, pts) in enumerate(zip(
                    cls_list, box_list, ang_list, ctr_list, level_points)):
                # Rank candidates on the raw (possibly bf16) maps; sigmoid /
                # f32 cast / stride scaling / angle decode all run on the k
                # selected rows only — this keeps the full-map work to one
                # max-reduce per level (see rotated_anchor_head.get_bboxes).
                logits = scores.reshape(-1, self.num_classes)
                ctr_l = ctr.reshape(-1)
                deltas = deltas.reshape(-1, 4)
                angles = angles.reshape(-1, angles.shape[-1])
                n = logits.shape[0]
                k = min(nms_pre, n) if nms_pre > 0 else n
                rank = (jax.nn.sigmoid(logits.max(-1).astype(jnp.float32)) *
                        jax.nn.sigmoid(ctr_l.astype(jnp.float32)))
                from ...ops.nms import topk_candidates
                _, top_idx = topk_candidates(
                    rank, k, exact=not bool(cfg.get('approx_topk', False)))
                sel_scores = jax.nn.sigmoid(
                    logits[top_idx].astype(jnp.float32))
                sel_ctr = jax.nn.sigmoid(ctr_l[top_idx].astype(jnp.float32))
                sel_deltas = deltas[top_idx].astype(jnp.float32)
                if self.norm_on_bbox:
                    sel_deltas = sel_deltas * self.strides[lvl]
                sel_angles = angles[top_idx].astype(jnp.float32)
                if self.separate_angle and self.angle_coder_obj is not None:
                    theta = self.angle_coder_obj.decode(sel_angles)[:, None]
                else:
                    theta = sel_angles[:, :1]
                boxes = self.coder.decode(
                    pts[top_idx], jnp.concatenate([sel_deltas, theta], -1),
                    max_shape=img_shape)
                cand_boxes.append(boxes)
                cand_scores.append(sel_scores)
                cand_ctr.append(sel_ctr)
            boxes = jnp.concatenate(cand_boxes, 0)
            scores = jnp.concatenate(cand_scores, 0)
            ctrs = jnp.concatenate(cand_ctr, 0)
            if rescale and scale_factor is not None:
                sf = jnp.asarray(scale_factor)
                boxes = boxes.at[:, :4].divide(
                    jnp.concatenate([sf[:2], sf[:2]]))
            scores = jnp.concatenate(
                [scores, jnp.zeros_like(scores[:, :1])], -1)
            nms_cfg = cfg.get('nms', {'iou_thr': 0.1})
            return multiclass_nms_rotated(
                boxes, scores, score_thr=float(cfg.get('score_thr', 0.05)),
                iou_thr=float(nms_cfg.get('iou_thr', 0.1)),
                max_per_img=int(cfg.get('max_per_img', 2000)),
                max_candidates=int(cfg.get('max_candidates', 2000)),
                score_factors=ctrs)

        return jax.vmap(per_image)(list(cls_scores), list(bbox_preds),
                                   list(angle_preds), list(centernesses))


@HEADS.register_module()
class CSLRFCOSHead(RotatedFCOSHead):
    """FCOS + CSL angle classification (reference
    ``csl_rotated_fcos_head.py``): config sets separate_angle=True and an
    ``angle_coder`` of type CSLCoder."""
    pass
