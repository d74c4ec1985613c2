"""Rotated RPN head (HBB proposals).

Reference ``dense_heads/rotated_rpn_head.py``: a standard 4-param-delta RPN
over HBB anchors; gts are assigned on their circumscribed HBBs; proposals
are axis-aligned (x1,y1,x2,y2) and consumed by the GV / RoI-Transformer /
Rotated Faster R-CNN roi heads. Same static-shape design as
:class:`OrientedRPNHead`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.gather import take_rows
from ...core.assigners import (MaxIoUAssigner, random_sample_masks,
                               rng_from_gt)
from ...core.coders import DeltaXYWHBBoxCoder
from ...ops.boxes import hbb2obb, obb2hbb, obb2xyxy
from ...ops.nms import NEG_INF, nms_hbb, topk_candidates
from ...utils.registry import HEADS, LOSSES, PRIOR_GENERATORS
from .rotated_anchor_head import _build


@HEADS.register_module()
class RotatedRPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    version: str = 'le90'
    anchor_generator: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def prior_generator(self):
        cfg = dict(self.anchor_generator or dict(
            type='RotatedAnchorGenerator', scales=[8],
            ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64]))
        cfg['type'] = 'RotatedAnchorGenerator'
        return _build(PRIOR_GENERATORS, cfg)

    @property
    def coder(self):
        cfg = dict(self.bbox_coder or dict(type='DeltaXYWHBBoxCoder'))
        cfg.pop('type', None)
        cfg.pop('angle_range', None)
        return DeltaXYWHBBoxCoder(**cfg)

    @property
    def assigner(self):
        cfg = dict((self.train_cfg or {}).get('assigner') or dict(
            type='MaxIoUAssigner', pos_iou_thr=0.7, neg_iou_thr=0.3,
            min_pos_iou=0.3))
        cfg.pop('iou_calculator', None)
        return MaxIoUAssigner(**{k: v for k, v in cfg.items()
                                 if k != 'type'})

    @nn.compact
    def __call__(self, feats):
        num_anchors = self.prior_generator.num_base_anchors[0]
        conv = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name='rpn_conv')
        cls_out = nn.Conv(num_anchors, (1, 1), dtype=self.dtype,
                          name='rpn_cls')
        reg_out = nn.Conv(num_anchors * 4, (1, 1), dtype=self.dtype,
                          name='rpn_reg')
        cls_scores, bbox_preds = [], []
        for x in feats:
            t = nn.relu(conv(x))
            cls_scores.append(cls_out(t))
            bbox_preds.append(reg_out(t))
        return tuple(cls_scores), tuple(bbox_preds)

    def _flat_anchors_xyxy(self, featmap_sizes):
        levels = self.prior_generator.grid_priors(featmap_sizes)
        return obb2xyxy(jnp.concatenate(levels, 0), self.version)

    def loss(self, outputs, gt_bboxes, gt_labels, gt_mask):
        cls_scores, bbox_preds = outputs
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        anchors_xyxy = self._flat_anchors_xyxy(featmap_sizes)
        anchors_rot = hbb2obb(anchors_xyxy, self.version)
        b = cls_scores[0].shape[0]

        # 256-anchor random sampling (reference rpn train_cfg RandomSampler)
        samp = dict((self.train_cfg or {}).get('sampler') or {})
        samp_num = int(samp.get('num', 256))
        samp_frac = float(samp.get('pos_fraction', 0.5))
        samp_ub = int(samp.get('neg_pos_ub', -1))

        def targets_single(gb, gl, gm):
            gt_hbb = obb2hbb(gb, self.version)
            assign = self.assigner(anchors_rot, gt_hbb,
                                   jnp.zeros_like(gl), gm)
            pos = assign.assigned_gt_inds >= 0
            neg = assign.assigned_gt_inds == -1
            pos, neg = random_sample_masks(pos, neg, samp_num, samp_frac,
                                           rng_from_gt(gb),
                                           neg_pos_ub=samp_ub)
            safe = jnp.clip(assign.assigned_gt_inds, 0, None)
            gt_xyxy = obb2xyxy(gb, self.version)
            deltas = self.coder.encode(anchors_xyxy,
                                       take_rows(gt_xyxy, safe))
            deltas = jnp.where(pos[:, None], deltas, 0.0)
            return jnp.where(pos, 0, 1), (pos | neg).astype(jnp.float32), \
                deltas, pos.astype(jnp.float32), pos

        labels, lw, bt, bw, pos = jax.vmap(targets_single)(
            gt_bboxes, gt_labels, gt_mask)
        cls_flat = jnp.concatenate([s.reshape(b, -1) for s in cls_scores], 1)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)

        num_samples = jnp.maximum(lw.sum(), 1.0)
        fg = (labels == 0).astype(cls_flat.dtype)
        loss_cls = _build(LOSSES, dict(
            self.loss_cls or dict(type='CrossEntropyLoss',
                                  use_sigmoid=True)))(
            cls_flat[..., None], fg[..., None], weight=lw,
            avg_factor=num_samples)
        loss_bbox = _build(LOSSES, dict(
            self.loss_bbox or dict(type='SmoothL1Loss', beta=1.0 / 9.0)))(
            box_flat, bt, weight=bw, avg_factor=num_samples)
        return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_bbox)

    def get_proposals(self, outputs, cfg=None, max_candidates: int = 4096):
        """-> hbb proposals (B, max_num, 4), scores, valid."""
        cls_scores, bbox_preds = outputs
        cfg = cfg if cfg is not None else (self.test_cfg or {})
        nms_pre = int(cfg.get('nms_pre', 2000))
        max_num = int(cfg.get('max_per_img', cfg.get('max_num', 2000)))
        nms_cfg = cfg.get('nms', {})
        iou_thr = float(nms_cfg.get('iou_thr', nms_cfg.get('iou_threshold', 0.7)))
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        level_anchors = self.prior_generator.grid_priors(featmap_sizes)

        def per_image(cls_list, box_list):
            cand_boxes, cand_scores = [], []
            for scores, deltas, anchors in zip(cls_list, box_list,
                                               level_anchors):
                scores = jax.nn.sigmoid(scores.reshape(-1))
                deltas = deltas.reshape(-1, 4)
                k = min(nms_pre, scores.shape[0])
                top_s, top_i = topk_candidates(scores, k)
                anchors_xyxy = obb2xyxy(anchors[top_i], self.version)
                cand_boxes.append(self.coder.decode(anchors_xyxy,
                                                    deltas[top_i]))
                cand_scores.append(top_s)
            boxes = jnp.concatenate(cand_boxes, 0)
            scores = jnp.concatenate(cand_scores, 0)
            k = min(max_candidates, scores.shape[0])
            top_s, top_i = topk_candidates(scores, k)
            top_b = boxes[top_i]
            valid = top_s > NEG_INF / 2
            keep, _ = nms_hbb(jnp.where(valid[:, None], top_b, 0.0), top_s,
                              iou_thr, valid_mask=valid)
            kept = jnp.where(keep, top_s, NEG_INF)
            out_s, out_i = jax.lax.top_k(kept, max_num)
            out_valid = out_s > NEG_INF / 2
            out_b = jnp.where(out_valid[:, None], top_b[out_i], 0.0)
            return out_b, jnp.where(out_valid, out_s, 0.0), out_valid

        return jax.vmap(per_image)(list(cls_scores), list(bbox_preds))
