"""Oriented RPN head (reference ``dense_heads/oriented_rpn_head.py:15-``,
``rotated_rpn_head.py``).

HBB anchors regress 6-param midpoint offsets; assignment runs on the gts'
circumscribed HBBs (``oriented_rpn_head.py:76-82``); proposals are decoded
OBBs filtered by an axis-aligned NMS over their circum boxes
(``batched_nms`` in the reference). Fully batched + static: proposals come
out as a fixed (B, max_num, 6) padded tensor with a validity mask.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.gather import take_rows
from ...core.assigners import (MaxIoUAssigner, random_sample_masks,
                               rng_from_gt)
from ...core.coders import MidpointOffsetCoder
from ...ops.boxes import hbb2obb, obb2xyxy
from ...ops.nms import NEG_INF, hbb_overlaps, nms_hbb, topk_candidates
from ...utils.registry import (BBOX_CODERS, HEADS, LOSSES, PRIOR_GENERATORS)
from .rotated_anchor_head import _build


@HEADS.register_module()
class OrientedRPNHead(nn.Module):
    in_channels: int = 256
    feat_channels: int = 256
    num_classes: int = 1          # class-agnostic objectness
    anchor_generator: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    version: str = 'le90'
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
        return _build(BBOX_CODERS, dict(
            self.bbox_coder or dict(type='MidpointOffsetCoder',
                                    angle_range=self.version)))

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
        reg_out = nn.Conv(num_anchors * 6, (1, 1), dtype=self.dtype,
                          name='rpn_reg')
        cls_scores, bbox_preds = [], []
        for x in feats:
            t = nn.relu(conv(x))
            cls_scores.append(cls_out(t))
            bbox_preds.append(reg_out(t))
        return tuple(cls_scores), tuple(bbox_preds)

    # ---- anchors (as xyxy HBBs) -----------------------------------------
    def _flat_hbb_anchors(self, featmap_sizes):
        levels = self.prior_generator.grid_priors(featmap_sizes)
        rot = jnp.concatenate(levels, 0)          # (N, 5) theta=0
        return obb2xyxy(rot, self.version)        # (N, 4)

    # ---- loss ------------------------------------------------------------
    def loss(self, outputs, gt_bboxes, gt_labels, gt_mask):
        cls_scores, bbox_preds = outputs
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        anchors_xyxy = self._flat_hbb_anchors(featmap_sizes)
        anchors_rot = hbb2obb(anchors_xyxy, self.version)
        b = cls_scores[0].shape[0]

        # Reference RPN samples 256 anchors/img at pos_fraction=0.5
        # (RandomSampler in the rpn train_cfg) — without it, BCE averaged
        # over ~1e5 anchors drowns the ~10-100 positives.
        samp = dict((self.train_cfg or {}).get('sampler') or {})
        samp_num = int(samp.get('num', 256))
        samp_frac = float(samp.get('pos_fraction', 0.5))
        samp_ub = int(samp.get('neg_pos_ub', -1))

        def targets_single(gb, gl, gm):
            # assign on circumscribed HBBs (as rotated boxes theta-canonical)
            from ...ops.boxes import obb2hbb
            gt_hbb = obb2hbb(gb, self.version)
            assign = self.assigner(anchors_rot, gt_hbb,
                                   jnp.zeros_like(gl), gm)
            pos = assign.assigned_gt_inds >= 0
            neg = assign.assigned_gt_inds == -1
            pos, neg = random_sample_masks(pos, neg, samp_num, samp_frac,
                                           rng_from_gt(gb),
                                           neg_pos_ub=samp_ub)
            safe = jnp.clip(assign.assigned_gt_inds, 0, None)
            deltas = self.coder.encode(anchors_xyxy, take_rows(gb, safe))
            deltas = jnp.where(pos[:, None], deltas, 0.0)
            labels = jnp.where(pos, 0, 1)  # 0 = fg for BCE objectness
            return labels, (pos | neg).astype(jnp.float32), deltas, \
                pos.astype(jnp.float32), pos

        labels, lw, bt, bw, pos = jax.vmap(targets_single)(
            gt_bboxes, gt_labels, gt_mask)

        cls_flat = jnp.concatenate(
            [s.reshape(b, -1) for s in cls_scores], 1)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 6) for p in bbox_preds], 1)

        # mmdet RPN normalization: both losses average over the total
        # sampled count (~256/img), not the dense anchor count.
        num_samples = jnp.maximum(lw.sum(), 1.0)
        cls_loss_fn = _build(LOSSES, dict(
            self.loss_cls or dict(type='CrossEntropyLoss', use_sigmoid=True,
                                  loss_weight=1.0)))
        fg = (labels == 0).astype(cls_flat.dtype)
        loss_cls = cls_loss_fn(cls_flat[..., None], fg[..., None],
                               weight=lw, avg_factor=num_samples)
        bbox_loss_fn = _build(LOSSES, dict(
            self.loss_bbox or dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                                   loss_weight=1.0)))
        loss_bbox = bbox_loss_fn(box_flat, bt, weight=bw,
                                 avg_factor=num_samples)
        return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_bbox)

    # ---- proposals --------------------------------------------------------
    def get_proposals(self, outputs, cfg=None, max_candidates: int = 4096):
        """Decode + HBB-NMS -> (B, max_num, 5) rotated proposals,
        (B, max_num) scores, (B, max_num) valid."""
        cls_scores, bbox_preds = outputs
        cfg = cfg if cfg is not None else (self.test_cfg or {})
        nms_pre = int(cfg.get('nms_pre', 2000))
        max_num = int(cfg.get('max_per_img', cfg.get('max_num', 2000)))
        nms_cfg = cfg.get('nms', {})
        iou_thr = float(nms_cfg.get('iou_thr', nms_cfg.get('iou_threshold', 0.8)))
        min_bbox_size = float(cfg.get('min_bbox_size', 0))

        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        level_anchors = self.prior_generator.grid_priors(featmap_sizes)

        def per_image(cls_list, box_list):
            cand_boxes, cand_scores = [], []
            for scores, deltas, anchors in zip(cls_list, box_list,
                                               level_anchors):
                scores = jax.nn.sigmoid(scores.reshape(-1))
                deltas = deltas.reshape(-1, 6)
                n = scores.shape[0]
                k = min(nms_pre, n)
                top_s, top_i = topk_candidates(scores, k)
                anchors_xyxy = obb2xyxy(anchors[top_i], self.version)
                obbs = self.coder.decode(anchors_xyxy, deltas[top_i])
                cand_boxes.append(obbs)
                cand_scores.append(top_s)
            boxes = jnp.concatenate(cand_boxes, 0)
            scores = jnp.concatenate(cand_scores, 0)
            # size filter
            ok = (boxes[:, 2] >= min_bbox_size) & \
                 (boxes[:, 3] >= min_bbox_size)
            scores = jnp.where(ok, scores, NEG_INF)
            # cap NMS problem size
            k = min(max_candidates, scores.shape[0])
            top_s, top_i = topk_candidates(scores, k)
            top_b = boxes[top_i]
            valid = top_s > NEG_INF / 2
            hbbs = obb2xyxy(top_b, self.version)
            keep, _ = nms_hbb(jnp.where(valid[:, None], hbbs, 0.0),
                              top_s, iou_thr, valid_mask=valid)
            kept_scores = jnp.where(keep, top_s, NEG_INF)
            out_s, out_i = jax.lax.top_k(kept_scores, max_num)
            out_valid = out_s > NEG_INF / 2
            out_b = jnp.where(out_valid[:, None], top_b[out_i], 0.0)
            return out_b, jnp.where(out_valid, out_s, 0.0), out_valid

        return jax.vmap(per_image)(list(cls_scores), list(bbox_preds))
