"""Oriented standard RoI head.

Reference ``roi_heads/oriented_standard_roi_head.py:10-188`` +
``rotate_standard_roi_head.py``: proposals -> assign (rotated MaxIoU) ->
random sample (512 @ 0.25 pos) -> RoIAlignRotated -> bbox head loss; at test
time RoIAlign over all proposals -> decode -> multiclass rotated NMS.

TPU rework: sampling produces a fixed-size roi set by ranking (pos first by
random key, then negs), so the RoIAlign + FC compute has a static (B, 512)
shape inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.assigners import MaxIoUAssigner
from ...ops.nms import multiclass_nms_rotated
from ...ops.roi_align_rotated import roi_align_rotated
from ...utils.registry import HEADS
from ..dense_heads.rotated_anchor_head import _build


@HEADS.register_module()
class OrientedStandardRoIHead(nn.Module):
    bbox_roi_extractor: Optional[dict] = None
    bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    version: str = 'le90'
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_bbox_head(self):
        cfg = dict(self.bbox_head or dict(type='RotatedShared2FCBBoxHead'))
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = self.train_cfg
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype)

    @property
    def roi_cfg(self):
        cfg = dict(self.bbox_roi_extractor or {})
        layer = cfg.get('roi_layer', {})
        out = int(layer.get('out_size', layer.get('output_size', 7)))
        ratio = int(layer.get('sample_num', layer.get('sampling_ratio', 2)))
        return dict(
            out_size=(out,) * 2,
            sampling_ratio=max(ratio, 1),
            finest_scale=float(cfg.get('finest_scale', 56)),
            strides=cfg.get('featmap_strides', [4, 8, 16, 32]))

    @property
    def assigner(self):
        cfg = dict((self.train_cfg or {}).get('assigner') or dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
            min_pos_iou=0.5, match_low_quality=False))
        cfg.pop('iou_calculator', None)
        return MaxIoUAssigner(**{k: v for k, v in cfg.items()
                                 if k != 'type'})

    # ---- network: pooled feats -> head outputs ---------------------------
    @nn.compact
    def __call__(self, feats, rois, use_pallas: bool = False):
        """feats: FPN levels (first 4 used); rois (B, R, 5).

        ``use_pallas``: route the align through the Mosaic window kernel
        (``ops/roi_align_pallas.py``) — inference-only (no VJP; the
        detectors pass ``not train``), 3x the gather path at R=2000, and
        only when the backend can compile Mosaic kernels."""
        rc = self.roi_cfg
        layer_type = (self.bbox_roi_extractor or {}).get(
            'roi_layer', {}).get('type', 'RoIAlignRotated')
        if layer_type == 'RiRoIAlignRotated':
            from ..backbones.re_resnet import ri_roi_align_rotated
            pooled = ri_roi_align_rotated(
                feats[:len(rc['strides'])], rois, rc['out_size'],
                [1.0 / s for s in rc['strides']], rc['sampling_ratio'])
        else:
            from ...ops.iou_pallas import pallas_available
            if (use_pallas and pallas_available()
                    and tuple(rc['out_size']) == (7, 7)
                    and rc['sampling_ratio'] == 2):
                from ...ops.roi_align_pallas import roi_align_rotated_pallas
                pooled = roi_align_rotated_pallas(
                    tuple(feats[:len(rc['strides'])]), rois, (7, 7),
                    tuple(1.0 / s for s in rc['strides']), 2,
                    rc['finest_scale'])
            else:
                pooled = roi_align_rotated(
                    feats[:len(rc['strides'])], rois, rc['out_size'],
                    [1.0 / s for s in rc['strides']],
                    rc['sampling_ratio'], rc['finest_scale'])
        cfg = dict(self.bbox_head or dict(type='RotatedShared2FCBBoxHead'))
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = self.train_cfg
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype, name='bbox_head')(pooled)

    # ---- sampling ----------------------------------------------------------
    @nn.nowrap
    def sample_rois(self, proposals, prop_valid, gt_bboxes, gt_labels,
                    gt_mask, rng):
        """Assign + random-sample proposals into a fixed (B, num) roi set.

        Returns rois (B, num, 5), labels (B, num), label_weights,
        bbox_targets (B, num, 5), bbox_weights (B, num), num_pos (scalar).
        """
        cfg = (self.train_cfg or {}).get('sampler') or {}
        num = int(cfg.get('num', 512))
        pos_fraction = float(cfg.get('pos_fraction', 0.25))
        add_gt = bool(cfg.get('add_gt_as_proposals', True))
        head = self.make_bbox_head()
        num_classes = head.num_classes

        def single(props, pvalid, gb, gl, gm, key):
            if add_gt:
                props = jnp.concatenate([gb, props], 0)
                pvalid = jnp.concatenate([gm, pvalid], 0)
            assign = self.assigner(props, gb, gl, gm)
            pos = (assign.assigned_gt_inds >= 0) & pvalid
            neg = (assign.assigned_gt_inds == -1) & pvalid

            k1, k2 = jax.random.split(key)
            max_pos = int(num * pos_fraction)
            pos_key = jnp.where(pos, jax.random.uniform(k1, pos.shape), -1.)
            pos_rank = jnp.argsort(jnp.argsort(-pos_key))
            pos_sel = pos & (pos_rank < max_pos)
            n_pos = jnp.minimum(pos.sum(), max_pos)
            neg_key = jnp.where(neg, jax.random.uniform(k2, neg.shape), -1.)
            neg_rank = jnp.argsort(jnp.argsort(-neg_key))
            neg_sel = neg & (neg_rank < num - n_pos)

            # order: positives first, then negatives, then padding
            order_key = jnp.where(pos_sel, 2.0 + pos_key,
                                  jnp.where(neg_sel, 1.0 + neg_key, 0.0))
            order = jnp.argsort(-order_key)[:num]
            sel = lambda v: v[order]
            rois = sel(props)
            sel_pos = sel(pos_sel)
            sel_neg = sel(neg_sel)
            safe = jnp.clip(sel(assign.assigned_gt_inds), 0, None)
            matched = gb[safe]
            targets = head.coder.encode(rois, matched)
            targets = jnp.where(sel_pos[:, None], targets, 0.0)
            labels = jnp.where(sel_pos, sel(assign.labels), num_classes)
            lw = (sel_pos | sel_neg).astype(jnp.float32)
            bw = sel_pos.astype(jnp.float32)
            return rois, labels, lw, targets, bw

        b = proposals.shape[0]
        keys = jax.random.split(rng, b)
        rois, labels, lw, bt, bw = jax.vmap(single)(
            proposals, prop_valid, gt_bboxes, gt_labels, gt_mask, keys)
        return rois, labels, lw, bt, bw, jnp.maximum(bw.sum(), 1.0)

    # ---- inference -----------------------------------------------------------
    @nn.nowrap
    def get_bboxes(self, rois, cls_score, bbox_pred, cfg=None,
                   img_shape=None):
        cfg = cfg if cfg is not None else (self.test_cfg or {})
        head = self.make_bbox_head()
        scores = jax.nn.softmax(cls_score, axis=-1)      # (B, R, C+1)
        decoded = head.decode_bboxes(rois, bbox_pred, img_shape)

        def per_image(bx, sc):
            if bx.ndim == 3:                       # (R, C, 5) -> (R, C*5)
                bx = bx.reshape(bx.shape[0], -1)
            nms_cfg = cfg.get('nms', {'iou_thr': 0.1})
            return multiclass_nms_rotated(
                bx, sc, score_thr=float(cfg.get('score_thr', 0.05)),
                iou_thr=float(nms_cfg.get('iou_thr', 0.1)),
                max_per_img=int(cfg.get('max_per_img', 2000)),
                max_candidates=int(cfg.get('max_candidates', 2000)))

        return jax.vmap(per_image)(decoded, scores)


@HEADS.register_module()
class RotatedStandardRoIHead(OrientedStandardRoIHead):
    """Rotated Faster R-CNN's roi head (reference
    ``roi_heads/rotate_standard_roi_head.py``): HBB proposals from the
    standard RPN, assignment on the gts' CIRCUMSCRIBED horizontal boxes
    with axis-aligned IoU (``:129-133`` obb2xyxy), axis-aligned RoIAlign
    pooling, and rotated-box regression targets via DeltaXYWHAHBBoxCoder
    against the original rotated gts.

    TPU formulation: HBB proposals travel as theta-0 rotated boxes, so the
    axis-aligned IoU and RoIAlign are the existing rotated kernels at
    theta=0 — one code path, no separate aligned kernel.
    """

    @staticmethod
    def _as_theta0(rois):
        """(…, 4) xyxy -> (…, 5) theta-0 rotated boxes (pass-through if
        already 5-column)."""
        if rois.shape[-1] == 5:
            return rois
        cx = (rois[..., 0] + rois[..., 2]) * 0.5
        cy = (rois[..., 1] + rois[..., 3]) * 0.5
        w = jnp.clip(rois[..., 2] - rois[..., 0], 0)
        h = jnp.clip(rois[..., 3] - rois[..., 1], 0)
        return jnp.stack([cx, cy, w, h, jnp.zeros_like(cx)], -1)

    def __call__(self, feats, rois, use_pallas: bool = False):
        # not @nn.compact: parameter creation happens in the parent's
        # compact __call__ (flax allows one compact frame per module)
        return super().__call__(feats, self._as_theta0(rois), use_pallas)

    @nn.nowrap
    def sample_rois(self, proposals, prop_valid, gt_bboxes, gt_labels,
                    gt_mask, rng):
        from ...ops.boxes import obb2hbb
        cfg = (self.train_cfg or {}).get('sampler') or {}
        num = int(cfg.get('num', 512))
        pos_fraction = float(cfg.get('pos_fraction', 0.25))
        add_gt = bool(cfg.get('add_gt_as_proposals', True))
        head = self.make_bbox_head()
        num_classes = head.num_classes
        proposals = self._as_theta0(proposals)

        def single(props, pvalid, gb, gl, gm, key):
            gt_hbb = obb2hbb(gb, self.version)      # theta-0 circum boxes
            if add_gt:
                props = jnp.concatenate([gt_hbb, props], 0)
                pvalid = jnp.concatenate([gm, pvalid], 0)
            # axis-aligned IoU assignment (theta-0 boxes on both sides)
            assign = self.assigner(props, gt_hbb, gl, gm)
            pos = (assign.assigned_gt_inds >= 0) & pvalid
            neg = (assign.assigned_gt_inds == -1) & pvalid

            k1, k2 = jax.random.split(key)
            max_pos = int(num * pos_fraction)
            pos_key = jnp.where(pos, jax.random.uniform(k1, pos.shape), -1.)
            pos_rank = jnp.argsort(jnp.argsort(-pos_key))
            pos_sel = pos & (pos_rank < max_pos)
            n_pos = jnp.minimum(pos.sum(), max_pos)
            neg_key = jnp.where(neg, jax.random.uniform(k2, neg.shape), -1.)
            neg_rank = jnp.argsort(jnp.argsort(-neg_key))
            neg_sel = neg & (neg_rank < num - n_pos)

            order_key = jnp.where(pos_sel, 2.0 + pos_key,
                                  jnp.where(neg_sel, 1.0 + neg_key, 0.0))
            order = jnp.argsort(-order_key)[:num]
            rois = props[order]
            sel_pos = pos_sel[order]
            sel_neg = neg_sel[order]
            safe = jnp.clip(assign.assigned_gt_inds[order], 0, None)
            # regression targets against the ORIGINAL rotated gts
            targets = head.coder.encode(rois, gb[safe])
            targets = jnp.where(sel_pos[:, None], targets, 0.0)
            labels = jnp.where(sel_pos, assign.labels[order], num_classes)
            lw = (sel_pos | sel_neg).astype(jnp.float32)
            bw = sel_pos.astype(jnp.float32)
            return rois, labels, lw, targets, bw

        b = proposals.shape[0]
        keys = jax.random.split(rng, b)
        rois, labels, lw, bt, bw = jax.vmap(single)(
            proposals, prop_valid, gt_bboxes, gt_labels, gt_mask, keys)
        return rois, labels, lw, bt, bw, jnp.maximum(bw.sum(), 1.0)

    @nn.nowrap
    def get_bboxes(self, rois, cls_score, bbox_pred, cfg=None,
                   img_shape=None):
        return super().get_bboxes(self._as_theta0(rois), cls_score,
                                  bbox_pred, cfg=cfg, img_shape=img_shape)
