"""Gliding Vertex and RoI-Transformer roi heads.

Reference: ``roi_heads/gv_ratio_roi_head.py`` + ``bbox_heads/gv_bbox_head.py
:17`` (4 branches: cls / hbb-deltas / gliding fix / rectangular-ness ratio)
and ``roi_heads/roi_trans_roi_head.py:14-400`` (cascade: stage-0 horizontal
RoIAlign on HBB proposals -> rbbox; stage-1 RoIAlignRotated refine).

Horizontal RoIAlign reuses the rotated kernel with theta=0 (exactly
equivalent); the cascade runs as one jitted program with fixed-size sampled
roi sets per stage.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.assigners import MaxIoUAssigner
from ...core.coders import (DeltaXYWHAHBBoxCoder, DeltaXYWHAOBBoxCoder,
                            DeltaXYWHBBoxCoder, GVFixCoder, GVRatioCoder)
from ...ops.boxes import hbb2obb, obb2hbb, obb2xyxy, poly2obb
from ...ops.nms import multiclass_nms_rotated
from ...ops.roi_align_rotated import roi_align_rotated


def _align(feats, rois, strides, use_pallas=False):
    """RoIAlignRotated, routed through the Mosaic window kernel at
    inference when the backend supports it (ops/roi_align_pallas.py —
    inference-only: no VJP)."""
    from ...ops.iou_pallas import pallas_available
    if use_pallas and pallas_available():
        from ...ops.roi_align_pallas import roi_align_rotated_pallas
        return roi_align_rotated_pallas(
            tuple(feats[:len(strides)]), rois, (7, 7),
            tuple(1.0 / s for s in strides), 2)
    return roi_align_rotated(feats[:len(strides)], rois, (7, 7),
                             [1.0 / s for s in strides], 2)
from ...utils.registry import HEADS, LOSSES
from ..dense_heads.rotated_anchor_head import _build


def hbb_to_rot(hbbs):
    """(..., 4) xyxy -> (..., 5) theta=0 rotated form for the RoI kernel."""
    cx = (hbbs[..., 0] + hbbs[..., 2]) * 0.5
    cy = (hbbs[..., 1] + hbbs[..., 3]) * 0.5
    w = hbbs[..., 2] - hbbs[..., 0]
    h = hbbs[..., 3] - hbbs[..., 1]
    return jnp.stack([cx, cy, w, h, jnp.zeros_like(cx)], -1)


def _sample_hbb_rois(assigner, proposals_xyxy, pvalid, gt_bboxes, gt_labels,
                     gt_mask, rng, num, pos_fraction, num_classes, version,
                     add_gt=True):
    """Assign rotated gts to HBB proposals (circum-HBB IoU) and random-sample
    a fixed roi set. Returns (rois_xyxy, labels, lw, matched_gt, pos_mask)."""

    def single(props, pv, gb, gl, gm, key):
        if add_gt:
            props = jnp.concatenate([obb2xyxy(gb, version), props], 0)
            pv = jnp.concatenate([gm, pv], 0)
        props_rot = hbb_to_rot(props)
        gt_hbb = obb2hbb(gb, version)
        assign = assigner(props_rot, gt_hbb, gl, gm)
        pos = (assign.assigned_gt_inds >= 0) & pv
        neg = (assign.assigned_gt_inds == -1) & pv
        k1, k2 = jax.random.split(key)
        max_pos = int(num * pos_fraction)
        pos_key = jnp.where(pos, jax.random.uniform(k1, pos.shape), -1.)
        pos_sel = pos & (jnp.argsort(jnp.argsort(-pos_key)) < max_pos)
        n_pos = jnp.minimum(pos.sum(), max_pos)
        neg_key = jnp.where(neg, jax.random.uniform(k2, neg.shape), -1.)
        neg_sel = neg & (jnp.argsort(jnp.argsort(-neg_key)) < num - n_pos)
        order_key = jnp.where(pos_sel, 2.0 + pos_key,
                              jnp.where(neg_sel, 1.0 + neg_key, 0.0))
        order = jnp.argsort(-order_key)[:num]
        sel = lambda v: v[order]
        safe = jnp.clip(sel(assign.assigned_gt_inds), 0, None)
        return (sel(props), jnp.where(sel(pos_sel), sel(assign.labels),
                                      num_classes),
                (sel(pos_sel) | sel(neg_sel)).astype(jnp.float32),
                gb[safe], sel(pos_sel))

    b = proposals_xyxy.shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(single)(proposals_xyxy, pvalid, gt_bboxes, gt_labels,
                            gt_mask, keys)


@HEADS.register_module()
class GVBBoxHead(nn.Module):
    """Gliding-vertex bbox head (reference ``gv_bbox_head.py:17``)."""
    num_classes: int = 15
    in_channels: int = 256
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    reg_class_agnostic: bool = True
    ratio_thr: float = 0.8
    version: str = 'le90'
    bbox_coder: Optional[dict] = None
    fix_coder: Optional[dict] = None
    ratio_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    loss_fix: Optional[dict] = None
    loss_ratio: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        b, r = roi_feats.shape[:2]
        x = roi_feats.reshape(b, r, -1)
        for i in range(2):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f'shared_fc_{i}')(x))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             name='fc_cls')(x)
        bbox_pred = nn.Dense(4, dtype=self.dtype, name='fc_reg')(x)
        fix_pred = jax.nn.sigmoid(
            nn.Dense(4, dtype=self.dtype, name='fc_fix')(x))
        ratio_pred = jax.nn.sigmoid(
            nn.Dense(1, dtype=self.dtype, name='fc_ratio')(x))
        return cls_score, bbox_pred, fix_pred, ratio_pred


@HEADS.register_module()
class GVRatioRoIHead(nn.Module):
    """Gliding Vertex roi head (reference ``gv_ratio_roi_head.py``)."""
    bbox_roi_extractor: Optional[dict] = None
    bbox_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    version: str = 'le90'
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_bbox_head(self):
        cfg = dict(self.bbox_head or dict(type='GVBBoxHead'))
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = self.train_cfg
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype)

    @property
    def assigner(self):
        cfg = dict((self.train_cfg or {}).get('assigner') or dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
            min_pos_iou=0.5, match_low_quality=False))
        cfg.pop('iou_calculator', None)
        return MaxIoUAssigner(**{k: v for k, v in cfg.items()
                                 if k != 'type'})

    @nn.compact
    def __call__(self, feats, rois_xyxy, use_pallas: bool = False):
        strides = (self.bbox_roi_extractor or {}).get(
            'featmap_strides', [4, 8, 16, 32])
        pooled = _align(feats, hbb_to_rot(rois_xyxy), strides, use_pallas)
        cfg = dict(self.bbox_head or dict(type='GVBBoxHead'))
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype, name='bbox_head')(pooled)

    @nn.nowrap
    def sample_rois(self, proposals, pvalid, gt_bboxes, gt_labels, gt_mask,
                    rng):
        cfg = (self.train_cfg or {}).get('sampler') or {}
        head = self.make_bbox_head()
        rois, labels, lw, matched, pos = _sample_hbb_rois(
            self.assigner, proposals, pvalid, gt_bboxes, gt_labels, gt_mask,
            rng, int(cfg.get('num', 512)),
            float(cfg.get('pos_fraction', 0.25)), head.num_classes,
            self.version, bool(cfg.get('add_gt_as_proposals', True)))
        hbb_coder = DeltaXYWHBBoxCoder(
            target_stds=(0.1, 0.1, 0.2, 0.2))
        gt_xyxy = obb2xyxy(matched, self.version)
        bt = hbb_coder.encode(rois, gt_xyxy)
        bt = jnp.where(pos[..., None], bt, 0.0)
        fix_t = GVFixCoder(self.version).encode(matched)
        ratio_t = GVRatioCoder(self.version).encode(matched)
        return (rois, labels, lw, bt, jnp.where(pos[..., None], fix_t, 0.),
                jnp.where(pos[..., None], ratio_t, 0.),
                pos.astype(jnp.float32), jnp.maximum(pos.sum(), 1.0))

    @nn.nowrap
    def loss(self, head_outputs, targets):
        cls_score, bbox_pred, fix_pred, ratio_pred = head_outputs
        rois, labels, lw, bt, fix_t, ratio_t, bw, num_pos = targets
        cls_loss = _build(LOSSES, dict(type='CrossEntropyLoss'))(
            cls_score, labels, weight=lw,
            avg_factor=jnp.maximum(lw.sum(), 1.0))
        sl1 = _build(LOSSES, dict(type='SmoothL1Loss', beta=1.0))
        loss_bbox = sl1(bbox_pred, bt, weight=bw, avg_factor=num_pos)
        loss_fix = sl1(fix_pred, fix_t, weight=bw, avg_factor=num_pos) * 1.0
        loss_ratio = sl1(ratio_pred, ratio_t, weight=bw,
                         avg_factor=num_pos) * 16.0
        return dict(loss_cls=cls_loss, loss_bbox=loss_bbox,
                    loss_fix=loss_fix, loss_ratio=loss_ratio)

    @nn.nowrap
    def get_bboxes(self, rois_xyxy, head_outputs, cfg=None, img_shape=None):
        cls_score, bbox_pred, fix_pred, ratio_pred = head_outputs
        cfg = cfg if cfg is not None else (self.test_cfg or {})
        head = self.make_bbox_head()
        scores = jax.nn.softmax(cls_score, -1)
        hbb_coder = DeltaXYWHBBoxCoder(target_stds=(0.1, 0.1, 0.2, 0.2))
        hbbs = hbb_coder.decode(rois_xyxy, bbox_pred, max_shape=img_shape)
        polys = GVFixCoder(self.version).decode(hbbs, fix_pred)
        obbs = poly2obb(polys, self.version)
        # near-rectangular objects keep the horizontal box (ratio switch,
        # reference gv_ratio_roi_head get_bboxes)
        rect = ratio_pred[..., 0] > head.ratio_thr
        obbs = jnp.where(rect[..., None], hbb_to_rot(hbbs), obbs)

        def per_image(bx, sc):
            nms_cfg = cfg.get('nms', {'iou_thr': 0.1})
            return multiclass_nms_rotated(
                bx, sc, score_thr=float(cfg.get('score_thr', 0.05)),
                iou_thr=float(nms_cfg.get('iou_thr', 0.1)),
                max_per_img=int(cfg.get('max_per_img', 2000)),
                max_candidates=int(cfg.get('max_candidates', 2000)))

        return jax.vmap(per_image)(obbs, scores)


@HEADS.register_module()
class RoITransRoIHead(nn.Module):
    """RoI-Transformer cascade roi head (reference
    ``roi_trans_roi_head.py:14-400``): stage 0 regresses an OBB from a
    horizontal RoI (DeltaXYWHAHBBoxCoder), stage 1 refines it with
    RoIAlignRotated (DeltaXYWHAOBBoxCoder)."""
    num_stages: int = 2
    stage_loss_weights: Sequence[float] = (1.0, 1.0)
    bbox_roi_extractor: Optional[Sequence[dict]] = None
    bbox_head: Optional[Sequence[dict]] = None
    train_cfg: Optional[Sequence[dict]] = None
    test_cfg: Optional[dict] = None
    version: str = 'le90'
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def _stage_cfg(self, i):
        if isinstance(self.train_cfg, (list, tuple)):
            return self.train_cfg[i] if i < len(self.train_cfg) else {}
        return self.train_cfg or {}

    def _head_cfg(self, i):
        heads = self.bbox_head or [
            dict(type='RotatedShared2FCBBoxHead',
                 bbox_coder=dict(type='DeltaXYWHAHBBoxCoder',
                                 angle_range=self.version)),
            dict(type='RotatedShared2FCBBoxHead',
                 bbox_coder=dict(type='DeltaXYWHAOBBoxCoder',
                                 angle_range=self.version)),
        ]
        return dict(heads[i])

    @nn.nowrap
    def make_head(self, i):
        cfg = self._head_cfg(i)
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype)

    def _assigner(self, i):
        cfg = dict(self._stage_cfg(i).get('assigner') or dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
            min_pos_iou=0.5, match_low_quality=False))
        cfg.pop('iou_calculator', None)
        return MaxIoUAssigner(**{k: v for k, v in cfg.items()
                                 if k != 'type'})

    @nn.nowrap
    def _strides(self, i):
        ex = self.bbox_roi_extractor
        if isinstance(ex, (list, tuple)) and i < len(ex):
            return ex[i].get('featmap_strides', [4, 8, 16, 32])
        return [4, 8, 16, 32]

    @nn.compact
    def __call__(self, feats, proposals_xyxy, batch=None,
                 train: bool = False, rng=None):
        """Runs the full cascade. In train mode returns per-stage targets +
        outputs; in test mode returns final stage rois + outputs."""
        outputs = []
        if train:
            rois_rot = None
            stage_data = []
            rngs = jax.random.split(rng, self.num_stages)
            for i in range(self.num_stages):
                cfg = self._stage_cfg(i).get('sampler') or {}
                num = int(cfg.get('num', 512))
                pf = float(cfg.get('pos_fraction', 0.25))
                head_logic = self.make_head(i)
                if i == 0:
                    rois, labels, lw, matched, pos = _sample_hbb_rois(
                        self._assigner(0), proposals_xyxy,
                        jnp.ones(proposals_xyxy.shape[:2], bool),
                        batch['gt_bboxes'], batch['gt_labels'],
                        batch['gt_mask'], rngs[0], num, pf,
                        head_logic.num_classes, self.version)
                    rois_rot = hbb_to_rot(rois)
                else:
                    # re-assign the refined rotated rois (gts appended as
                    # proposals, reference stage samplers add_gt=True)
                    def single(props, gb, gl, gm, key):
                        pvalid = jnp.concatenate(
                            [gm, jnp.ones(props.shape[0], bool)], 0)
                        props = jnp.concatenate([gb, props], 0)
                        assign = self._assigner(i)(props, gb, gl, gm)
                        pos = (assign.assigned_gt_inds >= 0) & pvalid
                        neg = (assign.assigned_gt_inds == -1) & pvalid
                        k1, k2 = jax.random.split(key)
                        max_pos = int(num * pf)
                        pk = jnp.where(pos, jax.random.uniform(k1, pos.shape),
                                       -1.)
                        ps = pos & (jnp.argsort(jnp.argsort(-pk)) < max_pos)
                        n_pos = jnp.minimum(pos.sum(), max_pos)
                        nk = jnp.where(neg, jax.random.uniform(k2, neg.shape),
                                       -1.)
                        ns = neg & (jnp.argsort(jnp.argsort(-nk)) <
                                    num - n_pos)
                        ok = jnp.where(ps, 2.0 + pk,
                                       jnp.where(ns, 1.0 + nk, 0.0))
                        order = jnp.argsort(-ok)[:num]
                        sel = lambda v: v[order]
                        safe = jnp.clip(sel(assign.assigned_gt_inds), 0, None)
                        return (sel(props),
                                jnp.where(sel(ps), sel(assign.labels),
                                          head_logic.num_classes),
                                (sel(ps) | sel(ns)).astype(jnp.float32),
                                gb[safe], sel(ps))
                    keys = jax.random.split(rngs[i],
                                            rois_rot.shape[0])
                    rois_rot, labels, lw, matched, pos = jax.vmap(single)(
                        rois_rot, batch['gt_bboxes'], batch['gt_labels'],
                        batch['gt_mask'], keys)

                strides = self._strides(i)
                pooled = roi_align_rotated(
                    feats[:len(strides)], rois_rot, (7, 7),
                    [1.0 / s for s in strides], 2)
                head_cfg = self._head_cfg(i)
                if head_cfg.get('test_cfg') is None:
                    head_cfg['test_cfg'] = self.test_cfg
                cls_score, bbox_pred = HEADS.build(
                    head_cfg, dtype=self.dtype, name=f'bbox_head_{i}')(
                        pooled)
                # targets against the roi boxes (stage-0 rois are theta=0)
                bt = head_logic.coder.encode(rois_rot, matched)
                bt = jnp.where(pos[..., None], bt, 0.0)
                stage_data.append(dict(
                    rois=rois_rot, labels=labels, lw=lw, bt=bt,
                    bw=pos.astype(jnp.float32),
                    num_pos=jnp.maximum(pos.sum(), 1.0),
                    cls_score=cls_score, bbox_pred=bbox_pred))
                # refine rois for the next stage (class-agnostic decode)
                if i + 1 < self.num_stages:
                    rois_rot = jax.lax.stop_gradient(
                        head_logic.decode_bboxes(rois_rot, bbox_pred))
            return stage_data
        else:
            rois_rot = hbb_to_rot(proposals_xyxy)
            for i in range(self.num_stages):
                strides = self._strides(i)
                pooled = _align(feats, rois_rot, strides, use_pallas=True)
                head_cfg = self._head_cfg(i)
                if head_cfg.get('test_cfg') is None:
                    head_cfg['test_cfg'] = self.test_cfg
                cls_score, bbox_pred = HEADS.build(
                    head_cfg, dtype=self.dtype, name=f'bbox_head_{i}')(
                        pooled)
                head_logic = self.make_head(i)
                if i + 1 < self.num_stages:
                    rois_rot = head_logic.decode_bboxes(rois_rot, bbox_pred)
            return dict(rois=rois_rot, cls_score=cls_score,
                        bbox_pred=bbox_pred)

    @nn.nowrap
    def loss(self, stage_data):
        losses = {}
        for i, d in enumerate(stage_data):
            head = self.make_head(i)
            li = head.loss(d['cls_score'], d['bbox_pred'], d['rois'],
                           d['labels'], d['lw'], d['bt'], d['bw'],
                           d['num_pos'])
            w = float(self.stage_loss_weights[i]) \
                if i < len(self.stage_loss_weights) else 1.0
            losses.update({f's{i}_{k}': v * w for k, v in li.items()})
        return losses

    @nn.nowrap
    def get_bboxes(self, outputs, cfg=None, img_shape=None):
        cfg = cfg if cfg is not None else (self.test_cfg or {})
        head = self.make_head(self.num_stages - 1)
        scores = jax.nn.softmax(outputs['cls_score'], -1)
        decoded = head.decode_bboxes(outputs['rois'], outputs['bbox_pred'],
                                     img_shape)

        def per_image(bx, sc):
            if bx.ndim == 3:
                bx = bx.reshape(bx.shape[0], -1)
            nms_cfg = cfg.get('nms', {'iou_thr': 0.1})
            return multiclass_nms_rotated(
                bx, sc, score_thr=float(cfg.get('score_thr', 0.05)),
                iou_thr=float(nms_cfg.get('iou_thr', 0.1)),
                max_per_img=int(cfg.get('max_per_img', 2000)),
                max_candidates=int(cfg.get('max_candidates', 2000)))

        return jax.vmap(per_image)(decoded, scores)
