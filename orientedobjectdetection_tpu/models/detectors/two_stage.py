"""Two-stage rotated detector (reference ``detectors/two_stage.py:11-195``).

Train: backbone/neck -> RPN loss + proposals (stop-gradient) -> RoI head
sample + pooled-feature loss. The sampled roi set is fixed-size so the whole
two-stage step is ONE jitted program (the reference re-enters python between
stages).

Because the sampled rois depend on an rng and the RPN outputs, the network
``__call__`` takes a mode switch: 'train' returns everything the losses
need; 'test' returns proposals + roi-head outputs for decode.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS


@DETECTORS.register_module()
class RotatedTwoStageDetector(nn.Module):
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    rpn_head: Optional[dict] = None
    roi_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_rpn_head(self):
        cfg = dict(self.rpn_head)
        cfg.setdefault('train_cfg', (self.train_cfg or {}).get('rpn'))
        cfg.setdefault('test_cfg', (self.test_cfg or {}).get('rpn'))
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.nowrap
    def make_roi_head(self):
        cfg = dict(self.roi_head)
        cfg.setdefault('train_cfg', (self.train_cfg or {}).get('rcnn'))
        cfg.setdefault('test_cfg', (self.test_cfg or {}).get('rcnn'))
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.compact
    def __call__(self, images, batch=None, train: bool = False,
                 rng=None):
        feats = BACKBONES.build(dict(self.backbone), dtype=self.dtype,
                                name='backbone')(images)
        if self.neck is not None:
            feats = NECKS.build(dict(self.neck), dtype=self.dtype,
                                name='neck')(feats)

        rpn_cfg = dict(self.rpn_head)
        rpn_cfg.setdefault('train_cfg', (self.train_cfg or {}).get('rpn'))
        rpn_cfg.setdefault('test_cfg', (self.test_cfg or {}).get('rpn'))
        rpn = HEADS.build(rpn_cfg, dtype=self.dtype, name='rpn_head')
        rpn_outputs = rpn(feats)

        roi_cfg = dict(self.roi_head)
        roi_cfg.setdefault('train_cfg', (self.train_cfg or {}).get('rcnn'))
        roi_cfg.setdefault('test_cfg', (self.test_cfg or {}).get('rcnn'))
        roi = HEADS.build(roi_cfg, dtype=self.dtype, name='roi_head')

        rpn_logic = self.make_rpn_head()
        if train:
            proposal_cfg = (self.train_cfg or {}).get(
                'rpn_proposal', (self.test_cfg or {}).get('rpn'))
            props, scores, pvalid = rpn_logic.get_proposals(
                jax.lax.stop_gradient(rpn_outputs), cfg=proposal_cfg)
            roi_logic = self.make_roi_head()
            rois, labels, lw, bt, bw, num_pos = roi_logic.sample_rois(
                props, pvalid, batch['gt_bboxes'], batch['gt_labels'],
                batch['gt_mask'], rng)
            cls_score, bbox_pred = roi(feats, rois)
            return dict(rpn_outputs=rpn_outputs, rois=rois, labels=labels,
                        label_weights=lw, bbox_targets=bt, bbox_weights=bw,
                        num_pos=num_pos, cls_score=cls_score,
                        bbox_pred=bbox_pred)
        else:
            props, scores, pvalid = rpn_logic.get_proposals(
                rpn_outputs, cfg=(self.test_cfg or {}).get('rpn'))
            # inference-only Mosaic RoIAlign kernel (3x the gather path at
            # R=2000 on v5e; ops/roi_align_pallas.py)
            cls_score, bbox_pred = roi(feats, props, use_pallas=True)
            return dict(proposals=props, prop_valid=pvalid,
                        cls_score=cls_score, bbox_pred=bbox_pred)

    # ---- functional logic ------------------------------------------------
    @nn.nowrap
    def loss_from_outputs(self, outputs, batch):
        rpn_logic = self.make_rpn_head()
        roi_logic = self.make_roi_head()
        losses = rpn_logic.loss(outputs['rpn_outputs'], batch['gt_bboxes'],
                                batch['gt_labels'], batch['gt_mask'])
        head = roi_logic.make_bbox_head()
        rcnn_losses = head.loss(
            outputs['cls_score'], outputs['bbox_pred'], outputs['rois'],
            outputs['labels'], outputs['label_weights'],
            outputs['bbox_targets'], outputs['bbox_weights'],
            outputs['num_pos'])
        losses.update(rcnn_losses)
        return losses

    @nn.nowrap
    def bboxes_from_outputs(self, outputs, img_shape=None,
                            scale_factor=None, rescale=False):
        roi_logic = self.make_roi_head()
        return roi_logic.get_bboxes(
            outputs['proposals'], outputs['cls_score'],
            outputs['bbox_pred'],
            cfg=(self.test_cfg or {}).get('rcnn'), img_shape=img_shape)


@DETECTORS.register_module()
class OrientedRCNN(RotatedTwoStageDetector):
    """Thin alias (reference ``detectors/oriented_rcnn.py``)."""
    pass


@DETECTORS.register_module()
class RotatedFasterRCNN(RotatedTwoStageDetector):
    """Thin alias (reference ``detectors/rotate_faster_rcnn.py``)."""
    pass

@DETECTORS.register_module()
class GlidingVertex(nn.Module):
    """Gliding Vertex detector (reference ``detectors/gliding_vertex.py``):
    HBB RPN -> GVRatioRoIHead (cls + hbb deltas + gliding fix + ratio)."""
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    rpn_head: Optional[dict] = None
    roi_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_rpn_head(self):
        cfg = dict(self.rpn_head)
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = (self.train_cfg or {}).get('rpn')
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = (self.test_cfg or {}).get('rpn')
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.nowrap
    def make_roi_head(self):
        cfg = dict(self.roi_head)
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = (self.train_cfg or {}).get('rcnn')
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = (self.test_cfg or {}).get('rcnn')
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.compact
    def __call__(self, images, batch=None, train: bool = False, rng=None):
        feats = BACKBONES.build(dict(self.backbone), dtype=self.dtype,
                                name='backbone')(images)
        if self.neck is not None:
            feats = NECKS.build(dict(self.neck), dtype=self.dtype,
                                name='neck')(feats)
        rpn_cfg = dict(self.rpn_head)
        if rpn_cfg.get('train_cfg') is None:
            rpn_cfg['train_cfg'] = (self.train_cfg or {}).get('rpn')
        if rpn_cfg.get('test_cfg') is None:
            rpn_cfg['test_cfg'] = (self.test_cfg or {}).get('rpn')
        rpn = HEADS.build(rpn_cfg, dtype=self.dtype, name='rpn_head')
        rpn_outputs = rpn(feats)
        rpn_logic = self.make_rpn_head()
        roi_logic = self.make_roi_head()
        roi_cfg = dict(self.roi_head)
        if roi_cfg.get('train_cfg') is None:
            roi_cfg['train_cfg'] = (self.train_cfg or {}).get('rcnn')
        if roi_cfg.get('test_cfg') is None:
            roi_cfg['test_cfg'] = (self.test_cfg or {}).get('rcnn')
        roi = HEADS.build(roi_cfg, dtype=self.dtype, name='roi_head')
        if train:
            proposal_cfg = (self.train_cfg or {}).get(
                'rpn_proposal', (self.test_cfg or {}).get('rpn'))
            props, scores, pvalid = rpn_logic.get_proposals(
                jax.lax.stop_gradient(rpn_outputs), cfg=proposal_cfg)
            targets = roi_logic.sample_rois(
                props, pvalid, batch['gt_bboxes'], batch['gt_labels'],
                batch['gt_mask'], rng)
            head_outputs = roi(feats, targets[0])
            return dict(rpn_outputs=rpn_outputs, targets=targets,
                        head_outputs=head_outputs)
        props, scores, pvalid = rpn_logic.get_proposals(
            rpn_outputs, cfg=(self.test_cfg or {}).get('rpn'))
        head_outputs = roi(feats, props, use_pallas=True)
        return dict(proposals=props, head_outputs=head_outputs)

    @nn.nowrap
    def loss_from_outputs(self, outputs, batch):
        losses = self.make_rpn_head().loss(
            outputs['rpn_outputs'], batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_mask'])
        losses.update(self.make_roi_head().loss(outputs['head_outputs'],
                                                outputs['targets']))
        return losses

    @nn.nowrap
    def bboxes_from_outputs(self, outputs, img_shape=None,
                            scale_factor=None, rescale=False):
        return self.make_roi_head().get_bboxes(
            outputs['proposals'], outputs['head_outputs'],
            cfg=(self.test_cfg or {}).get('rcnn'), img_shape=img_shape)


@DETECTORS.register_module()
class RoITransformer(nn.Module):
    """RoI-Transformer (reference ``detectors/roi_transformer.py`` +
    ``roi_trans_roi_head.py``): HBB RPN -> 2-stage cascade."""
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    rpn_head: Optional[dict] = None
    roi_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_rpn_head(self):
        cfg = dict(self.rpn_head)
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = (self.train_cfg or {}).get('rpn')
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = (self.test_cfg or {}).get('rpn')
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.nowrap
    def make_roi_head(self):
        cfg = dict(self.roi_head)
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = (self.train_cfg or {}).get('rcnn')
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = (self.test_cfg or {}).get('rcnn')
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.compact
    def __call__(self, images, batch=None, train: bool = False, rng=None):
        feats = BACKBONES.build(dict(self.backbone), dtype=self.dtype,
                                name='backbone')(images)
        if self.neck is not None:
            feats = NECKS.build(dict(self.neck), dtype=self.dtype,
                                name='neck')(feats)
        rpn_cfg = dict(self.rpn_head)
        if rpn_cfg.get('train_cfg') is None:
            rpn_cfg['train_cfg'] = (self.train_cfg or {}).get('rpn')
        if rpn_cfg.get('test_cfg') is None:
            rpn_cfg['test_cfg'] = (self.test_cfg or {}).get('rpn')
        rpn = HEADS.build(rpn_cfg, dtype=self.dtype, name='rpn_head')
        rpn_outputs = rpn(feats)
        rpn_logic = self.make_rpn_head()
        roi_cfg = dict(self.roi_head)
        if roi_cfg.get('train_cfg') is None:
            roi_cfg['train_cfg'] = (self.train_cfg or {}).get('rcnn')
        if roi_cfg.get('test_cfg') is None:
            roi_cfg['test_cfg'] = (self.test_cfg or {}).get('rcnn')
        roi = HEADS.build(roi_cfg, dtype=self.dtype, name='roi_head')
        if train:
            proposal_cfg = (self.train_cfg or {}).get(
                'rpn_proposal', (self.test_cfg or {}).get('rpn'))
            props, scores, pvalid = rpn_logic.get_proposals(
                jax.lax.stop_gradient(rpn_outputs), cfg=proposal_cfg)
            stage_data = roi(feats, props, batch=batch, train=True, rng=rng)
            return dict(rpn_outputs=rpn_outputs, stage_data=stage_data)
        props, scores, pvalid = rpn_logic.get_proposals(
            rpn_outputs, cfg=(self.test_cfg or {}).get('rpn'))
        roi_outputs = roi(feats, props)
        return dict(roi_outputs=roi_outputs)

    @nn.nowrap
    def loss_from_outputs(self, outputs, batch):
        losses = self.make_rpn_head().loss(
            outputs['rpn_outputs'], batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_mask'])
        losses.update(self.make_roi_head().loss(outputs['stage_data']))
        return losses

    @nn.nowrap
    def bboxes_from_outputs(self, outputs, img_shape=None,
                            scale_factor=None, rescale=False):
        return self.make_roi_head().get_bboxes(
            outputs['roi_outputs'], cfg=(self.test_cfg or {}).get('rcnn'),
            img_shape=img_shape)


@DETECTORS.register_module()
class ReDet(RotatedTwoStageDetector):
    """ReDet (reference ``detectors/redet.py``): ReResNet/ReFPN backbone +
    oriented RPN + RiRoIAlignRotated roi head."""
    pass
