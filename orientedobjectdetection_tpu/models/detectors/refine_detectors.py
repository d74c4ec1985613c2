"""Refine-stage detectors: S2ANet and R3Det.

Reference: ``detectors/s2anet.py:9-135`` (FAM head -> AlignConvModule ->
ODM head) and ``r3det.py:13-147`` (retina stage-0 -> FeatureRefineModule +
refine heads, cascaded). The alignment/refine modules use the analytic
bilinear-sampling ops from :mod:`ops.feature_align` instead of DCN/CUDA:

- AlignConv == sample the 3x3 rotated anchor grid + 1x1 matmul (MXU);
- FeatureRefineModule == 5x1 + 1x5 + 1x1 convs, then re-sample each
  location's feature at its refined box center, residual-added.

Everything (both stages, refinement, alignment) is ONE jitted program.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.feature_align import align_conv_sample, rotated_feature_align
from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS


class AlignConvModule(nn.Module):
    """Per-level align conv (reference ``detectors/utils.py:40-133``)."""
    out_channels: int = 256
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, rois_per_level):
        """feats: list of (B, H, W, C); rois_per_level: list of (B, H*W, 5).

        One projection per level, matching the reference's per-stride
        ``AlignConv`` list (``detectors/utils.py:112``) so converted
        checkpoints keep their per-level weights."""
        outs = []
        for i, (feat, rois, stride) in enumerate(
                zip(feats, rois_per_level, self.strides)):
            b, h, w, c = feat.shape
            taps = align_conv_sample(feat, rois, float(stride), 3)
            dense = nn.Dense(self.out_channels, use_bias=False,
                             dtype=self.dtype, name=f'align_proj_{i}')
            out = dense(taps.reshape(b, h, w, -1))
            outs.append(nn.relu(out))
        return outs


class FeatureRefineModule(nn.Module):
    """R3Det feature refinement (reference ``detectors/utils.py:136-206``)."""
    channels: int = 256
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, rois_per_level):
        conv_5_1 = nn.Conv(self.channels, (5, 1), padding=[(2, 2), (0, 0)],
                           dtype=self.dtype, name='conv_5_1')
        conv_1_5 = nn.Conv(self.channels, (1, 5), padding=[(0, 0), (2, 2)],
                           dtype=self.dtype, name='conv_1_5')
        conv_1_1 = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                           name='conv_1_1')
        outs = []
        for feat, rois, stride in zip(feats, rois_per_level, self.strides):
            mixed = conv_1_5(conv_5_1(feat)) + conv_1_1(feat)
            aligned = rotated_feature_align(mixed, rois, 1.0 / stride,
                                            points=1)
            outs.append(feat + aligned)
        return outs


def _split_levels(flat, featmap_sizes):
    """(B, N, 5) -> list of per-level (B, H*W, 5)."""
    outs = []
    start = 0
    for (h, w) in featmap_sizes:
        outs.append(flat[:, start:start + h * w])
        start += h * w
    return outs


@DETECTORS.register_module()
class S2ANet(nn.Module):
    """FAM -> align conv -> ODM (reference ``s2anet.py``)."""
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    fam_head: Optional[dict] = None
    align_cfgs: Optional[dict] = None
    odm_head: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_head(self, cfg_field, stage):
        cfg = dict(cfg_field)
        tc = (self.train_cfg or {}).get(stage)
        sc = (self.test_cfg or {})
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = tc
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = sc
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.compact
    def __call__(self, images, batch=None, train: bool = False, rng=None):
        feats = BACKBONES.build(dict(self.backbone), dtype=self.dtype,
                                name='backbone')(images)
        if self.neck is not None:
            feats = NECKS.build(dict(self.neck), dtype=self.dtype,
                                name='neck')(feats)
        fam_cfg = dict(self.fam_head)
        if fam_cfg.get('train_cfg') is None:
            fam_cfg['train_cfg'] = (self.train_cfg or {}).get('fam_cfg')
        if fam_cfg.get('test_cfg') is None:
            fam_cfg['test_cfg'] = self.test_cfg
        fam = HEADS.build(fam_cfg, dtype=self.dtype, name='fam_head')
        fam_outputs = fam(feats)

        fam_logic = self.make_head(self.fam_head, 'fam_cfg')
        featmap_sizes = [f.shape[1:3] for f in feats]
        grid_anchors = jnp.concatenate(
            fam_logic.prior_generator.grid_priors(featmap_sizes), 0)
        b = images.shape[0]
        anchors_b = jnp.broadcast_to(grid_anchors[None],
                                     (b,) + grid_anchors.shape)
        rois = RefineLogicHolder.refine(fam_logic, fam_outputs, anchors_b)
        rois_per_level = _split_levels(rois, featmap_sizes)

        align_cfg = dict(self.align_cfgs or {})
        aligned = AlignConvModule(
            out_channels=feats[0].shape[-1],
            strides=align_cfg.get('featmap_strides', [8, 16, 32, 64, 128]),
            dtype=self.dtype, name='align_conv')(feats, rois_per_level)

        odm_cfg = dict(self.odm_head)
        if odm_cfg.get('train_cfg') is None:
            odm_cfg['train_cfg'] = (self.train_cfg or {}).get('odm_cfg')
        if odm_cfg.get('test_cfg') is None:
            odm_cfg['test_cfg'] = self.test_cfg
        odm = HEADS.build(odm_cfg, dtype=self.dtype, name='odm_head')
        odm_outputs = odm(aligned)
        return dict(fam_outputs=fam_outputs, rois=rois,
                    odm_outputs=odm_outputs)

    @nn.nowrap
    def loss_from_outputs(self, outputs, batch):
        fam_logic = self.make_head(self.fam_head, 'fam_cfg')
        odm_logic = self.make_head(self.odm_head, 'odm_cfg')
        losses = {}
        fam_losses = fam_logic.loss(outputs['fam_outputs'],
                                    batch['gt_bboxes'], batch['gt_labels'],
                                    batch['gt_mask'])
        losses.update({f'fam_{k}': v for k, v in fam_losses.items()})
        odm_losses = odm_logic.loss_with_anchors(
            outputs['odm_outputs'], outputs['rois'], batch['gt_bboxes'],
            batch['gt_labels'], batch['gt_mask'], prefix='odm_')
        losses.update(odm_losses)
        return losses

    @nn.nowrap
    def bboxes_from_outputs(self, outputs, img_shape=None,
                            scale_factor=None, rescale=False):
        odm_logic = self.make_head(self.odm_head, 'odm_cfg')
        return odm_logic.get_bboxes_with_anchors(
            outputs['odm_outputs'], outputs['rois'], cfg=self.test_cfg,
            img_shape=img_shape)


class RefineLogicHolder:
    """Small indirection: FAM heads are plain RotatedRetinaHead configs in
    the reference; refinement decodes per-location best anchors."""

    @staticmethod
    def refine(head_logic, outputs, anchors_b):
        cls_scores, bbox_preds = outputs
        b = bbox_preds[0].shape[0]
        num_anchors = head_logic.prior_generator.num_base_anchors[0]
        if num_anchors == 1:
            box_flat = jnp.concatenate(
                [p.reshape(b, -1, 5) for p in bbox_preds], 1)
            return jax.lax.stop_gradient(
                head_logic.coder.decode(anchors_b, box_flat))
        # multi-anchor: keep best-scoring anchor per location
        rois = head_logic.filter_bboxes(cls_scores, bbox_preds)
        return jax.lax.stop_gradient(jnp.concatenate(rois, 1))


@DETECTORS.register_module()
class R3Det(nn.Module):
    """Cascaded refinement (reference ``r3det.py:13-147``)."""
    backbone: Optional[dict] = None
    neck: Optional[dict] = None
    bbox_head: Optional[dict] = None
    frm_cfgs: Optional[list] = None
    refine_heads: Optional[list] = None
    num_refine_stages: int = 1
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_s0_head(self):
        cfg = dict(self.bbox_head)
        if cfg.get('train_cfg') is None:
            cfg['train_cfg'] = (self.train_cfg or {}).get('s0')
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.nowrap
    def make_refine_head(self, i):
        cfg = dict(self.refine_heads[i])
        tc = (self.train_cfg or {}).get('sr')
        if cfg.get('train_cfg') is None and tc is not None:
            cfg['train_cfg'] = tc[i] if isinstance(tc, (list, tuple)) else tc
        if cfg.get('test_cfg') is None:
            cfg['test_cfg'] = self.test_cfg
        return HEADS.build(cfg, dtype=self.dtype)

    @nn.compact
    def __call__(self, images, batch=None, train: bool = False, rng=None):
        feats = BACKBONES.build(dict(self.backbone), dtype=self.dtype,
                                name='backbone')(images)
        if self.neck is not None:
            feats = NECKS.build(dict(self.neck), dtype=self.dtype,
                                name='neck')(feats)
        featmap_sizes = [f.shape[1:3] for f in feats]
        s0_cfg = dict(self.bbox_head)
        if s0_cfg.get('train_cfg') is None:
            s0_cfg['train_cfg'] = (self.train_cfg or {}).get('s0')
        if s0_cfg.get('test_cfg') is None:
            s0_cfg['test_cfg'] = self.test_cfg
        s0 = HEADS.build(s0_cfg, dtype=self.dtype, name='bbox_head')
        s0_outputs = s0(feats)

        s0_logic = self.make_s0_head()
        rois = jnp.concatenate(
            [jax.lax.stop_gradient(r)
             for r in s0_logic.filter_bboxes(*s0_outputs)], 1)

        stage_outputs = []
        stage_rois = []
        num_stages = len(self.refine_heads or [])
        strides = [8, 16, 32, 64, 128]
        if self.frm_cfgs:
            strides = self.frm_cfgs[0].get('featmap_strides', strides)
        for i in range(num_stages):
            rois_per_level = _split_levels(rois, featmap_sizes)
            feats = FeatureRefineModule(
                channels=feats[0].shape[-1], strides=strides,
                dtype=self.dtype, name=f'feat_refine_{i}')(
                    feats, rois_per_level)
            head_cfg = dict(self.refine_heads[i])
            tc = (self.train_cfg or {}).get('sr')
            if head_cfg.get('train_cfg') is None and tc is not None:
                head_cfg['train_cfg'] = tc[i] if isinstance(
                    tc, (list, tuple)) else tc
            if head_cfg.get('test_cfg') is None:
                head_cfg['test_cfg'] = self.test_cfg
            head = HEADS.build(head_cfg, dtype=self.dtype,
                               name=f'refine_head_{i}')
            out_i = head(feats)
            stage_outputs.append(out_i)
            stage_rois.append(rois)
            logic = self.make_refine_head(i)
            rois = logic.refine_bboxes(out_i, rois)
        return dict(s0_outputs=s0_outputs, stage_outputs=stage_outputs,
                    stage_rois=stage_rois, final_rois=rois)

    @nn.nowrap
    def loss_from_outputs(self, outputs, batch):
        s0_logic = self.make_s0_head()
        losses = {}
        s0_losses = s0_logic.loss(outputs['s0_outputs'], batch['gt_bboxes'],
                                  batch['gt_labels'], batch['gt_mask'])
        # stage-0 loss weight (reference train_cfg stage_loss_weights)
        weights = (self.train_cfg or {}).get('stage_loss_weights',
                                             [1.0] * 8)
        losses.update({f's0_{k}': v for k, v in s0_losses.items()})
        for i, (out_i, rois_i) in enumerate(zip(outputs['stage_outputs'],
                                                outputs['stage_rois'])):
            logic = self.make_refine_head(i)
            li = logic.loss_with_anchors(out_i, rois_i, batch['gt_bboxes'],
                                         batch['gt_labels'],
                                         batch['gt_mask'],
                                         prefix=f'sr{i}_')
            w = float(weights[i]) if i < len(weights) else 1.0
            losses.update({k: v * w for k, v in li.items()})
        return losses

    @nn.nowrap
    def bboxes_from_outputs(self, outputs, img_shape=None,
                            scale_factor=None, rescale=False):
        i = len(outputs['stage_outputs']) - 1
        logic = self.make_refine_head(i)
        return logic.get_bboxes_with_anchors(
            outputs['stage_outputs'][-1], outputs['stage_rois'][-1],
            cfg=self.test_cfg, img_shape=img_shape)
