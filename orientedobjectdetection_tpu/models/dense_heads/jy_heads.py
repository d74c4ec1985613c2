"""jy head variants: MSDCN and decoupled-objectness heads.

Reference: ``rotated_msdeform_head.py:24-282`` (YOLOv8 head whose towers use
multi-scale deformable convs) and ``rotated_objectness_head.py:23,385``
(decoupled objectness branch + ObjectnessLoss2/3).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.feature_align import deform_conv_sample
from ...utils.registry import HEADS, LOSSES
from ..blocks import ConvModule, make_divisible
from .rotated_anchor_head import _build
from .rotated_fcos_head import Scale
from .rotated_yolov8_head import RotatedYOLOv8Head


class MSDeformConvBlock(nn.Module):
    """Deformable conv block: learned offsets -> sampled taps -> dense
    (reference DeformConv2dPack usage in ``rotated_msdeform_head.py:16``)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        offsets = nn.Conv(18, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name='offset')(x)
        taps = deform_conv_sample(x, offsets)
        out = nn.Dense(self.out_channels, dtype=self.dtype,
                       name='proj')(taps.reshape(b, h, w, -1))
        return nn.silu(out)


@HEADS.register_module()
class RotatedMSDCNHead(RotatedYOLOv8Head):
    """YOLOv8 head with deformable towers (reference
    ``rotated_msdeform_head.py:24-282``)."""

    @nn.compact
    def __call__(self, feats):
        chans = [make_divisible(c, self.widen_factor)
                 for c in self.in_channels]
        reg_out = max(16, chans[0] // 4)
        cls_out = max(chans[0], self.num_classes)

        cls_scores, bbox_preds, angle_preds = [], [], []
        for i, x in enumerate(feats):
            c = MSDeformConvBlock(cls_out, dtype=self.dtype,
                                  name=f'cls_dcn_{i}')(x)
            c = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'cls_conv_{i}')(c)
            bias_init = nn.initializers.constant(math.log(
                5 / self.num_classes /
                (1024 / self.featmap_strides[i]) ** 2))
            cls_scores.append(nn.Conv(self.num_classes, (1, 1),
                                      bias_init=bias_init, dtype=self.dtype,
                                      name=f'cls_pred_{i}')(c))
            r = MSDeformConvBlock(reg_out, dtype=self.dtype,
                                  name=f'reg_dcn_{i}')(x)
            r = ConvModule(reg_out, 3, dtype=self.dtype,
                           name=f'reg_conv_{i}')(r)
            rp = nn.Conv(4, (1, 1), bias_init=nn.initializers.ones,
                         dtype=self.dtype, name=f'reg_pred_{i}')(r)
            bbox_preds.append(jnp.clip(
                Scale(name=f'scale_{i}')(rp).astype(jnp.float32), 0))
            a = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'ang_conv_{i}')(x)
            angle_preds.append(nn.Conv(1, (1, 1),
                                       bias_init=nn.initializers.ones,
                                       dtype=self.dtype,
                                       name=f'ang_pred_{i}')(a))
        return tuple(cls_scores), tuple(bbox_preds), tuple(angle_preds)


@HEADS.register_module()
class RotatedDecoupledObjHead(RotatedYOLOv8Head):
    """Decoupled objectness head (reference
    ``rotated_objectness_head.py:23``): the objectness branch has its OWN
    two-ConvModule 3x3 tower (reference ``_init_layers`` obj_preds,
    ``rotated_objectness_head.py:101-120``) — fully decoupled from the
    classification tower; the classification loss is ObjectnessLoss2/3
    over (obj, cls) pairs."""

    @nn.compact
    def __call__(self, feats):
        chans = [make_divisible(c, self.widen_factor)
                 for c in self.in_channels]
        reg_out = max(16, chans[0] // 4)
        cls_out = max(chans[0], self.num_classes)

        cls_scores, bbox_preds, angle_preds, obj_preds = [], [], [], []
        for i, x in enumerate(feats):
            c = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'cls_conv_{i}_0')(x)
            c = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'cls_conv_{i}_1')(c)
            bias_init = nn.initializers.constant(math.log(
                5 / self.num_classes /
                (1024 / self.featmap_strides[i]) ** 2))
            cls_scores.append(nn.Conv(self.num_classes, (1, 1),
                                      bias_init=bias_init, dtype=self.dtype,
                                      name=f'cls_pred_{i}')(c))
            o = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'obj_conv_{i}_0')(x)
            o = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'obj_conv_{i}_1')(o)
            obj_preds.append(nn.Conv(1, (1, 1),
                                     bias_init=nn.initializers.ones,
                                     dtype=self.dtype,
                                     name=f'obj_pred_{i}')(o))
            r = ConvModule(reg_out, 3, dtype=self.dtype,
                           name=f'reg_conv_{i}_0')(x)
            r = ConvModule(reg_out, 3, dtype=self.dtype,
                           name=f'reg_conv_{i}_1')(r)
            rp = nn.Conv(4, (1, 1), bias_init=nn.initializers.ones,
                         dtype=self.dtype, name=f'reg_pred_{i}')(r)
            bbox_preds.append(jnp.clip(
                Scale(name=f'scale_{i}')(rp).astype(jnp.float32), 0))
            a = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'ang_conv_{i}_0')(x)
            angle_preds.append(nn.Conv(1, (1, 1),
                                       bias_init=nn.initializers.ones,
                                       dtype=self.dtype,
                                       name=f'ang_pred_{i}')(a))
        return (tuple(cls_scores), tuple(bbox_preds), tuple(angle_preds),
                tuple(obj_preds))

    def loss(self, outputs, gt_bboxes, gt_labels, gt_mask):
        cls_scores, bbox_preds, angle_preds, obj_preds = outputs
        featmap_sizes = [s.shape[1:3] for s in cls_scores]
        points, strides, ranges = self._points(featmap_sizes)
        cls_flat, box_flat, ang_flat = self._flat(
            (cls_scores, bbox_preds, angle_preds))
        b = cls_scores[0].shape[0]
        obj_flat = jnp.concatenate(
            [o.reshape(b, -1, 1) for o in obj_preds], 1)
        assigner = self.assigner
        labels, bt, at, pos = jax.vmap(
            lambda gb, gl, gm, bp, ap, cs: assigner.assign_single(
                points, strides, ranges, gb, gl, gm, bp, ap, cs)
        )(gt_bboxes, gt_labels, gt_mask, box_flat, ang_flat, cls_flat)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        pw = pos.astype(jnp.float32)

        obj_loss = _build(LOSSES, dict(
            self.loss_cls or dict(type='ObjectnessLoss3')))
        loss_cls = obj_loss(obj_flat, cls_flat, labels, self.num_classes,
                            weight=jnp.ones_like(pw), avg_factor=num_pos)
        pred_full = jnp.concatenate([box_flat, ang_flat], -1)
        tgt_full = jnp.concatenate([bt, at[..., None]], -1)
        pred_dec = self.coder.decode(points[None], pred_full)
        tgt_dec = self.coder.decode(points[None], tgt_full)
        loss_bbox = _build(LOSSES, dict(
            self.loss_bbox or dict(type='RotatedIoULoss')))(
                pred_dec, tgt_dec, weight=pw,
                avg_factor=jnp.maximum(pw.sum(), 1.0))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    def get_bboxes(self, outputs, img_shape=None, scale_factor=None,
                   rescale: bool = False, cfg=None):
        cls_scores, bbox_preds, angle_preds, obj_preds = outputs
        # gate cls logits by objectness for scoring
        gated = tuple(
            c + jax.nn.log_sigmoid(o)
            for c, o in zip(cls_scores, obj_preds))
        return super().get_bboxes((gated, bbox_preds, angle_preds),
                                  img_shape=img_shape,
                                  scale_factor=scale_factor,
                                  rescale=rescale, cfg=cfg)


@HEADS.register_module()
class RotatedDecoupledBGHead(RotatedDecoupledObjHead):
    """Coupled background-slot variant (reference
    ``rotated_objectness_head.py:23``); same network, ObjectnessLoss2."""
    pass


@HEADS.register_module()
class RotatedDecoupled1x1ObjHead(RotatedDecoupledObjHead):
    """1x1-decoupled objectness variant (reference
    ``rotated_objectness_head.py:385,448-530``): obj and cls SHARE the
    two-ConvModule classification tower and decouple only at the 1x1
    predictor convs (reference obj_preds/fg_preds are single 1x1 convs fed
    by the cls tower, ``forward_single``: ``cls_logit = cls_pred(x)``,
    ``obj = obj_pred(cls_logit)``, ``fg = fg_pred(cls_logit)``). Same loss
    wiring as the base head."""

    @nn.compact
    def __call__(self, feats):
        chans = [make_divisible(c, self.widen_factor)
                 for c in self.in_channels]
        reg_out = max(16, chans[0] // 4)
        cls_out = max(chans[0], self.num_classes)

        cls_scores, bbox_preds, angle_preds, obj_preds = [], [], [], []
        for i, x in enumerate(feats):
            # shared tower: NO final pred conv (reference :497-510)
            c = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'cls_conv_{i}_0')(x)
            c = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'cls_conv_{i}_1')(c)
            bias_init = nn.initializers.constant(math.log(
                5 / self.num_classes /
                (1024 / self.featmap_strides[i]) ** 2))
            # fg_preds: 1x1 -> num_classes off the shared tower
            cls_scores.append(nn.Conv(self.num_classes, (1, 1),
                                      bias_init=bias_init, dtype=self.dtype,
                                      name=f'fg_pred_{i}')(c))
            # obj_preds: 1x1 -> 1 off the SAME shared tower
            obj_preds.append(nn.Conv(1, (1, 1),
                                     bias_init=nn.initializers.ones,
                                     dtype=self.dtype,
                                     name=f'obj_pred_{i}')(c))
            r = ConvModule(reg_out, 3, dtype=self.dtype,
                           name=f'reg_conv_{i}_0')(x)
            r = ConvModule(reg_out, 3, dtype=self.dtype,
                           name=f'reg_conv_{i}_1')(r)
            rp = nn.Conv(4, (1, 1), bias_init=nn.initializers.ones,
                         dtype=self.dtype, name=f'reg_pred_{i}')(r)
            bbox_preds.append(jnp.clip(
                Scale(name=f'scale_{i}')(rp).astype(jnp.float32), 0))
            a = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'ang_conv_{i}_0')(x)
            a = ConvModule(cls_out, 3, dtype=self.dtype,
                           name=f'ang_conv_{i}_1')(a)
            angle_preds.append(nn.Conv(1, (1, 1),
                                       bias_init=nn.initializers.ones,
                                       dtype=self.dtype,
                                       name=f'ang_pred_{i}')(a))
        return (tuple(cls_scores), tuple(bbox_preds), tuple(angle_preds),
                tuple(obj_preds))
