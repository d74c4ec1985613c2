"""Rotated RoI bbox heads.

Reference ``roi_heads/bbox_heads/rotated_bbox_head.py:16`` +
``convfc_rbbox_head.py`` (``RotatedShared2FCBBoxHead``): pooled rotated RoI
features -> shared FCs -> softmax cls (C+1) + 5-param delta regression.
All target computation is masked/batched (runs in-jit).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BBOX_CODERS, HEADS, LOSSES
from ..dense_heads.rotated_anchor_head import _build


@HEADS.register_module()
class RotatedShared2FCBBoxHead(nn.Module):
    num_classes: int = 15
    in_channels: int = 256
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    num_shared_fcs: int = 2
    reg_class_agnostic: bool = True
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def coder(self):
        return _build(BBOX_CODERS, dict(
            self.bbox_coder or dict(
                type='DeltaXYWHAOBBoxCoder', angle_range='le90',
                norm_factor=None, edge_swap=True, proj_xy=True,
                target_means=(0., 0., 0., 0., 0.),
                target_stds=(0.1, 0.1, 0.2, 0.2, 0.1))))

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats (B, R, 7, 7, C) -> cls (B, R, C+1), reg (B, R, 5[*C])."""
        b, r = roi_feats.shape[:2]
        x = roi_feats.reshape(b, r, -1)
        for i in range(self.num_shared_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f'shared_fc_{i}')(x))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             name='fc_cls')(x)
        reg_dim = 5 if self.reg_class_agnostic else 5 * self.num_classes
        bbox_pred = nn.Dense(reg_dim, dtype=self.dtype, name='fc_reg')(x)
        return cls_score, bbox_pred

    # ---- targets/loss -----------------------------------------------------
    def loss(self, cls_score, bbox_pred, rois, labels, label_weights,
             bbox_targets, bbox_weights, num_pos):
        """All (B, R, ...) batched; labels==num_classes is background."""
        cls_loss_fn = _build(LOSSES, dict(
            self.loss_cls or dict(type='CrossEntropyLoss',
                                  loss_weight=1.0)))
        bbox_loss_fn = _build(LOSSES, dict(
            self.loss_bbox or dict(type='SmoothL1Loss', beta=1.0,
                                   loss_weight=1.0)))
        loss_cls = cls_loss_fn(cls_score, labels, weight=label_weights,
                               avg_factor=jnp.maximum(label_weights.sum(),
                                                      1.0))
        if not self.reg_class_agnostic:
            b, r = bbox_pred.shape[:2]
            bp = bbox_pred.reshape(b, r, self.num_classes, 5)
            safe = jnp.clip(labels, 0, self.num_classes - 1)
            bbox_pred = jnp.take_along_axis(
                bp, safe[..., None, None].repeat(5, -1), axis=2)[..., 0, :]
        loss_bbox = bbox_loss_fn(bbox_pred, bbox_targets,
                                 weight=bbox_weights, avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    # ---- decode -------------------------------------------------------------
    def decode_bboxes(self, rois, bbox_pred, img_shape=None):
        """rois (B, R, 5); bbox_pred (B, R, 5 or C*5) -> decoded (B, R, [C,] 5)."""
        if self.reg_class_agnostic:
            return self.coder.decode(rois, bbox_pred, max_shape=img_shape)
        b, r = bbox_pred.shape[:2]
        bp = bbox_pred.reshape(b, r, self.num_classes, 5)
        return self.coder.decode(rois[:, :, None, :], bp,
                                 max_shape=img_shape)


@HEADS.register_module()
class RotatedKFIoUShared2FCBBoxHead(RotatedShared2FCBBoxHead):
    """Shared-2FC bbox head trained with the KFIoU loss (reference
    ``bbox_heads/kfiou_rotate_bbox_head.py`` via
    ``configs/kfiou/roi_trans_kfiou_ln_*.py``): KFLoss consumes the encoded
    deltas AND the decoded pred/target boxes."""

    def loss(self, cls_score, bbox_pred, rois, labels, label_weights,
             bbox_targets, bbox_weights, num_pos):
        cls_loss_fn = _build(LOSSES, dict(
            self.loss_cls or dict(type='CrossEntropyLoss',
                                  loss_weight=1.0)))
        bbox_loss_fn = _build(LOSSES, dict(
            self.loss_bbox or dict(type='KFLoss', loss_weight=1.0)))
        loss_cls = cls_loss_fn(cls_score, labels, weight=label_weights,
                               avg_factor=jnp.maximum(label_weights.sum(),
                                                      1.0))
        if not self.reg_class_agnostic:
            b, r = bbox_pred.shape[:2]
            bp = bbox_pred.reshape(b, r, self.num_classes, 5)
            safe = jnp.clip(labels, 0, self.num_classes - 1)
            bbox_pred = jnp.take_along_axis(
                bp, safe[..., None, None].repeat(5, -1), axis=2)[..., 0, :]
        pred_decode = self.coder.decode(rois, bbox_pred)
        targets_decode = self.coder.decode(rois, bbox_targets)
        loss_bbox = bbox_loss_fn(bbox_pred, bbox_targets,
                                 weight=bbox_weights, avg_factor=num_pos,
                                 pred_decode=pred_decode,
                                 targets_decode=targets_decode)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
