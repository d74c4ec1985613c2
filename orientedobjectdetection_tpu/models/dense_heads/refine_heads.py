"""Refine-stage heads: S2ANet FAM/ODM and R3Det refine heads.

Reference files: ``dense_heads/rotated_retina_refine_head.py:10-202``
(anchors come from the previous stage's rois, ``get_anchors`` override :105;
per-location decode ``refine_bboxes`` :64-103) and ``odm_refine_head.py:
12-223`` (ORConv + rotation-invariant pooling towers).

TPU design: refined anchors are a batched (B, N, 5) tensor threaded through
the jitted step (the reference stores them on the head object between
stages); losses reuse the AnchorHeadLogic machinery with per-image anchors.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.nms import multiclass_nms_rotated
from ...utils.registry import HEADS
from ..utils_rotation import ORConv2d, rotation_invariant_pooling
from .rotated_anchor_head import KFIoURRetinaHead, AnchorHeadLogic, RotatedRetinaHead, _build


class RefineHeadLogic(AnchorHeadLogic):
    """Anchor-head logic with externally-supplied per-image anchors."""

    def loss_with_anchors(self, outputs, anchors, gt_bboxes, gt_labels,
                          gt_mask, prefix: str = ''):
        """anchors: (B, N, 5) refined rois (stop-gradient recommended)."""
        cls_scores, bbox_preds = outputs
        labels, lw, bt, bw, pos = jax.vmap(
            self._targets_single)(anchors, gt_bboxes, gt_labels, gt_mask)
        cls_flat, box_flat = self._flatten_preds(cls_scores, bbox_preds)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        loss_cls = self.cls_loss(cls_flat, labels, weight=lw,
                                 avg_factor=num_pos)
        loss_bbox = self._refine_reg_loss(anchors, box_flat, bt, bw,
                                          num_pos)
        return {f'{prefix}loss_cls': loss_cls,
                f'{prefix}loss_bbox': loss_bbox}

    def _refine_reg_loss(self, anchors, box_flat, bbox_targets,
                         bbox_weights, num_pos):
        """Refine-stage reg loss hook; KFIoU variants override to feed
        decoded boxes into KFLoss."""
        return self.bbox_loss(box_flat, bbox_targets, weight=bbox_weights,
                              avg_factor=num_pos)

    def refine_bboxes(self, outputs, anchors):
        """Per-location decode of this stage's reg output against its
        anchors -> next stage rois (B, N, 5). Matches reference
        ``refine_bboxes`` (best-anchor decode; here num_anchors == 1)."""
        _, bbox_preds = outputs
        b = bbox_preds[0].shape[0]
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 5) for p in bbox_preds], 1)
        return jax.lax.stop_gradient(self.coder.decode(anchors, box_flat))

    def get_bboxes_with_anchors(self, outputs, anchors, cfg=None,
                                img_shape=None):
        """Decode + NMS with per-image anchors (refine-stage inference)."""
        cls_scores, bbox_preds = outputs
        cfg = cfg if cfg is not None else self.test_cfg
        nms_pre = int(cfg.get('nms_pre', 2000))
        b = cls_scores[0].shape[0]
        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores], 1)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 5) for p in bbox_preds], 1)

        def per_image(logits, deltas, anc):
            # rank on raw (possibly bf16) logits; sigmoid/f32 on selected
            k = min(nms_pre, logits.shape[0])
            from ...ops.nms import topk_candidates
            _, top_idx = topk_candidates(
                logits.max(-1).astype(jnp.float32), k,
                exact=not bool(cfg.get('approx_topk', False)))
            boxes = self.coder.decode(
                anc[top_idx].astype(jnp.float32),
                deltas[top_idx].astype(jnp.float32), max_shape=img_shape)
            sel = jax.nn.sigmoid(logits[top_idx].astype(jnp.float32))
            sc = jnp.concatenate([sel, jnp.zeros_like(sel[:, :1])], -1)
            nms_cfg = cfg.get('nms', {'iou_thr': 0.1})
            return multiclass_nms_rotated(
                boxes, sc, score_thr=float(cfg.get('score_thr', 0.05)),
                iou_thr=float(nms_cfg.get('iou_thr', 0.1)),
                max_per_img=int(cfg.get('max_per_img', 2000)),
                max_candidates=int(cfg.get('max_candidates', 2000)))

        return jax.vmap(per_image)(cls_flat, box_flat, anchors)


@HEADS.register_module()
class RotatedRetinaRefineHead(RotatedRetinaHead, RefineHeadLogic):
    """R3Det refine stage: retina towers, 1 anchor/location, anchors = rois
    from the previous stage (reference ``rotated_retina_refine_head.py``)."""
    pass


@HEADS.register_module()
class ODMRefineHead(nn.Module, RefineHeadLogic):
    """S2ANet ODM head (reference ``odm_refine_head.py:12-223``): ORConv
    produces orientation-sensitive features; the cls branch pools over
    orientations (rotation-invariant), the reg branch keeps them."""
    num_classes: int = 15
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    anchor_generator: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @property
    def num_anchors(self):
        return 1

    @nn.compact
    def __call__(self, feats):
        import math
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        or_conv = ORConv2d(self.feat_channels // 8, kernel_size=3,
                           in_orientations=1, num_orientations=8,
                           dtype=self.dtype, name='or_conv')
        cls_convs = []
        for i in range(self.stacked_convs):
            cls_convs.append(nn.Conv(self.feat_channels, (3, 3),
                                     padding=[(1, 1)] * 2, dtype=self.dtype,
                                     name=f'cls_conv_{i}'))
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, dtype=self.dtype,
                             name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        odm_cls = nn.Conv(self.cls_out_channels, (3, 3),
                          padding=[(1, 1)] * 2, bias_init=bias_init,
                          dtype=self.dtype, name='odm_cls')
        odm_reg = nn.Conv(5, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype, name='odm_reg')

        cls_scores, bbox_preds = [], []
        for x in feats:
            or_feat = or_conv(x)                 # (B,H,W,feat) or-major
            reg_feat = or_feat
            cls_feat = rotation_invariant_pooling(or_feat, 8)
            for conv in cls_convs:
                cls_feat = nn.relu(conv(cls_feat))
            for conv in reg_convs:
                reg_feat = nn.relu(conv(reg_feat))
            cls_scores.append(odm_cls(cls_feat))
            bbox_preds.append(odm_reg(reg_feat))
        return tuple(cls_scores), tuple(bbox_preds)


def _kfiou_refine_reg_loss(head, anchors, box_flat, bbox_targets,
                           bbox_weights, num_pos):
    """KFLoss on per-image refined anchors (B, N, 5): decode both pred and
    target deltas to boxes (reference ``kfiou_*_refine_head.py`` loss_single
    passes pred_decode/targets_decode into KFLoss)."""
    from .rotated_anchor_head import _build
    from ...utils.registry import LOSSES
    pred_decode = head.coder.decode(anchors, box_flat)
    targets_decode = head.coder.decode(anchors, bbox_targets)
    cfg = head.loss_bbox if (head.loss_bbox or {}).get('type') == 'KFLoss' \
        else dict(type='KFLoss', loss_weight=5.0)
    loss = _build(LOSSES, cfg)
    return loss(box_flat, bbox_targets, weight=bbox_weights,
                avg_factor=num_pos, pred_decode=pred_decode,
                targets_decode=targets_decode)


@HEADS.register_module()
class KFIoURRetinaRefineHead(KFIoURRetinaHead, RefineHeadLogic):
    """R3Det refine stage with KFIoU loss (reference
    ``kfiou_rotate_retina_refine_head.py``)."""

    def _refine_reg_loss(self, anchors, box_flat, bbox_targets,
                         bbox_weights, num_pos):
        return _kfiou_refine_reg_loss(self, anchors, box_flat, bbox_targets,
                                      bbox_weights, num_pos)


@HEADS.register_module()
class KFIoUODMRefineHead(ODMRefineHead):
    """S2ANet ODM head with KFIoU loss (reference
    ``kfiou_odm_refine_head.py``): swaps the refine-stage reg loss for
    KFLoss on decoded boxes."""

    def _refine_reg_loss(self, anchors, box_flat, bbox_targets,
                         bbox_weights, num_pos):
        return _kfiou_refine_reg_loss(self, anchors, box_flat, bbox_targets,
                                      bbox_weights, num_pos)
