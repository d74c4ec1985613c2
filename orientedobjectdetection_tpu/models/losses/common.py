"""Classification / regression losses (pure jnp, masked reductions).

Replaces mmdet's registry losses + the CUDA ``sigmoid_focal_loss``
(reference use: ``losses/jy_loss.py:7``; python twin at ``jy_loss.py:12-57``).
All losses take an optional elementwise ``weight`` and an ``avg_factor``
(the reference's convention): ``loss = sum(loss * weight) / avg_factor``.
With padded/masked batches, weights carry the masking.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...utils.registry import LOSSES


def reduce_loss(loss, weight=None, reduction: str = 'mean',
                avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return loss.sum()
    # mean
    if avg_factor is not None:
        return loss.sum() / jnp.maximum(avg_factor, 1e-6)
    if weight is not None:
        return loss.sum() / jnp.maximum(weight.sum(), 1e-6)
    return loss.mean()


def weighted_loss(fn):
    """Wrap an elementwise loss fn(pred, target) with weight/reduction."""
    def wrapper(pred, target, weight=None, reduction='mean',
                avg_factor=None, **kwargs):
        loss = fn(pred, target, **kwargs)
        return reduce_loss(loss, weight, reduction, avg_factor)
    return wrapper


def sigmoid_focal_loss(logits, targets_onehot, gamma: float = 2.0,
                       alpha: float = 0.25):
    """Elementwise sigmoid focal loss over class logits.

    logits (..., C); targets_onehot (..., C) in {0,1} (soft labels allowed).
    """
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets_onehot)
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid cross entropy."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


@jax.custom_jvp
def _smooth_l1(diff, beta):
    adiff = jnp.abs(diff)
    return jnp.where(adiff < beta, 0.5 * diff * diff / beta,
                     adiff - 0.5 * beta)


@_smooth_l1.defjvp
def _smooth_l1_jvp(primals, tangents):
    diff, beta = primals
    ddiff, _ = tangents
    y = _smooth_l1(diff, beta)
    grad = jnp.clip(diff / beta, -1.0, 1.0)
    return y, grad * ddiff


def smooth_l1_loss(pred, target, beta: float = 1.0):
    return _smooth_l1(pred - target, beta)


@LOSSES.register_module()
class FocalLoss:
    """mmdet-compatible FocalLoss over integer labels.

    ``target`` is (N,) int with ``num_classes`` meaning background (mmdet's
    sigmoid focal convention: background has all-zero one-hot).
    """

    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = 'mean',
                 loss_weight: float = 1.0, activated: bool = False):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        num_classes = pred.shape[-1]
        onehot = jax.nn.one_hot(target, num_classes, dtype=pred.dtype)
        loss = sigmoid_focal_loss(pred, onehot, self.gamma, self.alpha)
        loss = loss.sum(-1)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class SmoothFocalLoss:
    """Focal loss with *soft* (smoothed) labels for CSL angle classification
    (reference ``losses/smooth_focal_loss.py``): per-bin sigmoid focal where
    the target is the smoothing window value in [0, 1]."""

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = sigmoid_focal_loss(pred, target, self.gamma, self.alpha)
        loss = loss.sum(-1)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = jnp.abs(pred - target)
        if weight is not None and weight.ndim < loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta: float = 1.0, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = smooth_l1_loss(pred, target, self.beta)
        if weight is not None and weight.ndim < loss.ndim:
            weight = weight[..., None]
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class CrossEntropyLoss:
    """Softmax or sigmoid CE over integer labels (mmdet-compatible)."""

    def __init__(self, use_sigmoid: bool = False, use_mask: bool = False,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if self.use_sigmoid:
            if target.ndim == pred.ndim - 1:
                target = jax.nn.one_hot(target, pred.shape[-1],
                                        dtype=pred.dtype)
            loss = optax_sigmoid_ce(pred, target).sum(-1)
        else:
            logp = jax.nn.log_softmax(pred, axis=-1)
            onehot = jax.nn.one_hot(target, pred.shape[-1], dtype=pred.dtype)
            loss = -(onehot * logp).sum(-1)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class IoULoss:
    """Axis-aligned IoU loss over (cx, cy, w, h, 0) boxes — used by the
    separate-angle (CSL) FCOS path where regression is horizontal in the
    point frame (reference csl_rotated_fcos_head.py h_bbox path)."""

    def __init__(self, linear: bool = False, eps: float = 1e-6,
                 reduction: str = 'mean', loss_weight: float = 1.0,
                 mode: str = 'log'):
        self.mode = 'linear' if linear else mode
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        def to_xyxy(b):
            return jnp.stack([b[..., 0] - b[..., 2] / 2,
                              b[..., 1] - b[..., 3] / 2,
                              b[..., 0] + b[..., 2] / 2,
                              b[..., 1] + b[..., 3] / 2], -1)
        p, t = to_xyxy(pred), to_xyxy(target)
        lt = jnp.maximum(p[..., :2], t[..., :2])
        rb = jnp.minimum(p[..., 2:], t[..., 2:])
        wh = jnp.clip(rb - lt, 0)
        inter = wh[..., 0] * wh[..., 1]
        union = pred[..., 2] * pred[..., 3] + \
            target[..., 2] * target[..., 3] - inter
        ious = jnp.clip(inter / jnp.maximum(union, self.eps), self.eps, 1.0)
        if weight is not None and weight.ndim > pred.ndim - 1:
            weight = weight.mean(-1)
        if self.mode == 'linear':
            loss = 1 - ious
        elif self.mode == 'square':
            loss = 1 - ious ** 2
        else:
            loss = -jnp.log(ious)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class VarifocalLoss:
    """Varifocal loss (IoU-aware classification; used by jy's 9-2 variant,
    reference rotated_yolov8_head.py:336-350). ``target`` is the soft
    IoU-quality one-hot (zeros for background)."""

    def __init__(self, use_sigmoid: bool = True, alpha: float = 0.75,
                 gamma: float = 2.0, iou_weighted: bool = True,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.iou_weighted = iou_weighted
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        p = jax.nn.sigmoid(pred)
        ce = optax_sigmoid_ce(pred, target)
        if self.iou_weighted:
            focal = target * (target > 0) + \
                self.alpha * (p ** self.gamma) * (target <= 0)
        else:
            focal = (target > 0).astype(pred.dtype) + \
                self.alpha * (p ** self.gamma) * (target <= 0)
        loss = (ce * focal).sum(-1)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class ObjectnessLoss2:
    """jy coupled objectness+cls loss (reference ``losses/jy_loss.py:117-``):
    BCE objectness plus focal cls on objectness-gated logits; ``ver=1``
    detaches the objectness gate."""

    def __init__(self, ver: int = 0, gamma: float = 2.0, alpha: float = 0.25,
                 obj_loss_weight: float = 1.0,
                 reduction: str = 'mean', loss_weight: float = 1.0):
        self.ver = ver
        self.gamma = gamma
        self.alpha = alpha
        self.obj_loss_weight = obj_loss_weight
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, obj_pred, cls_pred, labels, num_classes: int,
                 weight=None, avg_factor=None):
        """obj_pred (..., 1); cls_pred (..., C); labels int
        (num_classes = bg)."""
        fg = (labels < num_classes).astype(obj_pred.dtype)
        loss_obj = self.obj_loss_weight * optax_sigmoid_ce(obj_pred[..., 0],
                                                           fg)
        gate = obj_pred if self.ver == 0 else jax.lax.stop_gradient(obj_pred)
        gated = cls_pred + jax.nn.log_sigmoid(gate)
        onehot = jax.nn.one_hot(labels, num_classes, dtype=cls_pred.dtype)
        loss_cls = sigmoid_focal_loss(gated, onehot, self.gamma,
                                      self.alpha).sum(-1)
        loss = loss_obj + loss_cls
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class ObjectnessLoss3(ObjectnessLoss2):
    """Decoupled variant (reference jy_loss.py ObjectnessLoss3): objectness
    and cls losses reported jointly but the gate is always detached."""

    def __init__(self, **kw):
        kw.setdefault('ver', 1)
        super().__init__(**kw)


@LOSSES.register_module()
class ObjectnessLoss(ObjectnessLoss2):
    """Alias: ``configs/jy/objectness-loss.py`` names this type but the
    reference tree never defines it (stale config, like its
    ``BatchTaskAlignedAssigner`` — SURVEY.md §2.11 note); the coupled
    ObjectnessLoss2 semantics are the match."""
    pass


@LOSSES.register_module()
class GIoULoss:
    """Axis-aligned GIoU loss over (cx, cy, w, h, 0) boxes (mmdet GIoULoss;
    used by the separate-angle FCOS recipe,
    ``configs/rotated_fcos/rotated_fcos_sep_angle_*.py``)."""

    def __init__(self, eps: float = 1e-6, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        def to_xyxy(b):
            return jnp.stack([b[..., 0] - b[..., 2] / 2,
                              b[..., 1] - b[..., 3] / 2,
                              b[..., 0] + b[..., 2] / 2,
                              b[..., 1] + b[..., 3] / 2], -1)
        p, t = to_xyxy(pred), to_xyxy(target)
        lt = jnp.maximum(p[..., :2], t[..., :2])
        rb = jnp.minimum(p[..., 2:], t[..., 2:])
        wh = jnp.clip(rb - lt, 0)
        inter = wh[..., 0] * wh[..., 1]
        union = jnp.maximum(pred[..., 2] * pred[..., 3] +
                            target[..., 2] * target[..., 3] - inter,
                            self.eps)
        iou = inter / union
        # smallest enclosing box
        elt = jnp.minimum(p[..., :2], t[..., :2])
        erb = jnp.maximum(p[..., 2:], t[..., 2:])
        ewh = jnp.clip(erb - elt, 0)
        enc = jnp.maximum(ewh[..., 0] * ewh[..., 1], self.eps)
        giou = iou - (enc - union) / enc
        loss = 1 - giou
        if weight is not None and weight.ndim > pred.ndim - 1:
            weight = weight.mean(-1)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)
