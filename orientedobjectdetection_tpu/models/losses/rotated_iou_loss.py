"""Rotated IoU loss (reference ``losses/rotated_iou_loss.py:17-139``).

Uses the in-house differentiable rotated IoU kernel
(:mod:`orientedobjectdetection_tpu.ops.iou`) instead of
``mmcv.ops.diff_iou_rotated_2d``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.iou import diff_iou_rotated_2d
from ...utils.registry import LOSSES
from .common import reduce_loss


@LOSSES.register_module()
class RotatedIoULoss:
    """modes: 'linear' (1-IoU), 'square' (1-IoU^2), 'log' (-log IoU)."""

    def __init__(self, linear: bool = False, eps: float = 1e-6,
                 reduction: str = 'mean', loss_weight: float = 1.0,
                 mode: str = 'log'):
        assert mode in ('linear', 'square', 'log')
        self.mode = 'linear' if linear else mode
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        ious = jnp.clip(diff_iou_rotated_2d(pred, target), self.eps, 1.0)
        if self.mode == 'linear':
            loss = 1 - ious
        elif self.mode == 'square':
            loss = 1 - ious ** 2
        else:
            loss = -jnp.log(ious)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)
