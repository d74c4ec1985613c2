"""Kalman-filter IoU loss (reference ``losses/kf_iou_loss.py:38-161``).

The overlap of two Gaussians is measured by the Kalman-fused covariance
volume: Sigma = Sp - Sp (Sp + St)^-1 Sp; KFIoU = V(Sigma) /
(V(Sp) + V(St) - V(Sigma)). Center term is a smooth-L1 on the *encoded*
deltas while the covariances come from the *decoded* boxes (pred_decode /
targets_decode), matching the reference's head plumbing
(``dense_heads/kfiou_rotate_retina_head.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.registry import LOSSES
from .common import reduce_loss
from .gaussian_dist_loss import _det2, xy_wh_r_2_xy_sigma


def kfiou_loss(pred, target, pred_decode, targets_decode, fun=None,
               beta: float = 1.0 / 9.0, eps: float = 1e-6):
    xy_p = pred[..., :2]
    xy_t = target[..., :2]
    _, Sp = xy_wh_r_2_xy_sigma(pred_decode)
    _, St = xy_wh_r_2_xy_sigma(targets_decode)

    diff = jnp.abs(xy_p - xy_t)
    xy_loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta).sum(-1)

    Vb_p = 4 * jnp.sqrt(jnp.clip(_det2(Sp), 0))
    Vb_t = 4 * jnp.sqrt(jnp.clip(_det2(St), 0))

    # Sigma = Sp - Sp (Sp+St)^-1 Sp, written elementwise for 2x2.
    S = Sp + St
    det_s = _det2(S)
    i00 = S[..., 1, 1] / det_s
    i01 = -S[..., 0, 1] / det_s
    i11 = S[..., 0, 0] / det_s
    p00, p01, p11 = Sp[..., 0, 0], Sp[..., 0, 1], Sp[..., 1, 1]
    # K = Sp @ inv(S)
    k00 = p00 * i00 + p01 * i01
    k01 = p00 * i01 + p01 * i11
    k10 = p01 * i00 + p11 * i01
    k11 = p01 * i01 + p11 * i11
    # Sigma = Sp - K @ Sp
    s00 = p00 - (k00 * p00 + k01 * p01)
    s01 = p01 - (k00 * p01 + k01 * p11)
    s10 = p01 - (k10 * p00 + k11 * p01)
    s11 = p11 - (k10 * p01 + k11 * p11)
    det_sigma = s00 * s11 - s01 * s10
    Vb = 4 * jnp.sqrt(jnp.clip(det_sigma, 0))
    Vb = jnp.where(jnp.isnan(Vb), 0.0, Vb)
    kfiou = Vb / (Vb_p + Vb_t - Vb + eps)

    if fun == 'ln':
        kf = -jnp.log(kfiou + eps)
    elif fun == 'exp':
        kf = jnp.exp(1 - kfiou) - 1
    else:
        kf = 1 - kfiou
    return jnp.clip(xy_loss + kf, 0)


@LOSSES.register_module()
class KFLoss:
    def __init__(self, fun: str = 'none', reduction: str = 'mean',
                 loss_weight: float = 1.0, **kwargs):
        assert fun in ('none', 'ln', 'exp')
        self.fun = fun
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 pred_decode=None, targets_decode=None):
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        loss = kfiou_loss(pred, target, pred_decode, targets_decode, self.fun)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)
