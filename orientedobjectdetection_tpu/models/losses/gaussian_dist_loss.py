"""Gaussian-distribution box losses (GWD / KLD / JD / BCD families).

TPU-native implementation of the reference's ``losses/gaussian_dist_loss.py``
and ``gaussian_dist_loss_v1.py``: OBBs become 2-D Gaussians
(mu, Sigma = R diag((w/2)^2,(h/2)^2) R^T) and the regression loss is a
closed-form distributional distance. All 2x2 linear algebra (det, inverse,
trace products) is written out elementwise — no ``linalg`` calls — so the
whole loss fuses into the train step on the VPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...utils.registry import LOSSES
from .common import reduce_loss


def xy_wh_r_2_xy_sigma(xywhr):
    """(..., 5) -> mu (..., 2), Sigma (..., 2, 2).

    Matches reference ``gaussian_dist_loss.py:11-36`` (wh clamped to
    [1e-7, 1e7]).
    """
    xy = xywhr[..., :2]
    wh = jnp.clip(xywhr[..., 2:4], 1e-7, 1e7)
    r = xywhr[..., 4]
    cos_r, sin_r = jnp.cos(r), jnp.sin(r)
    # Sigma = R diag((w/2)^2, (h/2)^2) R^T, expanded elementwise.
    a = (0.5 * wh[..., 0]) ** 2
    b = (0.5 * wh[..., 1]) ** 2
    s11 = a * cos_r ** 2 + b * sin_r ** 2
    s12 = (a - b) * sin_r * cos_r
    s22 = a * sin_r ** 2 + b * cos_r ** 2
    sigma = jnp.stack([s11, s12, s12, s22], -1).reshape(
        xywhr.shape[:-1] + (2, 2))
    return xy, sigma


def xy_stddev_pearson_2_xy_sigma(xysp):
    """Pearson parametrization -> (mu, Sigma) (reference
    ``gaussian_dist_loss.py:39-61``)."""
    xy = xysp[..., :2]
    stddev = xysp[..., 2:4]
    pearson = jnp.clip(xysp[..., 4], 1e-7 - 1, 1 - 1e-7)
    covar = pearson * stddev[..., 0] * stddev[..., 1]
    var = stddev ** 2
    sigma = jnp.stack([var[..., 0], covar, covar, var[..., 1]], -1).reshape(
        xysp.shape[:-1] + (2, 2))
    return xy, sigma


def _det2(S):
    return S[..., 0, 0] * S[..., 1, 1] - S[..., 0, 1] * S[..., 1, 0]


def _trace2(S):
    return S[..., 0, 0] + S[..., 1, 1]


def _trace_prod2(A, B):
    """Tr(A @ B) for (..., 2, 2)."""
    return (A[..., 0, 0] * B[..., 0, 0] + A[..., 0, 1] * B[..., 1, 0] +
            A[..., 1, 0] * B[..., 0, 1] + A[..., 1, 1] * B[..., 1, 1])


def postprocess(distance, fun: str = 'log1p', tau: float = 1.0):
    """Distance -> bounded loss (reference ``gaussian_dist_loss.py:64-88``)."""
    if fun == 'log1p':
        distance = jnp.log1p(distance)
    elif fun == 'sqrt':
        distance = jnp.sqrt(jnp.clip(distance, 1e-7))
    elif fun != 'none':
        raise ValueError(fun)
    if tau >= 1.0:
        return 1 - 1 / (tau + distance)
    return distance


def gwd_distance(pred, target, alpha: float = 1.0, normalize: bool = True):
    """Squared-root Gaussian Wasserstein distance using the 2x2 identity
    Tr(Z^1/2) = sqrt(Tr(Sp St) + 2 sqrt(det Sp det St)) (reference
    ``gaussian_dist_loss.py:92-153``)."""
    xy_p, Sp = pred
    xy_t, St = target
    xy_d = jnp.sum((xy_p - xy_t) ** 2, -1)
    whr_d = _trace2(Sp) + _trace2(St)
    t_tr = _trace_prod2(Sp, St)
    t_det_sqrt = jnp.sqrt(jnp.clip(_det2(Sp) * _det2(St), 1e-7))
    whr_d = whr_d - 2 * jnp.sqrt(jnp.clip(t_tr + 2 * t_det_sqrt, 1e-7))
    dis = jnp.sqrt(jnp.clip(xy_d + alpha * alpha * whr_d, 1e-7))
    if normalize:
        scale = 2 * jnp.clip(jnp.sqrt(jnp.sqrt(jnp.clip(t_det_sqrt, 1e-7))),
                             1e-7)
        dis = dis / scale
    return dis


def kld_distance(pred, target, alpha: float = 1.0, sqrt: bool = True):
    """KL(target || pred-centered) divergence, closed form 2x2 (reference
    ``gaussian_dist_loss.py:157-202``)."""
    xy_p, Sp = pred
    xy_t, St = target
    det_p = _det2(Sp)
    # inverse of Sp, elementwise
    inv00 = Sp[..., 1, 1] / det_p
    inv01 = -Sp[..., 0, 1] / det_p
    inv10 = -Sp[..., 1, 0] / det_p
    inv11 = Sp[..., 0, 0] / det_p
    dx = xy_p[..., 0] - xy_t[..., 0]
    dy = xy_p[..., 1] - xy_t[..., 1]
    xy_d = 0.5 * (dx * (inv00 * dx + inv01 * dy) +
                  dy * (inv10 * dx + inv11 * dy))
    tr = inv00 * St[..., 0, 0] + inv01 * St[..., 1, 0] + \
        inv10 * St[..., 0, 1] + inv11 * St[..., 1, 1]
    whr_d = 0.5 * tr + 0.5 * (jnp.log(det_p) - jnp.log(_det2(St))) - 1
    dis = xy_d / (alpha * alpha) + whr_d
    if sqrt:
        dis = jnp.sqrt(jnp.clip(dis, 1e-7))
    return dis


def bcd_distance(pred, target, alpha: float = 1.0, sqrt: bool = True):
    """Bhattacharyya distance (reference ``gaussian_dist_loss_v1.py``)."""
    xy_p, Sp = pred
    xy_t, St = target
    Sm = 0.5 * (Sp + St)
    det_m = _det2(Sm)
    inv00 = Sm[..., 1, 1] / det_m
    inv01 = -Sm[..., 0, 1] / det_m
    inv11 = Sm[..., 0, 0] / det_m
    dx = xy_p[..., 0] - xy_t[..., 0]
    dy = xy_p[..., 1] - xy_t[..., 1]
    xy_d = 0.125 * (dx * (inv00 * dx + inv01 * dy) +
                    dy * (inv01 * dx + inv11 * dy))
    whr_d = 0.5 * jnp.log(det_m / jnp.sqrt(
        jnp.clip(_det2(Sp) * _det2(St), 1e-7)))
    dis = alpha * alpha * xy_d + whr_d
    if sqrt:
        dis = jnp.sqrt(jnp.clip(dis, 1e-7))
    return dis


@LOSSES.register_module()
class GDLoss:
    """Gaussian-distance loss bag (reference ``gaussian_dist_loss.py:312-408``).

    loss_type: 'gwd' | 'kld' | 'jd' | 'kld_symmax' | 'kld_symmin'.
    """

    def __init__(self, loss_type: str, representation: str = 'xy_wh_r',
                 fun: str = 'log1p', tau: float = 0.0, alpha: float = 1.0,
                 reduction: str = 'mean', loss_weight: float = 1.0, **kwargs):
        assert loss_type in ('gwd', 'kld', 'jd', 'kld_symmax', 'kld_symmin')
        assert fun in ('log1p', 'none', 'sqrt')
        self.loss_type = loss_type
        self.preprocess = {'xy_wh_r': xy_wh_r_2_xy_sigma,
                           'xy_stddev_pearson': xy_stddev_pearson_2_xy_sigma
                           }[representation]
        self.fun = fun
        self.tau = tau
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.kwargs = kwargs

    def _distance(self, p, t):
        if self.loss_type == 'gwd':
            return gwd_distance(p, t, self.alpha,
                                self.kwargs.get('normalize', True))
        sqrt = self.kwargs.get('sqrt', True)
        if self.loss_type == 'kld':
            return kld_distance(p, t, self.alpha, sqrt)
        if self.loss_type == 'jd':
            d = 0.5 * (kld_distance(p, t, self.alpha, False) +
                       kld_distance(t, p, self.alpha, False))
            return jnp.sqrt(jnp.clip(d, 1e-7)) if sqrt else d
        kpt = kld_distance(p, t, self.alpha, sqrt)
        ktp = kld_distance(t, p, self.alpha, sqrt)
        if self.loss_type == 'kld_symmax':
            return jnp.maximum(kpt, ktp)
        return jnp.minimum(kpt, ktp)

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        p = self.preprocess(pred)
        t = self.preprocess(target)
        loss = postprocess(self._distance(p, t), self.fun, self.tau)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)


@LOSSES.register_module()
class GDLoss_v1:
    """Simplified v1 set: kld / gwd / bcd with center-term alpha
    (reference ``gaussian_dist_loss_v1.py``)."""

    def __init__(self, loss_type: str, fun: str = 'log1p', tau: float = 0.0,
                 alpha: float = 1.0, reduction: str = 'mean',
                 loss_weight: float = 1.0, **kwargs):
        assert loss_type in ('gwd', 'kld', 'bcd')
        assert fun in ('log1p', 'none', 'sqrt')
        self.loss_type = loss_type
        self.fun = fun
        self.tau = tau
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.kwargs = kwargs

    def __call__(self, pred, target, weight=None, avg_factor=None):
        if weight is not None and weight.ndim == pred.ndim:
            weight = weight.mean(-1)
        p = xy_wh_r_2_xy_sigma(pred)
        t = xy_wh_r_2_xy_sigma(target)
        if self.loss_type == 'gwd':
            d = gwd_distance(p, t, self.alpha,
                             self.kwargs.get('normalize', True))
        elif self.loss_type == 'kld':
            d = kld_distance(p, t, self.alpha, self.kwargs.get('sqrt', True))
        else:
            d = bcd_distance(p, t, self.alpha, self.kwargs.get('sqrt', True))
        loss = postprocess(d, self.fun, self.tau)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)
