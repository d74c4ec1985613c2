"""KLD loss for point sets (G-RepPoints; reference
``losses/kld_reppoints_loss.py``): fit a Gaussian to the point set (mean +
covariance) and take the KL divergence to the gt box's Gaussian."""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.boxes import gt2gaussian, poly2obb
from ...utils.registry import LOSSES
from .common import reduce_loss
from .gaussian_dist_loss import postprocess


@LOSSES.register_module()
class KLDRepPointsLoss:
    def __init__(self, eps: float = 1e-6, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pts, gt_polys, weight=None, avg_factor=None,
                 version: str = 'le90'):
        """pts (N, 18); gt_polys (N, 8)."""
        p = pts.reshape(-1, 9, 2)
        mu_p = p.mean(1)                                     # (N, 2)
        d = p - mu_p[:, None]
        sigma_p = jnp.einsum('npi,npj->nij', d, d) / 9 + \
            self.eps * jnp.eye(2)[None]
        mu_t, sigma_t = gt2gaussian(poly2obb(gt_polys, version))
        # KL(t || p) closed form 2x2
        det_p = sigma_p[:, 0, 0] * sigma_p[:, 1, 1] - \
            sigma_p[:, 0, 1] * sigma_p[:, 1, 0]
        det_t = sigma_t[:, 0, 0] * sigma_t[:, 1, 1] - \
            sigma_t[:, 0, 1] * sigma_t[:, 1, 0]
        inv00 = sigma_p[:, 1, 1] / det_p
        inv01 = -sigma_p[:, 0, 1] / det_p
        inv11 = sigma_p[:, 0, 0] / det_p
        dx = mu_p[:, 0] - mu_t[:, 0]
        dy = mu_p[:, 1] - mu_t[:, 1]
        xy = 0.5 * (dx * (inv00 * dx + inv01 * dy) +
                    dy * (inv01 * dx + inv11 * dy))
        tr = inv00 * sigma_t[:, 0, 0] + 2 * inv01 * sigma_t[:, 0, 1] + \
            inv11 * sigma_t[:, 1, 1]
        kld = xy + 0.5 * (tr + jnp.log(jnp.maximum(det_p, 1e-12)) -
                          jnp.log(jnp.maximum(det_t, 1e-12)) - 2)
        loss = postprocess(jnp.sqrt(jnp.clip(kld, 1e-7)), 'log1p', 1.0)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)
