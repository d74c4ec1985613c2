"""KLD loss for point sets (G-RepPoints; reference
``losses/kld_reppoints_loss.py``): fit a single-component Gaussian to the
predicted point set with the batched EM GMM (``core/gmm.py``; reference
``GaussianMixture(n_components=1)``), take the KL divergence to the gt
polygon's Gaussian (L=3 convention, ``transforms.py:916-937``), and map it
to ``1 - 1/(2 + sqrt(kld))``."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.gmm import gmm_fit
from ...ops.boxes import gt2gaussian_poly
from ...utils.registry import LOSSES
from .common import reduce_loss


def kld_fitted_to_gt(pts, gt_polys, eps: float = 1e-6):
    """KL( fitted-pointset-gaussian || gt-gaussian ) per row.

    pts (..., N, 9, 2) or (N, 18); gt_polys (N, 8).
    Reference ``kld_single2single`` (kld_reppoints_loss.py:10-37):
    0.5 * (delta' St^-1 delta + tr(St^-1 Sp) + log det St / det Sp) - 1.
    """
    p = pts.reshape(-1, 9, 2)
    _, mu_p, cov_p = gmm_fit(p, n_components=1, n_iter=2, eps=eps)
    mu_p = mu_p[..., 0, :]                                   # (N, 2)
    sigma_p = cov_p[..., 0, :, :]                            # (N, 2, 2)
    mu_t, sigma_t = gt2gaussian_poly(gt_polys)

    det_t = sigma_t[:, 0, 0] * sigma_t[:, 1, 1] - \
        sigma_t[:, 0, 1] * sigma_t[:, 1, 0]
    det_p = sigma_p[:, 0, 0] * sigma_p[:, 1, 1] - \
        sigma_p[:, 0, 1] * sigma_p[:, 1, 0]
    det_t = jnp.maximum(det_t, 1e-12)
    det_p = jnp.maximum(det_p, 1e-12)
    # inverse of target sigma
    inv00 = sigma_t[:, 1, 1] / det_t
    inv01 = -sigma_t[:, 0, 1] / det_t
    inv11 = sigma_t[:, 0, 0] / det_t
    dx = mu_p[:, 0] - mu_t[:, 0]
    dy = mu_p[:, 1] - mu_t[:, 1]
    term1 = dx * (inv00 * dx + inv01 * dy) + dy * (inv01 * dx + inv11 * dy)
    tr = inv00 * sigma_p[:, 0, 0] + 2 * inv01 * sigma_p[:, 0, 1] + \
        inv11 * sigma_p[:, 1, 1]
    return 0.5 * (term1 + tr + jnp.log(det_t / det_p)) - 1.0


@LOSSES.register_module()
class KLDRepPointsLoss:
    def __init__(self, eps: float = 1e-6, reduction: str = 'mean',
                 loss_weight: float = 1.0):
        self.eps = eps
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pts, gt_polys, weight=None, avg_factor=None):
        """pts (N, 18); gt_polys (N, 8)."""
        kld = jnp.clip(kld_fitted_to_gt(pts, gt_polys, self.eps),
                       self.eps)
        loss = 1.0 - 1.0 / (2.0 + jnp.sqrt(kld))
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)
