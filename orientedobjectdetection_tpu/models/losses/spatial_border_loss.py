"""Spatial border loss (OrientedRepPoints; reference
``losses/spatial_border_loss.py``): penalizes learned points that fall
outside their assigned gt polygon, weighted by distance to the polygon
center."""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.points import points_in_polygons
from ...utils.registry import LOSSES
from .common import reduce_loss


@LOSSES.register_module()
class SpatialBorderLoss:
    def __init__(self, reduction: str = 'mean', loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pts, gt_polys, weight=None, avg_factor=None):
        """pts (N, 9*2); gt_polys (N, 8)."""
        n = pts.shape[0]
        p = pts.reshape(n, 9, 2)
        ctr_x = gt_polys[:, 0::2].mean(-1)
        ctr_y = gt_polys[:, 1::2].mean(-1)
        # per point: inside its own polygon?
        inside = jnp.stack([
            jnp.diagonal(points_in_polygons(p[:, i, :], gt_polys))
            for i in range(9)
        ], axis=1)                                           # (N, 9)
        d = jnp.sqrt((p[..., 0] - ctr_x[:, None]) ** 2 +
                     (p[..., 1] - ctr_y[:, None]) ** 2)
        loss = jnp.where(inside, 0.0, d).sum(-1)
        return self.loss_weight * reduce_loss(loss, weight, self.reduction,
                                              avg_factor)
