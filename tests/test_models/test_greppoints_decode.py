"""G-RepPoints decode regression: the KLD losses train the point set's
fitted Gaussian (nothing constrains the raw hull), so eval must decode the
box from the same statistic — gmm_fit + the inverse L=3 Gaussian bridge —
or a converged model scores ~0 mAP (caught live on the synth protocol)."""

import numpy as np
import pytest


def _gaussian_pointset(box, version='le135', n=9, seed=0):
    """n points whose empirical mean/cov EXACTLY match the box Gaussian."""
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.ops.boxes import (gt2gaussian_poly,
                                                       obb2poly)
    poly = obb2poly(jnp.asarray([box]), version)
    mu, sigma = (np.asarray(t)[0] for t in gt2gaussian_poly(poly))
    rng = np.random.RandomState(seed)
    z = rng.randn(n, 2)
    z -= z.mean(0)
    white = z @ np.linalg.inv(np.linalg.cholesky(
        np.cov(z.T, bias=True) + 1e-12 * np.eye(2))).T
    return (white @ np.linalg.cholesky(sigma).T + mu).astype(np.float32)


@pytest.mark.parametrize('box', [
    (100., 80., 40., 20., 0.5),
    (30., 200., 12., 60., -0.7),
    (128., 128., 50., 50., 0.0),
])
def test_kld_head_decodes_box_from_fitted_gaussian(box):
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.models.dense_heads import \
        rotated_reppoints_head as rph
    from orientedobjectdetection_tpu.ops.boxes import poly2obb
    head = rph.KLDRepPointsHead(num_classes=2, in_channels=8,
                                feat_channels=8, point_feat_channels=8,
                                version='le135')
    pts = _gaussian_pointset(box)
    polys = head.pointsets_to_polys(jnp.asarray(pts.reshape(1, 18)))
    dec = np.asarray(poly2obb(polys, 'le135'))[0]
    assert abs(dec[0] - box[0]) < 1.0 and abs(dec[1] - box[1]) < 1.0
    assert abs(dec[2] * dec[3] - box[2] * box[3]) / (box[2] * box[3]) < 0.05


def test_base_head_still_uses_min_area_rect():
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.models.dense_heads import \
        rotated_reppoints_head as rph
    head = rph.RotatedRepPointsHead(num_classes=2, in_channels=8,
                                    feat_channels=8, point_feat_channels=8)
    # an L-shaped spread: min-area rect must enclose ALL points
    pts = np.array([[0, 0], [10, 0], [0, 10], [1, 1], [2, 0], [0, 2],
                    [3, 0], [0, 3], [1, 0]], np.float32)
    poly = np.asarray(head.pointsets_to_polys(
        jnp.asarray(pts.reshape(1, 18))))[0].reshape(4, 2)
    # every point inside the rect (within tolerance)
    c = poly.mean(0)
    e1 = poly[1] - poly[0]
    e2 = poly[2] - poly[1]
    for p in pts:
        r = p - c
        assert abs(r @ e1) <= 0.5 * e1 @ e1 + 1e-3
        assert abs(r @ e2) <= 0.5 * e2 @ e2 + 1e-3
