"""Convex point-set op tests vs cv2 oracles."""

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from orientedobjectdetection_tpu.ops.points import (chamfer_distance,
                                                    convex_giou, convex_hull,
                                                    convex_iou,
                                                    min_area_polygons,
                                                    points_in_polygons)


def hull_area(ring):
    ring = np.asarray(ring)
    return abs(0.5 * np.sum(ring[:, 0] * np.roll(ring[:, 1], -1) -
                            np.roll(ring[:, 0], -1) * ring[:, 1]))


def test_convex_hull_matches_cv2():
    rng = np.random.default_rng(0)
    for _ in range(5):
        p = rng.uniform(0, 100, (9, 2)).astype(np.float32)
        ours = hull_area(convex_hull(jnp.asarray(p)))
        ref = cv2.contourArea(cv2.convexHull(p))
        np.testing.assert_allclose(ours, ref, rtol=1e-3)


def test_min_area_polygons_matches_cv2():
    rng = np.random.default_rng(1)
    for _ in range(5):
        p = rng.uniform(0, 100, (9, 2)).astype(np.float32)
        poly = np.asarray(min_area_polygons(jnp.asarray(p.reshape(1, 18))))
        ours = cv2.contourArea(poly.reshape(4, 2))
        (_, (w, h), _) = cv2.minAreaRect(p)
        np.testing.assert_allclose(ours, w * h, rtol=0.02, atol=0.5)


def test_convex_iou_contained():
    rng = np.random.default_rng(2)
    quad = np.array([[0, 0, 10, 0, 10, 10, 0, 10]], np.float32)
    pts = rng.uniform(2, 8, (1, 18)).astype(np.float32)
    iou = float(np.asarray(convex_iou(jnp.asarray(pts),
                                      jnp.asarray(quad)))[0, 0])
    ah = hull_area(convex_hull(jnp.asarray(pts.reshape(9, 2))))
    np.testing.assert_allclose(iou, ah / 100, rtol=1e-3)


def test_convex_giou_degenerate_pointset_bounded():
    """All-coincident points (untrained net output) must stay in [-1, 1]."""
    quad = jnp.asarray([[0., 0., 10., 0., 10., 10., 0., 10.]])
    pts = jnp.full((1, 18), 5.0)
    g = float(np.asarray(convex_giou(pts, quad))[0])
    assert -1.001 <= g <= 1.001
    grad = jax.grad(lambda x: convex_giou(x, quad).sum())(pts)
    assert np.isfinite(np.asarray(grad)).all()


def test_points_in_polygons():
    quad = jnp.asarray([[0., 0., 10., 0., 10., 10., 0., 10.]])
    out = np.asarray(points_in_polygons(
        jnp.asarray([[5., 5.], [20., 20.]]), quad))
    assert out[0, 0] and not out[1, 0]


def test_chamfer():
    d1, d2 = chamfer_distance(jnp.zeros((1, 3, 2)), jnp.ones((1, 4, 2)))
    np.testing.assert_allclose(float(d1[0]), np.sqrt(2), rtol=1e-5)
