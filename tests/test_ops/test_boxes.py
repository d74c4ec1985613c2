"""Geometry-core tests (model: reference tests/test_utils/test_rutils.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from orientedobjectdetection_tpu.ops import (hbb2obb, norm_angle, obb2hbb,
                                             obb2poly, obb2poly_np, obb2xyxy,
                                             poly2obb, poly2obb_np)

VERSIONS = ('oc', 'le90', 'le135')


def random_obbs(n=64, version='le90', seed=0):
    rng = np.random.default_rng(seed)
    w = rng.uniform(20, 200, n)
    h = rng.uniform(10, 100, n)
    if version in ('le90', 'le135'):
        w, h = np.maximum(w, h), np.minimum(w, h)
    if version == 'oc':
        a = rng.uniform(1e-3, np.pi / 2, n)
    elif version == 'le90':
        a = rng.uniform(-np.pi / 2, np.pi / 2 - 1e-3, n)
    else:
        a = rng.uniform(-np.pi / 4, 3 * np.pi / 4 - 1e-3, n)
    return np.stack([rng.uniform(100, 900, n), rng.uniform(100, 900, n),
                     w, h, a], -1).astype(np.float32)


@pytest.mark.parametrize('version', VERSIONS)
def test_obb_poly_roundtrip(version):
    obbs = random_obbs(version=version)
    polys = obb2poly(jnp.asarray(obbs), version)
    back = np.asarray(poly2obb(polys, version))
    np.testing.assert_allclose(back[:, :2], obbs[:, :2], atol=1e-3)
    # w/h may swap with a +-pi/2 angle shift for degenerate near-square boxes;
    # the sampled boxes are long so direct comparison is safe.
    np.testing.assert_allclose(back[:, 2:4], obbs[:, 2:4], rtol=1e-4,
                               atol=1e-2)
    da = np.abs(np.asarray(norm_angle(back[:, 4] - obbs[:, 4], 'le90')))
    assert da.max() < 1e-4


@pytest.mark.parametrize('version', VERSIONS)
def test_np_loader_matches_jnp(version):
    """poly2obb_np (cv2 path) and the batched jnp converter agree on the
    resulting geometry (same rectangle, possibly different (w,h,a) labels)."""
    obbs = random_obbs(n=16, version=version, seed=1)
    polys = np.asarray(obb2poly(jnp.asarray(obbs), version))
    for i in range(16):
        out = poly2obb_np(polys[i], version)
        assert out is not None
        x, y, w, h, a = out
        np.testing.assert_allclose([x, y], obbs[i, :2], atol=1e-2)
        # compare as polygons (label-invariant)
        p1 = np.asarray(obb2poly(jnp.asarray([[x, y, w, h, a]],
                                             dtype=np.float32), version))[0]
        c1 = p1.reshape(4, 2)
        c2 = polys[i].reshape(4, 2)
        # same vertex set up to cyclic order/reflection
        d = np.abs(c1[:, None] - c2[None]).sum(-1)
        assert (d.min(axis=1) < 0.5).all()


def test_obb2xyxy_circumscribes():
    obbs = random_obbs(version='le90', seed=2)
    xyxy = np.asarray(obb2xyxy(jnp.asarray(obbs), 'le90'))
    polys = np.asarray(obb2poly(jnp.asarray(obbs), 'le90')).reshape(-1, 4, 2)
    np.testing.assert_allclose(xyxy[:, 0], polys[..., 0].min(1), atol=1e-2)
    np.testing.assert_allclose(xyxy[:, 2], polys[..., 0].max(1), atol=1e-2)
    np.testing.assert_allclose(xyxy[:, 1], polys[..., 1].min(1), atol=1e-2)
    np.testing.assert_allclose(xyxy[:, 3], polys[..., 1].max(1), atol=1e-2)


@pytest.mark.parametrize('version', VERSIONS)
def test_hbb2obb_obb2hbb(version):
    hbbs = jnp.asarray([[0., 0., 100., 40.], [10., 10., 30., 90.]])
    obbs = hbb2obb(hbbs, version)
    xyxy = np.asarray(obb2xyxy(obbs, version))
    np.testing.assert_allclose(xyxy, np.asarray(hbbs), atol=1e-3)
    # obb2hbb of an axis-aligned obb is itself (up to convention)
    back = obb2hbb(obbs, version)
    np.testing.assert_allclose(np.asarray(obb2xyxy(back, version)),
                               np.asarray(hbbs), atol=1e-3)


def test_obb2poly_np_best_begin_point():
    # DOTA submission order: first corner nearest the (xmin,ymin) corner.
    obbs = np.array([[50, 50, 40, 20, 0.2, 0.9]], np.float32)
    polys = obb2poly_np(obbs, 'le90')
    assert polys.shape == (1, 9)
    pts = polys[0, :8].reshape(4, 2)
    d0 = np.linalg.norm(pts - [pts[:, 0].min(), pts[:, 1].min()], axis=1)
    assert d0.argmin() == 0


def test_norm_angle_ranges():
    angles = np.linspace(-4 * np.pi, 4 * np.pi, 1001)
    le90 = np.asarray(norm_angle(jnp.asarray(angles), 'le90'))
    assert (le90 >= -np.pi / 2 - 1e-6).all() and (le90 < np.pi / 2 + 1e-6).all()
    le135 = np.asarray(norm_angle(jnp.asarray(angles), 'le135'))
    assert (le135 >= -np.pi / 4 - 1e-6).all() and \
        (le135 < 3 * np.pi / 4 + 1e-6).all()
