"""Anchor-grid and coder round-trip tests
(model: reference tests/test_utils/test_ranchor.py + coder usage)."""

import numpy as np
import pytest

import jax.numpy as jnp

from orientedobjectdetection_tpu.core import (CSLCoder,
                                              DeltaXYWHAOBBoxCoder,
                                              DistanceAnglePointCoder,
                                              MidpointOffsetCoder,
                                              MlvlPointGenerator,
                                              RotatedAnchorGenerator)
from orientedobjectdetection_tpu.ops import norm_angle


def test_anchor_grid_exact():
    gen = RotatedAnchorGenerator(strides=[8], ratios=[1.0], scales=[4.0])
    anchors = np.asarray(gen.grid_priors([(2, 2)])[0])
    assert anchors.shape == (4, 5)
    # anchor 0 at origin: 32x32 centered at (0,0), theta 0
    np.testing.assert_allclose(anchors[0], [0, 0, 32, 32, 0], atol=1e-5)
    np.testing.assert_allclose(anchors[1], [8, 0, 32, 32, 0], atol=1e-5)
    np.testing.assert_allclose(anchors[2], [0, 8, 32, 32, 0], atol=1e-5)


def test_anchor_octave_scales():
    gen = RotatedAnchorGenerator(strides=[8], ratios=[1.0, 0.5, 2.0],
                                 octave_base_scale=4, scales_per_octave=3)
    assert gen.num_base_anchors == [9]
    anchors = np.asarray(gen.grid_priors([(1, 1)])[0])
    areas = anchors[:, 2] * anchors[:, 3]
    np.testing.assert_allclose(areas.min(), 32 * 32, rtol=1e-5)


def test_point_generator():
    gen = MlvlPointGenerator(strides=[8, 16], offset=0.5)
    pts = gen.grid_priors([(2, 2), (1, 1)], with_stride=True)
    np.testing.assert_allclose(np.asarray(pts[0])[0], [4, 4, 8, 8])
    np.testing.assert_allclose(np.asarray(pts[1])[0], [8, 8, 16, 16])


@pytest.mark.parametrize('kw', [
    dict(angle_range='oc'),
    dict(angle_range='le90', edge_swap=True, proj_xy=True),
    dict(angle_range='le135', norm_factor=2.0),
])
def test_delta_coder_roundtrip(kw):
    rng = np.random.default_rng(0)
    n = 64
    anchors = jnp.asarray(np.stack([
        rng.uniform(50, 200, n), rng.uniform(50, 200, n),
        rng.uniform(20, 60, n), rng.uniform(20, 60, n),
        np.zeros(n)], -1), jnp.float32)
    ar = kw['angle_range']
    lo, hi = dict(oc=(1e-3, np.pi / 2), le90=(-np.pi / 2, np.pi / 2),
                  le135=(-np.pi / 4, 3 * np.pi / 4))[ar]
    w = rng.uniform(25, 50, n)
    h = rng.uniform(10, 24, n)
    gts = np.stack([rng.uniform(60, 190, n), rng.uniform(60, 190, n),
                    np.maximum(w, h), np.minimum(w, h),
                    rng.uniform(lo, hi - 1e-3, n)], -1)
    gts = jnp.asarray(gts, jnp.float32)
    coder = DeltaXYWHAOBBoxCoder(**kw)
    deltas = coder.encode(anchors, gts)
    decoded = np.asarray(coder.decode(anchors, deltas))
    ref = np.asarray(gts)
    np.testing.assert_allclose(decoded[:, :2], ref[:, :2], atol=1e-2)
    # w/h may be swapped with +-pi/2 angle change under edge_swap; compare
    # areas and canonical angle difference instead
    np.testing.assert_allclose(decoded[:, 2] * decoded[:, 3],
                               ref[:, 2] * ref[:, 3], rtol=1e-3)
    da = np.abs(np.asarray(norm_angle(decoded[:, 4] - ref[:, 4], 'le90')))
    swapped = np.minimum(da, np.abs(da - np.pi / 2))
    assert swapped.max() < 1e-3


def test_distance_angle_coder_roundtrip():
    rng = np.random.default_rng(1)
    n = 32
    pts = jnp.asarray(rng.uniform(50, 200, (n, 2)), jnp.float32)
    gts = jnp.asarray(np.stack([
        rng.uniform(50, 200, n), rng.uniform(50, 200, n),
        rng.uniform(30, 60, n), rng.uniform(10, 28, n),
        rng.uniform(-np.pi / 2, np.pi / 2, n)], -1), jnp.float32)
    coder = DistanceAnglePointCoder(angle_range='le90')
    enc = coder.encode(pts, gts)
    dec = np.asarray(coder.decode(pts, enc))
    np.testing.assert_allclose(dec, np.asarray(gts), atol=1e-3)


def test_midpoint_offset_roundtrip():
    rng = np.random.default_rng(2)
    n = 32
    w = rng.uniform(30, 60, n)
    h = rng.uniform(10, 28, n)
    gts = jnp.asarray(np.stack([
        rng.uniform(80, 180, n), rng.uniform(80, 180, n),
        np.maximum(w, h), np.minimum(w, h),
        rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, n)], -1),
        jnp.float32)
    hbbs = jnp.asarray(np.stack([
        rng.uniform(60, 100, n), rng.uniform(60, 100, n),
        rng.uniform(150, 220, n), rng.uniform(150, 220, n)], -1),
        jnp.float32)
    coder = MidpointOffsetCoder()
    deltas = coder.encode(hbbs, gts)
    dec = np.asarray(coder.decode(hbbs, deltas))
    ref = np.asarray(gts)
    np.testing.assert_allclose(dec[:, :2], ref[:, :2], atol=0.3)
    np.testing.assert_allclose(dec[:, 2] * dec[:, 3],
                               ref[:, 2] * ref[:, 3], rtol=0.05)


def test_csl_coder():
    coder = CSLCoder(angle_version='le90', omega=1, window='gaussian',
                     radius=6)
    assert coder.coding_len == 180
    angles = jnp.asarray([[-1.2], [0.0], [1.0]], jnp.float32)
    enc = coder.encode(angles)
    assert enc.shape == (3, 180)
    dec = np.asarray(coder.decode(enc))
    np.testing.assert_allclose(dec, angles[:, 0], atol=np.radians(1.0))
