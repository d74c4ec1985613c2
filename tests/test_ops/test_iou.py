"""Rotated IoU tests vs the independent OpenCV exact-intersection oracle
(model: reference tests/test_utils/test_overlaps.py)."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orientedobjectdetection_tpu.ops import (box_iou_rotated,
                                             diff_iou_rotated_2d,
                                             rbbox_overlaps)


def cv2_iou(b1, b2, mode='iou'):
    r1 = ((float(b1[0]), float(b1[1])), (float(b1[2]), float(b1[3])),
          float(np.degrees(b1[4])))
    r2 = ((float(b2[0]), float(b2[1])), (float(b2[2]), float(b2[3])),
          float(np.degrees(b2[4])))
    _, pts = cv2.rotatedRectangleIntersection(r1, r2)
    inter = 0.0 if pts is None or len(pts) < 3 else \
        cv2.contourArea(cv2.convexHull(pts))
    a1, a2 = b1[2] * b1[3], b2[2] * b2[3]
    denom = a1 if mode == 'iof' else a1 + a2 - inter
    return inter / max(denom, 1e-6)


def random_boxes(n, seed):
    rng = np.random.default_rng(seed)
    return np.stack([rng.uniform(0, 100, n), rng.uniform(0, 100, n),
                     rng.uniform(2, 60, n), rng.uniform(2, 60, n),
                     rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)


@pytest.mark.parametrize('mode', ['iou', 'iof'])
def test_matches_cv2(mode):
    b1 = random_boxes(40, 0)
    b2 = random_boxes(40, 1)
    ours = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2),
                                      mode=mode))
    ref = np.array([[cv2_iou(x, y, mode) for y in b2] for x in b1])
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_identical_boxes():
    b = random_boxes(32, 2)
    iou = np.asarray(box_iou_rotated(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)


def test_golden_cases():
    """Golden expectations in the spirit of reference
    tests/test_utils/test_overlaps.py:8-32 (degenerate + known overlaps)."""
    b1 = jnp.asarray([[0., 0., 10., 10., 0.],
                      [0., 0., 10., 10., 0.],
                      [0., 0., 10., 10., np.pi / 4]], jnp.float32)
    b2 = jnp.asarray([[0., 0., 10., 10., 0.],
                      [5., 5., 10., 10., 0.],
                      [0., 0., 10., 10., -np.pi / 4]], jnp.float32)
    iou = np.asarray(box_iou_rotated(b1, b2, aligned=True))
    np.testing.assert_allclose(iou[0], 1.0, atol=1e-4)
    np.testing.assert_allclose(iou[1], 25. / 175., atol=1e-4)
    # two squares at +-45deg around same center: octagon intersection
    inter = 100 * (2 * (np.sqrt(2) - 1))**2 * (np.sqrt(2) + 1) / 2
    expected = 8 * (np.sqrt(2) - 1) ** 2 / 2 * 100 / \
        (200 - 8 * (np.sqrt(2) - 1) ** 2 / 2 * 100 / 100 * 100)
    # compute exact with cv2 instead of fragile algebra
    exact = cv2_iou(np.asarray(b1[2]), np.asarray(b2[2]))
    np.testing.assert_allclose(iou[2], exact, atol=1e-3)


def test_degenerate_clamped():
    deg = jnp.asarray([[10., 10., 0., 0., 0.], [10., 10., 5., 5., 0.]])
    iou = np.asarray(rbbox_overlaps(deg, deg))
    assert np.isfinite(iou).all()
    assert iou[1, 1] > 0.999
    assert iou[0, 1] < 1e-4


def test_angle_period():
    b1 = jnp.asarray([[50., 50., 20., 10., 0.7]])
    b2 = jnp.asarray([[50., 50., 20., 10., 0.7 + np.pi]])
    assert float(box_iou_rotated(b1, b2)[0, 0]) > 0.999


def test_grad_finite():
    b1 = jnp.asarray([[50., 50., 20., 10., 0.3]])
    b2 = jnp.asarray([[52., 51., 18., 12., 0.5]])
    g = jax.grad(lambda b: diff_iou_rotated_2d(b, b2).sum())(b1)
    assert np.isfinite(np.asarray(g)).all()
    # IoU must increase when moving b1 toward b2: gradient of x positive
    assert float(g[0, 0]) > 0


def test_empty_inputs():
    out = rbbox_overlaps(jnp.zeros((0, 5)), jnp.zeros((3, 5)))
    assert out.shape == (0, 3)
    out = rbbox_overlaps(jnp.zeros((3, 5)), jnp.zeros((0, 5)))
    assert out.shape == (3, 0)


def test_pallas_kernel_matches_jnp():
    """The Pallas tile kernel (interpreter mode — exercises the kernel math
    on any backend; on TPU the same kernel is the production path for NMS
    pair masks and large assignment matrices) must agree with the jnp
    reference path on distinct box pairs. Coincident-geometry pairs
    (self-IoU diagonals) are excluded: the kernel evaluates in a global
    frame where the coincident-edge tie-break is fp32-sensitive (self-pairs
    are never consumed by NMS/assignment)."""
    from orientedobjectdetection_tpu.ops.iou_pallas import \
        box_iou_rotated_pallas_interpret
    b1 = jnp.asarray(random_boxes(150, 7))
    b2 = jnp.asarray(random_boxes(150, 8))
    ref = np.asarray(box_iou_rotated(b1, b2))
    pal = np.asarray(box_iou_rotated_pallas_interpret(b1, b2))
    np.testing.assert_allclose(pal, ref, atol=2e-3)


def test_pallas_pair_mask_matches_jnp():
    """The fused NMS pair-mask kernel (threshold + strict upper triangle +
    lower-tile skip) must reproduce the jnp blocked path's mask bit-for-bit
    away from the threshold boundary."""
    from orientedobjectdetection_tpu.ops.iou_pallas import \
        nms_pair_mask_pallas
    boxes = jnp.asarray(random_boxes(300, 11))
    thr = 0.1
    iou = np.asarray(box_iou_rotated(boxes, boxes))
    n = len(iou)
    idx = np.arange(n)
    ref = (iou > thr) & (idx[:, None] < idx[None, :])
    got = np.asarray(nms_pair_mask_pallas(boxes, thr, interpret=True))
    # ignore pairs within 2e-3 of the threshold (fp32 conditioning skew)
    boundary = np.abs(iou - thr) < 2e-3
    np.testing.assert_array_equal(got[~boundary], ref[~boundary])
    assert not got[np.tril_indices(n)].any()


def test_topk_candidates_cpu_fallback_exact():
    from orientedobjectdetection_tpu.ops.nms import topk_candidates
    x = jnp.asarray(np.random.RandomState(0).randn(500).astype(np.float32))
    v, i = topk_candidates(x, 50)
    ve, ie = jax.lax.top_k(x, 50)
    np.testing.assert_allclose(np.sort(np.asarray(v)),
                               np.sort(np.asarray(ve)))


def test_pallas_spatial_tile_skip_interpret():
    """The reachability tile skip must be conservative: interpret-mode
    matrix equals the jnp kernel on spatially clustered boxes (grid-ordered
    anchors x few gt is the production assignment shape)."""
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.ops.iou import box_iou_rotated
    from orientedobjectdetection_tpu.ops.iou_pallas import (
        box_iou_rotated_pallas)
    rng = np.random.default_rng(5)
    # anchors on a grid (spatial locality), gts in one corner
    xs, ys = np.meshgrid(np.arange(40) * 25.0, np.arange(40) * 25.0)
    anchors = np.stack([xs.ravel(), ys.ravel(),
                        np.full(1600, 40.0), np.full(1600, 20.0),
                        np.zeros(1600)], -1).astype(np.float32)
    gts = np.stack([rng.uniform(0, 200, 24), rng.uniform(0, 200, 24),
                    rng.uniform(20, 80, 24), rng.uniform(20, 80, 24),
                    rng.uniform(-1.5, 1.5, 24)], -1).astype(np.float32)
    got = np.asarray(box_iou_rotated_pallas(jnp.asarray(gts),
                                            jnp.asarray(anchors),
                                            interpret=True))
    ref = np.asarray(box_iou_rotated(jnp.asarray(gts), jnp.asarray(anchors)))
    np.testing.assert_allclose(got, ref, atol=2e-3)
