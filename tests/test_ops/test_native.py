"""Parity tests: native C++ host kernels vs the jnp device kernels and the
cv2 oracle (reference semantics: mmcv box_iou_rotated / nms_rotated)."""

import numpy as np
import pytest

from orientedobjectdetection_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='no C++ toolchain in this env')


def _random_boxes(n, seed=0, span=512.0):
    rng = np.random.RandomState(seed)
    return np.concatenate([
        rng.uniform(0, span, (n, 2)),
        rng.uniform(4, 96, (n, 2)),
        rng.uniform(-np.pi, np.pi, (n, 1)),
    ], -1).astype(np.float32)


def test_iou_matches_jnp_kernel():
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.ops.iou import box_iou_rotated
    b1, b2 = _random_boxes(64, 0), _random_boxes(48, 1)
    got = native.rbox_iou(b1, b2)
    want = np.asarray(box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=2e-3)
    got_iof = native.rbox_iou(b1, b2, mode='iof')
    want_iof = np.asarray(
        box_iou_rotated(jnp.asarray(b1), jnp.asarray(b2), mode='iof'))
    np.testing.assert_allclose(got_iof, want_iof, atol=2e-3)


def test_iou_matches_cv2_oracle():
    cv2 = pytest.importorskip('cv2')
    b1, b2 = _random_boxes(24, 2), _random_boxes(24, 3)
    got = native.rbox_iou(b1, b2)
    for i in range(24):
        r1 = ((b1[i, 0], b1[i, 1]), (b1[i, 2], b1[i, 3]),
              np.degrees(b1[i, 4]))
        a1 = b1[i, 2] * b1[i, 3]
        for j in range(24):
            r2 = ((b2[j, 0], b2[j, 1]), (b2[j, 2], b2[j, 3]),
                  np.degrees(b2[j, 4]))
            a2 = b2[j, 2] * b2[j, 3]
            ok, pts = cv2.rotatedRectangleIntersection(r1, r2)
            inter = 0.0
            if ok != cv2.INTERSECT_NONE and pts is not None:
                inter = cv2.contourArea(cv2.convexHull(pts))
            want = inter / (a1 + a2 - inter + 1e-6)
            assert abs(got[i, j] - want) < 2e-3, (i, j, got[i, j], want)


def test_iou_degenerate_and_identical():
    b = np.array([[100, 100, 20, 10, 0.3]], np.float32)
    assert abs(native.rbox_iou(b, b)[0, 0] - 1.0) < 1e-4
    # theta vs theta + pi is the same rectangle
    b2 = b.copy()
    b2[0, 4] += np.pi
    assert abs(native.rbox_iou(b, b2)[0, 0] - 1.0) < 1e-4
    # zero-size box: IoU 0 without NaN
    z = np.array([[100, 100, 0, 0, 0]], np.float32)
    assert native.rbox_iou(b, z)[0, 0] == 0.0
    assert np.isfinite(native.rbox_iou(z, z)).all()


def test_nms_matches_device_kernel():
    import jax.numpy as jnp
    from orientedobjectdetection_tpu.ops.nms import nms_rotated
    rng = np.random.RandomState(7)
    boxes = _random_boxes(200, 5, span=256.0)  # dense -> many suppressions
    scores = rng.uniform(size=200).astype(np.float32)
    for thr in (0.1, 0.5):
        got = native.nms_rotated(boxes, scores, thr)
        keep, order = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores),
                                  thr)
        keep, order = np.asarray(keep), np.asarray(order)
        want = order[keep[order]]
        np.testing.assert_array_equal(got, want)


def test_nms_hand_cases():
    # identical boxes: highest score wins; far boxes: both survive
    boxes = np.array([[50, 50, 20, 10, 0.2],
                      [50, 50, 20, 10, 0.2],
                      [300, 300, 20, 10, 1.0]], np.float32)
    keep = native.nms_rotated(boxes, np.array([0.5, 0.9, 0.7], np.float32),
                              0.5)
    np.testing.assert_array_equal(keep, [1, 2])
    # score tie: stable order keeps the lower index
    keep = native.nms_rotated(boxes[:2], np.array([0.5, 0.5], np.float32),
                              0.5)
    np.testing.assert_array_equal(keep, [0])


def test_nms_hbb():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    keep = native.nms_hbb(boxes, np.array([0.9, 0.8, 0.7], np.float32), 0.5)
    np.testing.assert_array_equal(keep, [0, 2])


def test_host_entrypoint_uses_native():
    from orientedobjectdetection_tpu.ops.nms import nms_rotated_np
    boxes = _random_boxes(50, 11)
    scores = np.random.RandomState(1).uniform(size=50).astype(np.float32)
    got = nms_rotated_np(boxes, scores, 0.2)
    want = native.nms_rotated(boxes, scores, 0.2)
    np.testing.assert_array_equal(got, want)
