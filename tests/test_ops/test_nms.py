"""NMS tests: exact greedy semantics with static shapes."""

import numpy as np

import jax.numpy as jnp

from orientedobjectdetection_tpu.ops import (box_iou_rotated,
                                             multiclass_nms_rotated, nms_hbb,
                                             nms_rotated)


def reference_greedy_nms(boxes, scores, thr):
    """Trivially-correct host-side greedy NMS."""
    order = np.argsort(-scores)
    keep = []
    iou = np.asarray(box_iou_rotated(jnp.asarray(boxes), jnp.asarray(boxes)))
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if scores[j] < scores[i] and iou[i, j] > thr:
                suppressed[j] = True
    return sorted(keep)


def test_matches_host_greedy():
    rng = np.random.default_rng(0)
    boxes = np.stack([rng.uniform(0, 200, 100), rng.uniform(0, 200, 100),
                      rng.uniform(10, 60, 100), rng.uniform(10, 60, 100),
                      rng.uniform(-1.5, 1.5, 100)], -1).astype(np.float32)
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    keep, _ = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.3)
    ours = sorted(np.nonzero(np.asarray(keep))[0].tolist())
    ref = reference_greedy_nms(boxes, scores, 0.3)
    assert ours == ref


def test_identical_boxes_keep_one():
    boxes = jnp.asarray([[50., 50., 20., 10., 0.3]] * 5)
    scores = jnp.asarray([0.5, 0.9, 0.7, 0.6, 0.8])
    keep, _ = nms_rotated(boxes, scores, 0.5)
    k = np.nonzero(np.asarray(keep))[0]
    assert list(k) == [1]


def test_valid_mask_excludes_padding():
    boxes = jnp.asarray([[50., 50., 20., 10., 0.], [500., 500., 5., 5., 0.]])
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.asarray([True, False])
    keep, _ = nms_rotated(boxes, scores, 0.5, valid_mask=valid)
    assert np.asarray(keep).tolist() == [True, False]


def test_nms_hbb():
    boxes = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.],
                         [100., 100., 110., 110.]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, _ = nms_hbb(boxes, scores, 0.5)
    assert np.asarray(keep).tolist() == [True, False, True]


def test_multiclass_separates_classes():
    # Same box location, two classes: both must survive (class offset trick).
    boxes = jnp.asarray([[50., 50., 20., 10., 0.2]])
    scores = jnp.asarray([[0.9, 0.8, 0.0]])  # 2 fg classes + bg
    dets, labels, valid = multiclass_nms_rotated(boxes, scores, 0.05, 0.1, 5)
    assert int(np.asarray(valid).sum()) == 2
    assert sorted(np.asarray(labels)[np.asarray(valid)].tolist()) == [0, 1]
    # scores sorted descending
    s = np.asarray(dets)[:, 5]
    assert s[0] >= s[1]


def test_multiclass_score_threshold():
    boxes = jnp.asarray([[50., 50., 20., 10., 0.2]])
    scores = jnp.asarray([[0.04, 0.03, 0.93]])
    dets, labels, valid = multiclass_nms_rotated(boxes, scores, 0.05, 0.1, 5)
    assert int(np.asarray(valid).sum()) == 0
    assert (np.asarray(labels) == -1).all()
    assert (np.asarray(dets) == 0).all()


def test_class_major_nms_same_keep_set():
    """class_ids NMS (class-major greedy + tile class skip) must return the
    exact keep set of plain score-major NMS when boxes carry the class
    offset (cross-class IoU structurally zero)."""
    rng = np.random.default_rng(7)
    n, c = 300, 7
    boxes = np.stack([rng.uniform(0, 500, n), rng.uniform(0, 500, n),
                      rng.uniform(10, 80, n), rng.uniform(10, 80, n),
                      rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    boxes[:, :2] += labels[:, None] * 2000.0          # class-offset trick
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep_plain, _ = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.2)
    keep_cls, _ = nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), 0.2,
                              class_ids=jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(keep_plain),
                                  np.asarray(keep_cls))


def test_jnp_pair_mask_class_prune_matches_pallas():
    """The jnp fallback's class_ids pruning must execute the SAME
    suppression logic as the Pallas kernel's class-tile skip — checked on
    boxes where cross-class pairs genuinely overlap (no class offset), so
    a fallback that ignored class_ids would differ."""
    from orientedobjectdetection_tpu.ops.iou_pallas import \
        nms_pair_mask_pallas
    from orientedobjectdetection_tpu.ops.nms import _upper_pair_mask
    rng = np.random.default_rng(11)
    n = 96
    labels = np.sort(rng.integers(0, 4, n)).astype(np.int32)   # class-major
    boxes = np.stack([rng.uniform(0, 120, n), rng.uniform(0, 120, n),
                      rng.uniform(20, 80, n), rng.uniform(20, 80, n),
                      rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    jnp_mask = np.asarray(_upper_pair_mask(
        jnp.asarray(boxes), box_iou_rotated, 0.2,
        class_ids=jnp.asarray(labels)))
    pl_mask = np.asarray(nms_pair_mask_pallas(
        jnp.asarray(boxes), 0.2, interpret=True,
        class_ids=jnp.asarray(labels)))
    np.testing.assert_array_equal(jnp_mask, pl_mask[:n, :n])
    # and it must actually prune: some cross-class pair overlaps here
    full = np.asarray(_upper_pair_mask(jnp.asarray(boxes),
                                       box_iou_rotated, 0.2))
    cross = labels[:, None] != labels[None, :]
    assert (full & cross).any()
    assert not (jnp_mask & cross).any()


def test_pallas_pair_mask_class_skip_interpret():
    """The kernel's class-range tile skip must not change the mask when
    cross-class IoU is zero (class-offset layout, class-major sorted)."""
    from orientedobjectdetection_tpu.ops.iou_pallas import \
        nms_pair_mask_pallas
    rng = np.random.default_rng(3)
    n = 160                                            # > one 128-tile
    labels = np.sort(rng.integers(0, 5, n)).astype(np.int32)
    boxes = np.stack([rng.uniform(0, 300, n) + labels * 1000,
                      rng.uniform(0, 300, n),
                      rng.uniform(10, 60, n), rng.uniform(10, 60, n),
                      rng.uniform(-1.5, 1.5, n)], -1).astype(np.float32)
    base = np.asarray(nms_pair_mask_pallas(jnp.asarray(boxes), 0.2,
                                           interpret=True))
    skip = np.asarray(nms_pair_mask_pallas(jnp.asarray(boxes), 0.2,
                                           interpret=True,
                                           class_ids=jnp.asarray(labels)))
    np.testing.assert_array_equal(base, skip)
