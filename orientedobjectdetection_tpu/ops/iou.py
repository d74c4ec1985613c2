"""Rotated-box IoU — differentiable, batched, TPU-native.

Replaces the CUDA ops the reference inherits from mmcv:

- ``mmcv.ops.box_iou_rotated`` (used by
  ``core/bbox/iou_calculators/rotate_iou2d_calculator.py:2``,
  ``core/evaluation/eval_map.py:6``)
- ``mmcv.ops.diff_iou_rotated_2d`` (used by ``losses/rotated_iou_loss.py:11``)

Algorithm: for each box pair, the intersection of two rectangles is a convex
polygon with at most 8 vertices drawn from 24 candidates — the 16 pairwise
edge-segment intersections plus each box's 4 corners that lie inside the
other box. We compute all candidates with validity masks, order the valid
ones by angle around their centroid, and take the shoelace area. Everything
is fixed-shape, mask-based, and differentiable, so one implementation serves
both the evaluator and the IoU loss, and XLA can fuse it into surrounding
code. No data-dependent shapes anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import obb2poly


def _cross2(a, b):
    """z-component of the 2-D cross product, (..., 2) x (..., 2) -> (...)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _box_corners(boxes):
    """(..., 5) -> (..., 4, 2) corners (TL, TR, BR, BL in box frame)."""
    return obb2poly(boxes).reshape(boxes.shape[:-1] + (4, 2))


def _pairwise_edge_intersections(c1, c2):
    """Candidate vertices from edge-edge crossings.

    Args:
        c1, c2: (..., 4, 2) corner sets of the two boxes.

    Returns:
        pts: (..., 16, 2) intersection points.
        valid: (..., 16) bool.
    """
    # Edges as (start, delta): edge i = corner i -> corner (i+1)%4
    p = c1                              # (..., 4, 2)
    dp = jnp.roll(c1, -1, axis=-2) - c1
    q = c2
    dq = jnp.roll(c2, -1, axis=-2) - c2

    # Broadcast to all 4x4 edge pairs.
    p = p[..., :, None, :]     # (..., 4, 1, 2)
    dp = dp[..., :, None, :]
    q = q[..., None, :, :]     # (..., 1, 4, 2)
    dq = dq[..., None, :, :]

    pq = q - p
    denom = _cross2(dp, dq)                      # (..., 4, 4)
    # Avoid 0/0 — mask with parallel-edge test below.
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    t = _cross2(pq, dq) / safe
    u = _cross2(pq, dp) / safe
    valid = (jnp.abs(denom) > 1e-12) & (t >= 0.) & (t <= 1.) \
        & (u >= 0.) & (u <= 1.)
    pts = p + t[..., None] * dp                    # (..., 4, 4, 2)
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(valid.shape[:-2] + (16,))


def _corners_inside(corners, boxes):
    """Which of ``corners`` (..., 4, 2) lie inside ``boxes`` (..., 5)."""
    ctr = boxes[..., None, :2]
    wh = boxes[..., None, 2:4]
    a = boxes[..., 4:5]
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    d = corners - ctr
    # Rotate into the box frame.
    lx = d[..., 0] * cos_a + d[..., 1] * sin_a
    ly = -d[..., 0] * sin_a + d[..., 1] * cos_a
    # 1e-5 slack keeps shared-corner cases stable (matches CUDA op behavior
    # of counting boundary points).
    return (jnp.abs(lx) <= wh[..., 0] / 2 + 1e-5) & \
           (jnp.abs(ly) <= wh[..., 1] / 2 + 1e-5)


def _intersect_area(boxes1, boxes2):
    """Intersection area for broadcast-matched (..., 5) box tensors."""
    c1 = _box_corners(boxes1)
    c2 = _box_corners(boxes2)
    e_pts, e_valid = _pairwise_edge_intersections(c1, c2)
    in12 = _corners_inside(c1, boxes2)   # corners of box1 inside box2
    in21 = _corners_inside(c2, boxes1)

    pts = jnp.concatenate([e_pts, c1, c2], axis=-2)          # (..., 24, 2)
    valid = jnp.concatenate([e_valid, in12, in21], axis=-1)  # (..., 24)

    num_valid = jnp.sum(valid, axis=-1, keepdims=True)        # (..., 1)
    any_valid = num_valid[..., 0] >= 3

    vf = valid[..., None].astype(pts.dtype)
    centroid = jnp.sum(pts * vf, axis=-2, keepdims=True) / \
        jnp.maximum(num_valid[..., None], 1)
    rel = (pts - centroid) * vf

    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, 1e9)                 # invalid sort to the end
    # Multi-operand sort (key + payloads together) — compiles far faster on
    # TPU than argsort + take_along_axis gathers.
    _, xs, ys, vs = jax.lax.sort(
        (ang, rel[..., 0], rel[..., 1], valid.astype(rel.dtype)),
        dimension=-1, num_keys=1)
    rel_sorted = jnp.stack([xs, ys], axis=-1)
    valid_sorted = vs > 0.5

    # Pad the tail (invalid) slots with the first (valid) vertex so the
    # wrap-around shoelace term closes the polygon and padded segments are
    # degenerate (zero area).
    first = rel_sorted[..., :1, :]
    rel_closed = jnp.where(valid_sorted[..., None], rel_sorted,
                           jnp.broadcast_to(first, rel_sorted.shape))
    nxt = jnp.roll(rel_closed, -1, axis=-2)
    area = 0.5 * jnp.abs(jnp.sum(_cross2(rel_closed, nxt), axis=-1))
    return jnp.where(any_valid, area, 0.0)


def box_area(boxes):
    return boxes[..., 2] * boxes[..., 3]


def box_iou_rotated(boxes1, boxes2, mode: str = 'iou',
                    aligned: bool = False, eps: float = 1e-6):
    """Rotated IoU / IoF.

    Args:
        boxes1: (N, 5) or batched (..., N, 5).
        boxes2: (M, 5) or batched (..., M, 5).
        mode: 'iou' or 'iof' (intersection over the *first* set's area).
        aligned: if True, N == M and IoU is computed element-wise -> (..., N);
            otherwise the full (..., N, M) matrix.

    Differentiable; also serves as ``diff_iou_rotated_2d``.
    """
    assert mode in ('iou', 'iof')
    if aligned:
        b1, b2 = boxes1, boxes2
    else:
        b1 = boxes1[..., :, None, :]
        b2 = boxes2[..., None, :, :]
        b1, b2 = jnp.broadcast_arrays(b1, b2)
    inter = _intersect_area(b1, b2)
    area1 = box_area(b1)
    if mode == 'iou':
        denom = area1 + box_area(b2) - inter
    else:
        denom = area1
    return inter / jnp.maximum(denom, eps)


def diff_iou_rotated_2d(boxes1, boxes2):
    """Aligned differentiable rotated IoU, (..., N, 5) x (..., N, 5) -> (..., N).

    Drop-in for ``mmcv.ops.diff_iou_rotated_2d`` (reference
    ``losses/rotated_iou_loss.py:11``).
    """
    return box_iou_rotated(boxes1, boxes2, mode='iou', aligned=True)


def rbbox_overlaps(bboxes1, bboxes2, mode: str = 'iou',
                   is_aligned: bool = False):
    """IoU calculator matching reference
    ``core/bbox/iou_calculators/rotate_iou2d_calculator.py:8-89``: accepts
    (..., 5) or (..., 6) (with score column dropped) and clamps w/h >= 1e-3
    for numerical stability before the kernel."""
    if bboxes1.shape[-1] == 6:
        bboxes1 = bboxes1[..., :5]
    if bboxes2.shape[-1] == 6:
        bboxes2 = bboxes2[..., :5]
    if bboxes1.shape[-2] == 0 or bboxes2.shape[-2] == 0:
        if is_aligned:
            return jnp.zeros(bboxes1.shape[:-1], bboxes1.dtype)
        return jnp.zeros(bboxes1.shape[:-1] + (bboxes2.shape[-2],),
                         bboxes1.dtype)
    clamped1 = jnp.concatenate(
        [bboxes1[..., :2], jnp.maximum(bboxes1[..., 2:4], 1e-3),
         bboxes1[..., 4:5]], axis=-1)
    clamped2 = jnp.concatenate(
        [bboxes2[..., :2], jnp.maximum(bboxes2[..., 2:4], 1e-3),
         bboxes2[..., 4:5]], axis=-1)
    return box_iou_rotated(clamped1, clamped2, mode=mode, aligned=is_aligned)
