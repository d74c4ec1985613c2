"""Rotated-box IoU — differentiable, batched, TPU-native.

Replaces the CUDA ops the reference inherits from mmcv:

- ``mmcv.ops.box_iou_rotated`` (used by
  ``core/bbox/iou_calculators/rotate_iou2d_calculator.py:2``,
  ``core/evaluation/eval_map.py:6``)
- ``mmcv.ops.diff_iou_rotated_2d`` (used by ``losses/rotated_iou_loss.py:11``)

Algorithm (sort-free, Green's theorem): the boundary of the intersection of
two convex polygons consists of the sub-segments of each polygon's edges
that lie inside the other. By Green's theorem the (signed) area is
``1/2 * sum over boundary segments of cross(start, end)`` — and each
segment's contribution is independent of traversal order, so NO vertex
sorting is needed. Each of the 8 edges is clipped against the other box's 4
half-planes in closed form (Liang-Barsky), giving a fixed-shape, fully
vectorized, differentiable kernel: ~30 fused multiply-adds per pair, no
gathers, no sorts — VPU-friendly and cheap to compile. (An earlier
24-candidate-vertex + angular-sort formulation cost ~20x more in HBM
traffic and XLA compile time.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import obb2poly


def _cross2(a, b):
    """z-component of the 2-D cross product, (..., 2) x (..., 2) -> (...)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _box_corners(boxes):
    """(..., 5) -> (..., 4, 2) corners (TL, TR, BR, BL in box frame)."""
    return obb2poly(boxes).reshape(boxes.shape[:-1] + (4, 2))


def _intersect_area_rel(rel1, ctr1, rel2, ctr2):
    """Intersection area from per-box relative corners.

    Args:
        rel1, rel2: (..., 4, 2) CCW corners about each box's own center —
            computed ONCE per box by the callers, so the cos/sin corner
            geometry is O(N + M), not O(N * M): for an NMS pair mask at
            N=2000 that removes ~8M transcendental evaluations per program.
        ctr1, ctr2: (..., 2) box centers.

    Green's-theorem formulation: area = 1/2 * sum over the 8 edges (4 per
    box) of cross(p(t0), p(t1)), where [t0, t1] is the part of the edge
    inside the other box (Liang-Barsky clip against its 4 half-planes).
    Both corner rings are CCW (obb2poly order), so contributions add up to
    the positive intersection area with no ordering step.

    fp32 conditioning: each pair is evaluated in a frame centered on the
    pair midpoint (cheap per-pair adds — the sincos stays hoisted), which
    removes cancellation when box extents are small relative to image
    coordinates (e.g. clamped 1e-3 boxes at x~1000).
    """
    u = 0.5 * (ctr1 - ctr2)              # (..., 2) pair-midpoint offset
    c1 = rel1 + u[..., None, :]          # (..., 4, 2) in the pair frame
    c2 = rel2 - u[..., None, :]

    def edge_contributions(corners_a, corners_b):
        """Sum of cross(start, end) over sub-segments of A's edges inside B."""
        a = corners_a                                   # (..., 4, 2)
        d = jnp.roll(corners_a, -1, axis=-2) - a        # edge vectors
        vb = corners_b                                  # (..., 4, 2)
        eb = jnp.roll(corners_b, -1, axis=-2) - vb      # B edge vectors

        # Inside B (CCW): cross(eb_k, q - vb_k) >= 0 for all k.
        # For edge point p(t) = a + t d:
        #   f_k(t) = cross(eb_k, a - vb_k) + t * cross(eb_k, d) >= 0
        a_e = a[..., :, None, :]                        # (..., 4A, 1, 2)
        d_e = d[..., :, None, :]
        vb_e = vb[..., None, :, :]                      # (..., 1, 4B, 2)
        eb_e = eb[..., None, :, :]
        num = _cross2(eb_e, a_e - vb_e)                 # (..., 4A, 4B)
        den = _cross2(eb_e, d_e)

        t_at = -num / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
        # den > 0 -> lower bound; den < 0 -> upper bound;
        # den ~ 0 & num < 0 -> edge entirely outside this half-plane.
        big = 1e9
        lower = jnp.where(den > 1e-12, t_at, -big)
        upper = jnp.where(den < -1e-12, t_at, big)
        parallel_out = (jnp.abs(den) <= 1e-12) & (num < 0)
        lower = jnp.where(parallel_out, big, lower)

        t0 = jnp.maximum(lower.max(axis=-1), 0.0)      # (..., 4A)
        t1 = jnp.minimum(upper.min(axis=-1), 1.0)
        valid = t1 > t0
        p0 = a + t0[..., None] * d
        p1 = a + t1[..., None] * d
        contrib = jnp.where(valid, _cross2(p0, p1), 0.0)
        return contrib.sum(axis=-1)

    area2 = edge_contributions(c1, c2) + edge_contributions(c2, c1)
    return jnp.maximum(0.5 * area2, 0.0)


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
    # Break boundary ties: coincident edges traversed in the SAME direction
    # (e.g. identical boxes) would be counted by both passes, doubling the
    # area. Shrinking one operand by a relative 1e-6 removes all coincident-
    # boundary cases at O(1e-6) relative area error; opposite-direction
    # coincidences (touching boxes) cancel exactly either way.
    shrink = jnp.asarray([1.0, 1.0, 1.0 - 1e-6, 1.0 - 1e-6, 1.0],
                         boxes2.dtype)
    # per-box relative corners (sincos hoisted out of the pair product)
    zero2 = jnp.zeros_like(boxes1[..., :2])
    rel1 = _box_corners(
        jnp.concatenate([zero2, boxes1[..., 2:]], -1))
    b2s = boxes2 * shrink
    rel2 = _box_corners(
        jnp.concatenate([jnp.zeros_like(b2s[..., :2]), b2s[..., 2:]], -1))
    ctr1, ctr2 = boxes1[..., :2], boxes2[..., :2]
    if aligned:
        b1, b2 = boxes1, boxes2
    else:
        rel1, ctr1 = rel1[..., :, None, :, :], ctr1[..., :, None, :]
        rel2, ctr2 = rel2[..., None, :, :, :], ctr2[..., None, :, :]
        b1 = boxes1[..., :, None, :]
        b2 = boxes2[..., None, :, :]
        b1, b2 = jnp.broadcast_arrays(b1, b2)
    inter = _intersect_area_rel(rel1, ctr1, rel2, ctr2)
    area1 = box_area(b1)
    area2 = box_area(b2)
    # physical bound (degenerate/parallel-edge numerical safety)
    inter = jnp.minimum(inter, jnp.minimum(area1, area2))
    if mode == 'iou':
        denom = area1 + area2 - inter
    else:
        denom = area1
    return inter / jnp.maximum(denom, eps)


def diff_iou_rotated_2d(boxes1, boxes2):
    """Aligned differentiable rotated IoU, (..., N, 5) x (..., N, 5) -> (..., N).

    Drop-in for ``mmcv.ops.diff_iou_rotated_2d`` (reference
    ``losses/rotated_iou_loss.py:11``).
    """
    return box_iou_rotated(boxes1, boxes2, mode='iou', aligned=True)


# Pair count above which the compiled Pallas tile kernel takes over on TPU
# for non-differentiable IoU matrices (assignment): the jnp path
# materializes (..., N, M, 4, 4, 2) clip intermediates in HBM — at
# (32 gt x 196k anchors) x batch 8 that is a 6 GB temp and an OOM in the
# batch-8 train step — while the Pallas kernel keeps everything for a
# (128, 128) tile in VMEM.
_PALLAS_MIN_PAIRS = 1 << 20


@functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def _iou_matrix_nograd(boxes1, boxes2, mode):
    """Pallas IoU matrix with a zero-tangent JVP (assignment is
    non-differentiable: its outputs feed argmax/threshold decisions)."""
    from .iou_pallas import box_iou_rotated_pallas
    return box_iou_rotated_pallas(boxes1, boxes2, mode=mode)


@_iou_matrix_nograd.defjvp
def _iou_matrix_nograd_jvp(mode, primals, tangents):
    out = _iou_matrix_nograd(*primals, mode)
    return out, jnp.zeros_like(out)


def _use_pallas_matrix(b1, b2, aligned):
    from .iou_pallas import pallas_available
    return (not aligned and b1.ndim == 2 and b2.ndim == 2
            and b1.shape[0] * b2.shape[0] >= _PALLAS_MIN_PAIRS
            and pallas_available())


def rbbox_overlaps(bboxes1, bboxes2, mode: str = 'iou',
                   is_aligned: bool = False):
    """IoU calculator matching reference
    ``core/bbox/iou_calculators/rotate_iou2d_calculator.py:8-89``: accepts
    (..., 5) or (..., 6) (with score column dropped) and clamps w/h >= 1e-3
    for numerical stability before the kernel.

    Large unaligned matrices on TPU are routed to the compiled Pallas tile
    kernel (non-differentiable; assignment never needs gradients). The jnp
    path stays for aligned/differentiable/CPU uses."""
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
    if _use_pallas_matrix(clamped1, clamped2, is_aligned):
        return _iou_matrix_nograd(clamped1, clamped2, mode)
    return box_iou_rotated(clamped1, clamped2, mode=mode, aligned=is_aligned)
