"""Point-set ops for the RepPoints family.

Replaces the mmcv CUDA ops (SURVEY.md §2.9): ``points_in_polygons``,
``chamfer_distance``, ``convex_iou`` / ``convex_giou``,
``min_area_polygons``. All static-shape jnp:

- convex hulls of the fixed 9-point sets use a Jarvis march with a fixed
  step count; the hull is emitted as a CCW vertex ring PADDED BY REPEATING
  the last vertex — zero-length edges contribute nothing to the
  Green's-theorem area/clip math, so no masks are needed downstream;
- convex-convex intersection reuses the same sort-free boundary-integral
  clip as :mod:`ops.iou`;
- min-area rectangles come from rotating calipers over the hull edges.

Everything is differentiable (the hull *selection* is a stop-gradient-style
discrete choice, but areas/corners are smooth in the chosen vertices —
matching the CUDA ``convex_giou`` gradient semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou import _cross2


def points_in_polygons(points, polygons):
    """points (N, 2); polygons (M, 8) -> (N, M) bool (cross-product sign
    test; works for convex quads in consistent winding)."""
    pts = polygons.reshape(-1, 4, 2)                       # (M, 4, 2)
    edges = jnp.roll(pts, -1, axis=1) - pts                # (M, 4, 2)
    rel = points[:, None, None, :] - pts[None]             # (N, M, 4, 2)
    cr = _cross2(jnp.broadcast_to(edges[None], rel.shape), rel)
    return (cr >= 0).all(-1) | (cr <= 0).all(-1)


def chamfer_distance(set1, set2):
    """(..., N, 2) x (..., M, 2) -> mean nearest-neighbor distances both
    ways (reference use: oriented_reppoints_head.py:8)."""
    d = jnp.linalg.norm(set1[..., :, None, :] - set2[..., None, :, :],
                        axis=-1)
    return d.min(-1).mean(-1), d.min(-2).mean(-1)


def convex_hull(points):
    """(N, 2) -> (N, 2) CCW hull ring padded by repeating the last hull
    vertex (Jarvis march, fixed N steps)."""
    n = points.shape[0]
    start = jnp.lexsort((points[:, 0], points[:, 1]))[0]

    def next_vertex(cur):
        d = points - points[cur]                           # (N, 2)
        # candidate j is a hull successor if every point lies left of
        # cur->j (cross >= -tol); among those take the farthest (handles
        # collinear points and j == cur, whose distance is 0). The
        # tolerance must be scale-RELATIVE: under jit, XLA fuses the cross
        # product into an FMA whose rounding turns exact zeros (j == k,
        # d == 0) into O(|d_j||d_k| * 2^-23) negatives, which an absolute
        # 1e-6 eps rejects — stalling the march.
        cr = _cross2(d[:, None, :], d[None, :, :])         # (N, N)
        nrm = jnp.linalg.norm(d, axis=-1)
        tol = 1e-5 * (nrm[:, None] * nrm[None, :]) + 1e-6
        ok = (cr >= -tol).all(axis=1)
        dist = jnp.linalg.norm(d, axis=-1)
        score = jnp.where(ok, dist, -1.0)
        return jnp.argmax(score)

    def body(i, state):
        cur, done, out = state
        nxt = next_vertex(cur)
        nxt = jnp.where(done, cur, nxt)
        done = done | (nxt == start) | (nxt == cur)
        out = out.at[i + 1].set(nxt)
        return nxt, done, out

    out0 = jnp.full((n + 1,), start, jnp.int32).at[0].set(start)
    _, _, idx = jax.lax.fori_loop(0, n - 1, body,
                                  (start, jnp.zeros((), bool), out0))
    # ring of n vertices (pad = repeats of the closing vertex)
    return points[idx[:n]]


def _poly_area_ccw(ring):
    """Shoelace over a padded CCW ring (..., K, 2); padding (repeated
    vertices) contributes zero."""
    nxt = jnp.roll(ring, -1, axis=-2)
    return 0.5 * jnp.sum(_cross2(ring, nxt), axis=-1)


def _convex_clip_area(ring_a, ring_b):
    """Green's-theorem intersection area of two padded CCW rings
    (Ka, 2) x (Kb, 2) (same formulation as ops.iou._intersect_area_rel)."""

    def contributions(a_ring, b_ring):
        a = a_ring
        d = jnp.roll(a_ring, -1, axis=-2) - a
        vb = b_ring
        eb = jnp.roll(b_ring, -1, axis=-2) - vb
        a_e = a[..., :, None, :]
        d_e = d[..., :, None, :]
        vb_e = vb[..., None, :, :]
        eb_e = eb[..., None, :, :]
        num = _cross2(eb_e, a_e - vb_e)
        den = _cross2(eb_e, d_e)
        t_at = -num / jnp.where(jnp.abs(den) > 1e-9, den, 1e-9)
        big = 1e9
        lower = jnp.where(den > 1e-9, t_at, -big)
        upper = jnp.where(den < -1e-9, t_at, big)
        parallel_out = (jnp.abs(den) <= 1e-9) & (num < 0)
        lower = jnp.where(parallel_out, big, lower)
        t0 = jnp.maximum(lower.max(-1), 0.0)
        t1 = jnp.minimum(upper.min(-1), 1.0)
        valid = t1 > t0
        p0 = a + t0[..., None] * d
        p1 = a + t1[..., None] * d
        return jnp.where(valid, _cross2(p0, p1), 0.0).sum(-1)

    # tiny shrink of ring_b toward its centroid breaks coincident-boundary
    # double counting (see ops.iou)
    cb = ring_b.mean(-2, keepdims=True)
    ring_b = cb + (ring_b - cb) * (1 - 1e-6)
    area2 = contributions(ring_a, ring_b) + contributions(ring_b, ring_a)
    return jnp.maximum(0.5 * area2, 0.0)


def convex_iou(pointsets, polygons):
    """pointsets (N, 9*2); polygons (M, 8) -> IoU (N, M) between the convex
    hull of each point set and each gt quad (reference
    ``mmcv.ops.convex_iou`` use sites: max_convex_iou_assigner.py:3)."""
    pts = pointsets.reshape(-1, 9, 2)
    hulls = jax.vmap(convex_hull)(pts)                      # (N, 9, 2)
    quads = polygons.reshape(-1, 4, 2)
    area_h = jnp.abs(_poly_area_ccw(hulls))                 # (N,)
    area_q = jnp.abs(_poly_area_ccw(quads))                 # (M,)
    inter = jax.vmap(lambda h: jax.vmap(
        lambda q: _convex_clip_area(h, q))(quads))(hulls)   # (N, M)
    # degenerate (near-point) hulls have vanishing half-plane constraints
    # that can over-count: clamp to the physical bound
    inter = jnp.minimum(inter, jnp.minimum(area_h[:, None], area_q[None]))
    union = area_h[:, None] + area_q[None] - inter
    return inter / jnp.maximum(union, 1e-6)


def convex_giou(pointsets, polygons):
    """Aligned convex GIoU: pointsets (N, 18) vs polygons (N, 8) -> (N,).

    GIoU = IoU - |C - union| / |C| with C the convex hull of both sets.
    Differentiable (used by ConvexGIoULoss; reference convex_giou_loss.py).
    """
    pts = pointsets.reshape(-1, 9, 2)
    quads = polygons.reshape(-1, 4, 2)
    hulls = jax.vmap(convex_hull)(pts)
    area_h = jnp.abs(_poly_area_ccw(hulls))
    area_q = jnp.abs(_poly_area_ccw(quads))
    inter = jax.vmap(_convex_clip_area)(hulls, quads)
    inter = jnp.minimum(inter, jnp.minimum(area_h, area_q))
    union = area_h + area_q - inter
    iou = inter / jnp.maximum(union, 1e-6)
    both = jnp.concatenate([pts, quads], axis=1)            # (N, 13, 2)
    enclose = jax.vmap(convex_hull)(both)
    area_c = jnp.maximum(jnp.abs(_poly_area_ccw(enclose)), union)
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-6)


def min_area_polygons(pointsets):
    """(N, 9*2) point sets -> (N, 8) min-area enclosing rectangle corners
    (rotating calipers over hull edges; reference
    ``mmcv.ops.min_area_polygons`` use: reppoints heads)."""
    pts = pointsets.reshape(-1, 9, 2)

    def single(p):
        hull = convex_hull(p)                                # (9, 2)
        edges = jnp.roll(hull, -1, axis=0) - hull            # (9, 2)
        elen = jnp.linalg.norm(edges, axis=-1)
        u = edges / jnp.maximum(elen[:, None], 1e-9)         # (9, 2)
        v = jnp.stack([-u[:, 1], u[:, 0]], -1)
        px = p @ u.T                                          # (9pts, 9edges)
        py = p @ v.T
        w = px.max(0) - px.min(0)
        h = py.max(0) - py.min(0)
        area = jnp.where(elen > 1e-9, w * h, jnp.inf)
        k = jnp.argmin(area)
        uk, vk = u[k], v[k]
        x0, x1 = px[:, k].min(), px[:, k].max()
        y0, y1 = py[:, k].min(), py[:, k].max()
        corners = jnp.stack([
            uk * x0 + vk * y0, uk * x1 + vk * y0,
            uk * x1 + vk * y1, uk * x0 + vk * y1], 0)
        return corners.reshape(8)

    return jax.vmap(single)(pts)
