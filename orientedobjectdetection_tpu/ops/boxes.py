"""Rotated-box geometry core (TPU-native, pure jnp).

Reimplements the angle-convention system and box representation converters of
the reference (``mmrotate/core/bbox/transforms.py:95-937``) as batched,
jit-friendly JAX functions plus numpy twins for the host-side data pipeline.

Box layout everywhere: ``(..., 5) = (cx, cy, w, h, theta)`` with theta in
radians. Three angle conventions are supported (reference
``transforms.py:850-867``):

- ``oc``:    theta in (0, pi/2]; w is the edge the angle is measured against.
- ``le90``:  theta in [-pi/2, pi/2); w >= h (long edge first).
- ``le135``: theta in [-pi/4, 3*pi/4); w >= h.

Unlike the reference, every function here is shape-polymorphic over leading
batch dims, static-shaped, and differentiable where meaningful, so it can sit
inside a jitted train step on TPU.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PI = math.pi

_VALID_VERSIONS = ('oc', 'le90', 'le135')


def norm_angle(angle, angle_range: str):
    """Normalize angles into the range of the given convention.

    Matches reference ``transforms.py:850-867`` (``oc`` is passed through).
    Works on jnp or np arrays.
    """
    if angle_range == 'oc':
        return angle
    elif angle_range == 'le135':
        return (angle + PI / 4) % PI - PI / 4
    elif angle_range == 'le90':
        return (angle + PI / 2) % PI - PI / 2
    else:
        raise NotImplementedError(f'unknown angle_range {angle_range!r}')


# ---------------------------------------------------------------------------
# obb -> poly
# ---------------------------------------------------------------------------

def obb2poly(obbs, version: str = 'oc'):
    """(..., 5) obbs -> (..., 8) corner polygons.

    All three conventions share the same rotation math (reference
    ``transforms.py:421-499``); corner order is
    (p1=TL, p2=TR, p3=BR, p4=BL) in the box frame.
    """
    if version not in _VALID_VERSIONS:
        raise NotImplementedError(version)
    x, y, w, h, a = jnp.split(obbs, 5, axis=-1)
    cosa, sina = jnp.cos(a), jnp.sin(a)
    wx, wy = w / 2 * cosa, w / 2 * sina
    hx, hy = -h / 2 * sina, h / 2 * cosa
    p1 = jnp.concatenate([x - wx - hx, y - wy - hy], -1)
    p2 = jnp.concatenate([x + wx - hx, y + wy - hy], -1)
    p3 = jnp.concatenate([x + wx + hx, y + wy + hy], -1)
    p4 = jnp.concatenate([x - wx + hx, y - wy + hy], -1)
    return jnp.concatenate([p1, p2, p3, p4], axis=-1)


# ---------------------------------------------------------------------------
# poly -> obb
# ---------------------------------------------------------------------------

def poly2obb(polys, version: str = 'oc'):
    """(..., 8) polygons -> (..., 5) obbs (batched, jit-friendly).

    Follows the reference's edge-based construction
    (``transforms.py:242-331``): the box is *not* re-fit (corners are assumed
    to form a rectangle); w/h come from edge lengths, the angle from the
    longer edge (le90/le135) or the oc quadrant rule.
    """
    pts = polys.reshape(polys.shape[:-1] + (4, 2))
    if version == 'oc':
        cx = jnp.mean(pts[..., :, 0], axis=-1)
        cy = jnp.mean(pts[..., :, 1], axis=-1)
        e01 = jnp.linalg.norm(pts[..., 0, :] - pts[..., 1, :], axis=-1)
        e12 = jnp.linalg.norm(pts[..., 1, :] - pts[..., 2, :], axis=-1)
        theta0 = jnp.arctan2(-(pts[..., 1, 0] - pts[..., 0, 0]),
                             pts[..., 1, 1] - pts[..., 0, 1])
        odd = jnp.remainder(jnp.floor(theta0 / (PI * 0.5)), 2) == 0
        w = jnp.where(odd, e12, e01)
        h = jnp.where(odd, e01, e12)
        theta = jnp.remainder(theta0, PI * 0.5)
        return jnp.stack([cx, cy, w, h, theta], axis=-1)
    elif version in ('le90', 'le135'):
        pt1, pt2, pt3, pt4 = (pts[..., 0, :], pts[..., 1, :],
                              pts[..., 2, :], pts[..., 3, :])
        edge1 = jnp.linalg.norm(pt1 - pt2, axis=-1)
        edge2 = jnp.linalg.norm(pt2 - pt3, axis=-1)
        angle1 = jnp.arctan2(pt2[..., 1] - pt1[..., 1],
                             pt2[..., 0] - pt1[..., 0])
        angle2 = jnp.arctan2(pt4[..., 1] - pt1[..., 1],
                             pt4[..., 0] - pt1[..., 0])
        angles = jnp.where(edge1 > edge2, angle1, angle2)
        angles = norm_angle(angles, version)
        cx = (pt1[..., 0] + pt3[..., 0]) / 2
        cy = (pt1[..., 1] + pt3[..., 1]) / 2
        w = jnp.maximum(edge1, edge2)
        h = jnp.minimum(edge1, edge2)
        return jnp.stack([cx, cy, w, h, angles], axis=-1)
    else:
        raise NotImplementedError(version)


# ---------------------------------------------------------------------------
# obb <-> hbb / xyxy
# ---------------------------------------------------------------------------

def obb2xyxy(obbs, version: str = 'oc'):
    """(..., 5) obbs -> (..., 4) circumscribed axis-aligned (x1,y1,x2,y2).

    Reference ``transforms.py:637-702``. For ``oc`` the reference exploits
    theta in (0, pi/2] so cos,sin >= 0; le90/le135 use |cos|,|sin| which is
    the general formula — we use the general formula for all (identical
    results in-range).
    """
    if version not in _VALID_VERSIONS:
        raise NotImplementedError(version)
    x, y, w, h, a = (obbs[..., 0], obbs[..., 1], obbs[..., 2], obbs[..., 3],
                     obbs[..., 4])
    cosa, sina = jnp.abs(jnp.cos(a)), jnp.abs(jnp.sin(a))
    dw = cosa * w + sina * h
    dh = sina * w + cosa * h
    return jnp.stack([x - dw / 2, y - dh / 2, x + dw / 2, y + dh / 2], -1)


def obb2hbb(obbs, version: str = 'oc'):
    """(..., 5) obbs -> (..., 5) horizontal boxes in obb form.

    Mirrors per-version quirks of reference ``transforms.py:502-576``:
    ``oc`` swaps w/h and sets theta=pi/2; le90/le135 keep the long edge as w
    with theta in {0, -pi/2} / {0, pi/2} respectively.
    """
    x, y, w, h, a = (obbs[..., 0], obbs[..., 1], obbs[..., 2], obbs[..., 3],
                     obbs[..., 4])
    if version == 'oc':
        cosa, sina = jnp.cos(a), jnp.sin(a)
        hw = cosa * w + sina * h
        hh = sina * w + cosa * h
        return jnp.stack([x, y, hh, hw, jnp.full_like(a, PI / 2)], -1)
    cosa, sina = jnp.abs(jnp.cos(a)), jnp.abs(jnp.sin(a))
    ew = cosa * w + sina * h
    eh = sina * w + cosa * h
    long_first = ew >= eh
    w_out = jnp.where(long_first, ew, eh)
    h_out = jnp.where(long_first, eh, ew)
    if version == 'le90':
        a_out = jnp.where(long_first, 0.0, -PI / 2)
    elif version == 'le135':
        a_out = jnp.where(long_first, 0.0, PI / 2)
    else:
        raise NotImplementedError(version)
    return jnp.stack([x, y, w_out, h_out, a_out], -1)


def hbb2obb(hbbs, version: str = 'oc'):
    """(..., 4) xyxy -> (..., 5) obbs per convention.

    Reference ``transforms.py:579-634``.
    """
    x = (hbbs[..., 0] + hbbs[..., 2]) * 0.5
    y = (hbbs[..., 1] + hbbs[..., 3]) * 0.5
    w = hbbs[..., 2] - hbbs[..., 0]
    h = hbbs[..., 3] - hbbs[..., 1]
    zero = jnp.zeros_like(x)
    if version == 'oc':
        return jnp.stack([x, y, h, w, zero + PI / 2], -1)
    long_first = w >= h
    w_out = jnp.where(long_first, w, h)
    h_out = jnp.where(long_first, h, w)
    if version == 'le135':
        a_out = jnp.where(long_first, zero, zero + PI / 2)
    elif version == 'le90':
        a_out = jnp.where(long_first, zero, zero - PI / 2)
    else:
        raise NotImplementedError(version)
    return jnp.stack([x, y, w_out, h_out, a_out], -1)


# ---------------------------------------------------------------------------
# numpy twins (host-side data pipeline; match cv2.minAreaRect conventions)
# ---------------------------------------------------------------------------

def poly2obb_np(poly, version: str = 'oc'):
    """Single polygon (8,) -> (cx, cy, w, h, a) tuple or None if degenerate.

    Exactly reproduces the reference's host loaders
    (``transforms.py:334-418``), including the cv2.minAreaRect round-trip for
    oc/le90 (OpenCV's angle convention is the training-target ground truth)
    and the "edge < 2 px" rejection.
    """
    import cv2
    if version == 'oc':
        pts = np.asarray(poly, dtype=np.float32).reshape(4, 2)
        (x, y), (w, h), a = cv2.minAreaRect(pts)
        if w < 2 or h < 2:
            return None
        while not 0 < a <= 90:
            if a == -90:
                a += 180
            else:
                a += 90
                w, h = h, w
        a = a / 180 * PI
        return x, y, w, h, a
    elif version == 'le90':
        pts = np.asarray(poly, dtype=np.float32).reshape(4, 2)
        (x, y), (w, h), a = cv2.minAreaRect(pts)
        if w < 2 or h < 2:
            return None
        a = a / 180 * PI
        if w < h:
            w, h = h, w
            a += PI / 2
        while not PI / 2 > a >= -PI / 2:
            a += -PI if a >= PI / 2 else PI
        return x, y, w, h, a
    elif version == 'le135':
        p = np.asarray(poly[:8], dtype=np.float32)
        pt1, pt2, pt3, pt4 = p[0:2], p[2:4], p[4:6], p[6:8]
        edge1 = float(np.linalg.norm(pt1 - pt2))
        edge2 = float(np.linalg.norm(pt2 - pt3))
        if edge1 < 2 or edge2 < 2:
            return None
        if edge1 > edge2:
            angle = float(np.arctan2(pt2[1] - pt1[1], pt2[0] - pt1[0]))
        else:
            angle = float(np.arctan2(pt4[1] - pt1[1], pt4[0] - pt1[0]))
        angle = float(norm_angle(np.asarray(angle), 'le135'))
        return (float(pt1[0] + pt3[0]) / 2, float(pt1[1] + pt3[1]) / 2,
                max(edge1, edge2), min(edge1, edge2), angle)
    else:
        raise NotImplementedError(version)


def obb2poly_np(obbs, version: str = 'oc'):
    """(n, 6) [cx,cy,w,h,a,score] -> (n, 9) polys+score with canonical corner
    order for DOTA submission (reference ``transforms.py:705-847``)."""
    obbs = np.asarray(obbs, dtype=np.float32)
    if obbs.size == 0:
        return np.zeros((0, 9), dtype=np.float32)
    x, y, w, h, a = (obbs[:, 0], obbs[:, 1], obbs[:, 2], obbs[:, 3],
                     obbs[:, 4])
    score = obbs[:, 5] if obbs.shape[1] > 5 else np.zeros_like(x)
    cosa, sina = np.cos(a), np.sin(a)
    wx, wy = w / 2 * cosa, w / 2 * sina
    hx, hy = -h / 2 * sina, h / 2 * cosa
    polys = np.stack([
        x - wx - hx, y - wy - hy, x + wx - hx, y + wy - hy,
        x + wx + hx, y + wy + hy, x - wx + hx, y - wy + hy, score
    ], axis=-1)
    return get_best_begin_point(polys)


def get_best_begin_point(polys):
    """Canonical corner reordering: rotate corner order so the first corner is
    closest to the (xmin,ymin) corner of the circumscribed box (vectorized
    form of reference ``transforms.py:801-847``)."""
    polys = np.asarray(polys, dtype=np.float64)
    pts = polys[:, :8].reshape(-1, 4, 2)
    xmin = pts[..., 0].min(axis=1)
    ymin = pts[..., 1].min(axis=1)
    xmax = pts[..., 0].max(axis=1)
    ymax = pts[..., 1].max(axis=1)
    dst = np.stack([
        np.stack([xmin, ymin], -1), np.stack([xmax, ymin], -1),
        np.stack([xmax, ymax], -1), np.stack([xmin, ymax], -1)
    ], axis=1)  # (n, 4, 2)
    # cost of each of the 4 cyclic shifts
    costs = np.empty((polys.shape[0], 4))
    for s in range(4):
        rolled = np.roll(pts, -s, axis=1)
        costs[:, s] = np.linalg.norm(rolled - dst, axis=-1).sum(axis=1)
    best = costs.argmin(axis=1)
    out = np.empty_like(polys)
    for s in range(4):
        m = best == s
        out[m, :8] = np.roll(pts[m], -s, axis=1).reshape(-1, 8)
    out[:, 8] = polys[:, 8]
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# RoI helpers / flips
# ---------------------------------------------------------------------------

def rbbox_flip(bboxes, img_shape, direction='horizontal', version='oc'):
    """Flip rotated boxes for TTA (reference ``transforms.py:9-33``)."""
    flipped = bboxes
    h_img, w_img = img_shape[0], img_shape[1]
    x, y, w, h, a = [bboxes[..., i] for i in range(5)]
    if direction == 'horizontal':
        x = w_img - x - 1
    elif direction == 'vertical':
        y = h_img - y - 1
    elif direction == 'diagonal':
        x = w_img - x - 1
        y = h_img - y - 1
        return jnp.stack([x, y, w, h, a], -1)
    else:
        raise ValueError(direction)
    if version == 'oc':
        rotated_flag = a != PI / 2
        a = jnp.where(rotated_flag, PI / 2 - a, a)
        w_new = jnp.where(rotated_flag, h, w)
        h_new = jnp.where(rotated_flag, w, h)
        return jnp.stack([x, y, w_new, h_new, a], -1)
    a = norm_angle(-a, version)
    return jnp.stack([x, y, w, h, a], -1)


def gt2gaussian(target):
    """Convert (..., 5) OBBs to 2-D Gaussians (mu (...,2), sigma (...,2,2)).

    Variance convention follows the losses' ``xy_wh_r_2_xy_sigma``
    (reference ``losses/gaussian_dist_loss.py:11-36``): sigma =
    R diag((w/2)^2, (h/2)^2) R^T.
    """
    xy = target[..., :2]
    wh = jnp.clip(target[..., 2:4], 1e-7, 1e7)
    r = target[..., 4]
    cos_r, sin_r = jnp.cos(r), jnp.sin(r)
    R = jnp.stack([cos_r, -sin_r, sin_r, cos_r], -1).reshape(
        target.shape[:-1] + (2, 2))
    S = 0.5 * wh
    sigma = jnp.einsum('...ij,...j,...kj->...ik', R, S * S, R)
    return xy, sigma


def gt2gaussian_poly(polys, L: float = 3.0):
    """Polygon -> 2-D Gaussian, the G-RepPoints convention (reference
    ``core/bbox/transforms.py:916-937``): mu = corner mean, sigma =
    R diag(w^2, h^2)/(4 L^2) R^T with L=3 (so the box spans +-3 sigma).

    Args:
        polys: (..., 8) or (..., 4, 2) corner polygons.
    Returns:
        (mu (..., 2), sigma (..., 2, 2)).
    """
    p = polys.reshape(polys.shape[:-1] + (4, 2)) if polys.shape[-1] == 8 \
        else polys
    center = p.mean(-2)
    edge_1 = p[..., 1, :] - p[..., 0, :]
    edge_2 = p[..., 2, :] - p[..., 1, :]
    w2 = jnp.maximum((edge_1 * edge_1).sum(-1), 1e-7)
    h2 = jnp.maximum((edge_2 * edge_2).sum(-1), 1e-7)
    cos_t = edge_1[..., 0] / jnp.sqrt(w2)
    sin_t = edge_1[..., 1] / jnp.sqrt(w2)
    R = jnp.stack([cos_t, -sin_t, sin_t, cos_t], -1).reshape(
        w2.shape + (2, 2))
    diag = jnp.stack([w2, h2], -1) / (4 * L * L)
    sigma = jnp.einsum('...ij,...j,...kj->...ik', R, diag, R)
    return center, sigma


def gaussian2bbox(mu, sigma, L: float = 3.0):
    """Gaussian -> corner polygon, inverse of :func:`gt2gaussian_poly`
    (reference ``transforms.py:883-913`` uses torch_batch_svd; a 2x2
    symmetric eigendecomposition is closed-form, no SVD needed).

    Args:
        mu: (..., 2); sigma: (..., 2, 2) symmetric PSD.
    Returns:
        (..., 8) polygons.
    """
    a = sigma[..., 0, 0]
    b = sigma[..., 0, 1]
    c = sigma[..., 1, 1]
    theta = 0.5 * jnp.arctan2(2 * b, a - c)
    mean = 0.5 * (a + c)
    root = jnp.sqrt(jnp.maximum(((a - c) / 2) ** 2 + b ** 2, 0.0))
    lam1 = jnp.maximum(mean + root, 1e-12)
    lam2 = jnp.maximum(mean - root, 1e-12)
    half = L * jnp.sqrt(jnp.stack([lam1, lam2], -1))        # (..., 2)
    signs = jnp.asarray([[-1., 1.], [1., 1.], [1., -1.], [-1., -1.]])
    d = signs * half[..., None, :]                           # (..., 4, 2)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    R = jnp.stack([cos_t, -sin_t, sin_t, cos_t], -1).reshape(
        theta.shape + (2, 2))
    corners = mu[..., None, :] + jnp.einsum('...ij,...kj->...ki', R, d)
    return corners.reshape(mu.shape[:-1] + (8,))
