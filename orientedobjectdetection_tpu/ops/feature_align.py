"""Feature alignment ops for refine-stage detectors (R3Det / S2ANet).

Replaces ``mmcv.ops.rotated_feature_align`` (reference
``models/detectors/utils.py:5,202`` — R3Det FeatureRefineModule) and the
DCN-based ``AlignConv`` (``detectors/utils.py:40-91`` — S2ANet), whose
offsets are *analytic* functions of the anchor boxes: both reduce to
bilinear sampling at box-derived grids, which on TPU is a batched gather +
(for AlignConv) a 1x1 matmul over the sampled taps — MXU-friendly, no
deformable-conv CUDA kernel needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Sample (B, H, W, C) at fractional pixel coords px/py (B, N) -> (B, N, C).

    Out-of-bounds samples contribute zero (matches the CUDA ops' border
    behavior with empty=0).
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wy1 = py - y0

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * (wgt * inb)[..., None]

    return corner(x0, y0, (1 - wx1) * (1 - wy1)) + \
        corner(x0 + 1, y0, wx1 * (1 - wy1)) + \
        corner(x0, y0 + 1, (1 - wx1) * wy1) + \
        corner(x0 + 1, y0 + 1, wx1 * wy1)


def rotated_feature_align(feat: jnp.ndarray, rois: jnp.ndarray,
                          spatial_scale: float, points: int = 1):
    """Re-sample each location's feature at its refined roi
    (reference FeatureRefineModule: 1-point = center, 5-point = center +
    4 inner quadrant points of the rotated box).

    Args:
        feat: (B, H, W, C).
        rois: (B, H*W, 5) refined boxes in image coords, one per location.
    Returns: (B, H, W, C) aligned features.
    """
    b, h, w, c = feat.shape
    cx, cy, bw, bh, a = [rois[..., i] for i in range(5)]
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    if points == 1:
        offsets = [(0.0, 0.0)]
    else:
        offsets = [(0.0, 0.0), (-0.25, -0.25), (0.25, -0.25),
                   (-0.25, 0.25), (0.25, 0.25)]
    acc = 0.
    for ox, oy in offsets:
        lx = ox * bw
        ly = oy * bh
        px = (cx + lx * cos_a - ly * sin_a) * spatial_scale
        py = (cy + lx * sin_a + ly * cos_a) * spatial_scale
        acc = acc + bilinear_sample(feat, px, py)
    out = acc / len(offsets)
    return out.reshape(b, h, w, c)


def align_conv_sample(feat: jnp.ndarray, anchors: jnp.ndarray,
                      stride: float, kernel: int = 3):
    """Sample the k*k rotated grid of each location's anchor
    (reference AlignConv offsets, ``detectors/utils.py:41-79``): grid points
    at (i, j) in [-(k-1)/2, (k-1)/2] scaled by (w, h)/k/stride, rotated by
    theta, centered on the anchor center.

    Args:
        feat: (B, H, W, C); anchors: (B, H*W, 5) image coords.
    Returns: (B, H, W, k*k, C) sampled taps (feed a Dense over k*k*C for the
    aligned conv).
    """
    b, h, w, c = feat.shape
    k = kernel
    idx = jnp.arange(-(k // 2), k // 2 + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(idx, idx, indexing='ij')
    gx = gx.ravel()                       # (k*k,)
    gy = gy.ravel()

    cx, cy, bw, bh, a = [anchors[..., i] / 1.0 for i in range(5)]
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    # anchor-frame grid spacing: w/k, h/k (in feature-map units)
    dx = (bw / stride / k)[..., None] * gx[None, None]     # (B, HW, k*k)
    dy = (bh / stride / k)[..., None] * gy[None, None]
    px = (cx / stride)[..., None] + dx * cos_a[..., None] - \
        dy * sin_a[..., None]
    py = (cy / stride)[..., None] + dx * sin_a[..., None] + \
        dy * cos_a[..., None]

    samples = bilinear_sample(feat, px.reshape(b, -1), py.reshape(b, -1))
    return samples.reshape(b, h, w, k * k, c)


def deform_conv_sample(feat: jnp.ndarray, offsets: jnp.ndarray,
                       kernel: int = 3):
    """Deformable-conv sampling with learned offsets.

    Replaces ``mmcv.ops.DeformConv2d`` for the RepPoints heads (reference
    ``dense_heads/*reppoints*.py:6-8``): sample the k*k taps at
    (base grid + offset) per location, then apply a Dense over k*k*C — the
    gather+matmul decomposition of DCN (MXU-friendly).

    Args:
        feat: (B, H, W, C).
        offsets: (B, H, W, k*k*2) in pixels (dy, dx order per tap, matching
            torchvision/mmcv DCN convention).
    Returns: (B, H, W, k*k, C) taps.
    """
    b, h, w, c = feat.shape
    k = kernel
    base = jnp.arange(-(k // 2), k // 2 + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(base, base, indexing='ij')
    gy = gy.ravel()                                    # (k*k,)
    gx = gx.ravel()
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    off = offsets.reshape(b, h, w, k * k, 2)
    py = ys[None, :, :, None] + gy[None, None, None, :] + off[..., 0]
    px = xs[None, :, :, None] + gx[None, None, None, :] + off[..., 1]
    samples = bilinear_sample(feat, px.reshape(b, -1), py.reshape(b, -1))
    return samples.reshape(b, h, w, k * k, c)
