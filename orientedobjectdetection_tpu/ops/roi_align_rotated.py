"""RoIAlignRotated over an FPN pyramid — TPU-native gather formulation.

Replaces ``mmcv.ops.RoIAlignRotated`` + the level-routing RoI extractor
(reference ``roi_extractors/rotate_single_level_roi_extractor.py:14-167``).

Design: instead of CUDA's per-roi kernel with dynamic level routing, all
pyramid levels are flattened into ONE (B, sum_l H_l*W_l, C) buffer per image;
each roi's FPN level (by sqrt(area)/finest_scale, reference ``:68-88``)
selects a per-level row offset and stride, sample coordinates are computed
for the rotated bin grid, and a single batched bilinear gather reads every
sample point for every roi at once. Static shapes throughout; padding rois
(w=h=0) produce zeros.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_of_rois(rois, num_levels: int, finest_scale: float = 56.0):
    """FPN level per roi (reference ``rotate_single_level_roi_extractor.py``:
    floor(log2(sqrt(w*h) / finest_scale + 1e-6)) clamped)."""
    scale = jnp.sqrt(jnp.maximum(rois[..., 2] * rois[..., 3], 1e-12))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def roi_align_rotated(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                      out_size: Tuple[int, int] = (7, 7),
                      spatial_scales: Sequence[float] = (1 / 8, 1 / 16,
                                                         1 / 32, 1 / 64),
                      sampling_ratio: int = 2,
                      finest_scale: float = 56.0,
                      clockwise: bool = False) -> jnp.ndarray:
    """Rotated RoIAlign across pyramid levels.

    Args:
        feats: per-level (B, H_l, W_l, C), strides = 1/spatial_scales.
        rois: (B, R, 5) [cx, cy, w, h, theta] in image coordinates.
        out_size: (out_h, out_w) bins.
        sampling_ratio: s -> s*s sample points per bin (fixed, static).
        clockwise: matches mmcv's flag (reference uses default False).

    Returns:
        (B, R, out_h, out_w, C) pooled features.
    """
    b, _, _, c = feats[0].shape
    num_levels = len(feats)
    out_h, out_w = out_size
    s = sampling_ratio

    # Flatten pyramid: (B, sum HW, C) + per-level (offset, W, H, scale)
    flat = jnp.concatenate([f.reshape(b, -1, c) for f in feats], axis=1)
    offsets, widths, heights, scales = [], [], [], []
    off = 0
    for f, sc in zip(feats, spatial_scales):
        offsets.append(off)
        heights.append(f.shape[1])
        widths.append(f.shape[2])
        scales.append(sc)
        off += f.shape[1] * f.shape[2]
    offsets = jnp.asarray(offsets, jnp.int32)
    widths = jnp.asarray(widths, jnp.int32)
    heights = jnp.asarray(heights, jnp.int32)
    scales = jnp.asarray(scales, jnp.float32)

    lvl = _level_of_rois(rois, num_levels, finest_scale)      # (B, R)
    roi_scale = scales[lvl]                                    # (B, R)
    roi_off = offsets[lvl]
    roi_w_feat = widths[lvl]
    roi_h_feat = heights[lvl]

    # Sample-point grid in roi-local coords: bins (out_h, out_w), s*s points
    # per bin, uniformly placed (mmcv convention: (k + 0.5) / s within bin).
    gy = (jnp.arange(out_h * s) + 0.5) / (out_h * s) - 0.5     # (out_h*s,)
    gx = (jnp.arange(out_w * s) + 0.5) / (out_w * s) - 0.5
    gxx, gyy = jnp.meshgrid(gx, gy)                            # (oh*s, ow*s)
    grid = jnp.stack([gxx.ravel(), gyy.ravel()], -1)           # (P, 2)
    P = grid.shape[0]

    cx, cy, w, h, a = [rois[..., i] for i in range(5)]
    if clockwise:
        a = -a
    cos_a, sin_a = jnp.cos(a), jnp.sin(a)
    # image-space sample coords: center + R(a) @ (gx*w, gy*h)
    lx = grid[None, None, :, 0] * w[..., None]                 # (B, R, P)
    ly = grid[None, None, :, 1] * h[..., None]
    px = cx[..., None] + lx * cos_a[..., None] - ly * sin_a[..., None]
    py = cy[..., None] + lx * sin_a[..., None] + ly * cos_a[..., None]

    # to feature coords of the roi's level (aligned=True: -0.5 offset)
    fx = px * roi_scale[..., None] - 0.5
    fy = py * roi_scale[..., None] - 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    W = roi_w_feat[..., None]                                  # (B, R, 1)
    H = roi_h_feat[..., None]

    R = rois.shape[1]

    def gather_corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        idx = roi_off[..., None] + yi_c * W + xi_c             # (B, R, P)
        vals = jnp.take_along_axis(flat, idx.reshape(b, R * P)[:, :, None],
                                   axis=1)                     # (B, R*P, C)
        vals = vals.reshape(b, R, P, c)
        return vals * (wgt * inb)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = gather_corner(x0i, y0i, wx0 * wy0) + \
        gather_corner(x0i + 1, y0i, wx1 * wy0) + \
        gather_corner(x0i, y0i + 1, wx0 * wy1) + \
        gather_corner(x0i + 1, y0i + 1, wx1 * wy1)             # (B, R, P, c)

    out = out.reshape(b, -1, out_h, s, out_w, s, c).mean(axis=(3, 5))
    # zero out degenerate/padding rois
    valid = (w > 1e-3) & (h > 1e-3)
    return out * valid[..., None, None, None]
