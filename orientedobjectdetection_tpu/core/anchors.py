"""Prior generation: rotated anchors and multi-level points.

TPU-native rework of reference ``core/anchor/anchor_generator.py:10-75`` and
mmdet's ``AnchorGenerator`` / ``MlvlPointGenerator``: everything is computed
as static-shape jnp arrays per feature level so the whole prior grid lives
on-device and can be fused into the jitted step (no per-image host loops).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.registry import PRIOR_GENERATORS


@PRIOR_GENERATORS.register_module()
class RotatedAnchorGenerator:
    """Horizontal anchor grid extended with theta=0 -> (cx, cy, w, h, 0).

    Matches reference ``anchor_generator.py:10-51`` (which wraps mmdet's
    ``AnchorGenerator`` and appends a zero angle). Anchor centers are at
    ``(x + offset) * stride`` with offset 0 (mmdet default center=None).
    """

    def __init__(self,
                 strides: Sequence[int],
                 ratios: Sequence[float],
                 scales: Optional[Sequence[float]] = None,
                 base_sizes: Optional[Sequence[int]] = None,
                 octave_base_scale: Optional[float] = None,
                 scales_per_octave: Optional[int] = None,
                 center_offset: float = 0.0):
        self.strides = [(s, s) if isinstance(s, int) else s for s in strides]
        self.base_sizes = list(base_sizes) if base_sizes is not None \
            else [min(s) for s in self.strides]
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        elif octave_base_scale is not None and scales_per_octave is not None:
            octave_scales = np.array(
                [2**(i / scales_per_octave) for i in range(scales_per_octave)])
            self.scales = (octave_scales * octave_base_scale).astype(
                np.float32)
        else:
            raise ValueError('either scales or octave_base_scale+'
                             'scales_per_octave must be set')
        self.ratios = np.asarray(ratios, np.float32)
        self.center_offset = center_offset
        self.base_anchors = self._gen_base_anchors()

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def _gen_base_anchors(self):
        """Per-level (A, 4) xyxy base anchors (mmdet semantics: w*h scaled by
        sqrt-ratio around the center)."""
        out = []
        for base_size, stride in zip(self.base_sizes, self.strides):
            w = base_size
            h = base_size
            # mmdet semantics: offset scales the base size (default 0).
            x_center = self.center_offset * w
            y_center = self.center_offset * h
            h_ratios = np.sqrt(self.ratios)
            w_ratios = 1 / h_ratios
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
            base = np.stack([
                x_center - 0.5 * ws, y_center - 0.5 * hs,
                x_center + 0.5 * ws, y_center + 0.5 * hs
            ], axis=-1)
            out.append(jnp.asarray(base, jnp.float32))
        return out

    def grid_priors(self, featmap_sizes: Sequence[Tuple[int, int]]):
        """All-level rotated anchors.

        Returns list of (H*W*A, 5) arrays [cx, cy, w, h, 0] — the rotated
        form the reference produces in ``anchor_generator.py:24-51`` (xyxy
        anchors converted to center form with theta=0).
        """
        assert len(featmap_sizes) == self.num_levels
        multi_level = []
        for lvl, (h, w) in enumerate(featmap_sizes):
            stride_w, stride_h = self.strides[lvl]
            shift_x = jnp.arange(w, dtype=jnp.float32) * stride_w
            shift_y = jnp.arange(h, dtype=jnp.float32) * stride_h
            sx, sy = jnp.meshgrid(shift_x, shift_y)          # (h, w)
            shifts = jnp.stack([sx.ravel(), sy.ravel(),
                                sx.ravel(), sy.ravel()], -1)  # (h*w, 4)
            xyxy = self.base_anchors[lvl][None, :, :] + shifts[:, None, :]
            xyxy = xyxy.reshape(-1, 4)
            cx = (xyxy[:, 0] + xyxy[:, 2]) * 0.5
            cy = (xyxy[:, 1] + xyxy[:, 3]) * 0.5
            ww = xyxy[:, 2] - xyxy[:, 0]
            hh = xyxy[:, 3] - xyxy[:, 1]
            anchors = jnp.stack([cx, cy, ww, hh, jnp.zeros_like(cx)], -1)
            multi_level.append(anchors)
        return multi_level

    def valid_flags(self, featmap_sizes, pad_shape):
        """Per-level (H*W*A,) bool flags for anchors whose center cell lies
        inside the padded image (mmdet semantics)."""
        flags = []
        for lvl, (h, w) in enumerate(featmap_sizes):
            stride_w, stride_h = self.strides[lvl]
            valid_w = min(int(np.ceil(pad_shape[1] / stride_w)), w)
            valid_h = min(int(np.ceil(pad_shape[0] / stride_h)), h)
            vx = jnp.arange(w) < valid_w
            vy = jnp.arange(h) < valid_h
            vxx, vyy = jnp.meshgrid(vx, vy)
            v = (vxx & vyy).ravel()
            flags.append(jnp.repeat(v, self.num_base_anchors[lvl]))
        return flags


@PRIOR_GENERATORS.register_module()
class PseudoAnchorGenerator:
    """Valid-flags-only generator for refine heads whose anchors come from a
    previous stage (reference ``anchor_generator.py:54-75``)."""

    def __init__(self, strides: Sequence[int]):
        self.strides = [(s, s) if isinstance(s, int) else s for s in strides]

    @property
    def num_base_anchors(self):
        return [1 for _ in self.strides]

    @property
    def num_levels(self):
        return len(self.strides)

    def valid_flags(self, featmap_sizes, pad_shape):
        flags = []
        for lvl, (h, w) in enumerate(featmap_sizes):
            stride_w, stride_h = self.strides[lvl]
            valid_w = min(int(np.ceil(pad_shape[1] / stride_w)), w)
            valid_h = min(int(np.ceil(pad_shape[0] / stride_h)), h)
            vx = jnp.arange(w) < valid_w
            vy = jnp.arange(h) < valid_h
            vxx, vyy = jnp.meshgrid(vx, vy)
            flags.append((vxx & vyy).ravel())
        return flags


@PRIOR_GENERATORS.register_module()
class MlvlPointGenerator:
    """Multi-level point priors for anchor-free heads (FCOS, RotatedYOLOv8).

    Points are ``(x + offset) * stride``; with_stride appends (stride_w,
    stride_h), matching mmdet's generator used by the reference's FCOS and
    jy heads (``dense_heads/rotated_yolov8_head.py`` loss path).
    """

    def __init__(self, strides: Sequence[int], offset: float = 0.5):
        self.strides = [(s, s) if isinstance(s, int) else s for s in strides]
        self.offset = offset

    @property
    def num_levels(self):
        return len(self.strides)

    def grid_priors(self, featmap_sizes, with_stride: bool = False):
        out = []
        for lvl, (h, w) in enumerate(featmap_sizes):
            stride_w, stride_h = self.strides[lvl]
            x = (jnp.arange(w, dtype=jnp.float32) + self.offset) * stride_w
            y = (jnp.arange(h, dtype=jnp.float32) + self.offset) * stride_h
            xx, yy = jnp.meshgrid(x, y)
            if with_stride:
                pts = jnp.stack([
                    xx.ravel(), yy.ravel(),
                    jnp.full((h * w,), stride_w, jnp.float32),
                    jnp.full((h * w,), stride_h, jnp.float32)
                ], -1)
            else:
                pts = jnp.stack([xx.ravel(), yy.ravel()], -1)
            out.append(pts)
        return out


def anchor_inside_flags(anchors, valid_flags, img_shape, allowed_border=0):
    """Rotated-anchor border filter (reference ``core/anchor/utils.py``):
    center-inside test when allowed_border >= 0, else all valid."""
    if allowed_border < 0:
        return valid_flags
    h, w = img_shape[0], img_shape[1]
    cx, cy = anchors[:, 0], anchors[:, 1]
    inside = (cx >= -allowed_border) & (cy >= -allowed_border) & \
             (cx < w + allowed_border) & (cy < h + allowed_border)
    return valid_flags & inside
