"""Orientation-sensitive conv utilities (S2ANet ODM).

Replaces ``mmcv.ops.active_rotated_filter`` + reference
``models/utils/orconv.py:13-137`` / ``ripool.py:5-23``: the active rotating
filter is a fixed permutation of the 3x3 taps (ring rotation by 45 deg
steps) plus an orientation-channel roll — pure gathers over the weight
tensor, precomputed at trace time, followed by one ordinary conv (MXU).
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

# 3x3 tap ring in clockwise order (indices into the flattened 3x3 kernel);
# rotating the filter by 45 deg = shifting this ring by one.
_RING = np.array([0, 1, 2, 5, 8, 7, 6, 3])
_CENTER = 4


def _rotation_perms(num_orientations: int = 8) -> np.ndarray:
    """(num_orientations, 9) tap-permutation table: perm[k][i] = source tap
    for output tap i after rotating by k*45deg."""
    assert 8 % num_orientations == 0
    step = 8 // num_orientations
    perms = np.empty((num_orientations, 9), np.int32)
    for k in range(num_orientations):
        perm = np.empty(9, np.int32)
        perm[_CENTER] = _CENTER
        for i in range(8):
            perm[_RING[i]] = _RING[(i - k * step) % 8]
        perms[k] = perm
    return perms


class ORConv2d(nn.Module):
    """Orientation-sensitive conv: each learned filter is applied in
    ``num_orientations`` rotated copies; outputs are orientation-major
    (out_channels * num_orientations channels).

    Matches reference ``orconv.py`` with arf_config=(1, 8) (single input
    orientation) and (8, 8) (orientation-carrying input: taps rotate AND
    orientation channels roll).

    ``interp=True`` rotates the 3x3 taps with the analytic bilinear
    interpolation operator (``jy_modules.rotation_interp_matrix``) instead
    of the ring permutation. At 90-degree multiples the two are identical;
    at 45-degree multiples interpolation matches e2cnn's resampled
    steerable basis (reference ``models/utils/enn.py``) far more closely
    than nearest-neighbor tap shuffling — used by the ReDet backbone
    (``ReConv``); S2ANet's ODM keeps the permutation (mmcv
    ``active_rotated_filter`` semantics).
    """
    out_channels: int
    kernel_size: int = 3
    in_orientations: int = 1
    num_orientations: int = 8
    use_bias: bool = True
    stride: int = 1
    interp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        assert k == 3, 'active rotating filters defined for 3x3'
        cin = x.shape[-1]
        cin_base = cin // self.in_orientations
        # weight layout matches the orientation-MINOR feature layout
        # (channel index = base * num_or + orientation)
        w = self.param(
            'kernel', nn.initializers.he_normal(),
            (k * k, cin_base, self.in_orientations, self.out_channels),
            jnp.float32)
        perms = _rotation_perms(self.num_orientations)
        if self.interp:
            from .backbones.jy_modules import rotation_interp_matrix
            step = 8 // self.num_orientations
            angles = jnp.arange(self.num_orientations) * \
                (step * jnp.pi / 4)
            interp_ops = rotation_interp_matrix(angles)    # (num_or, 9, 9)

        rotated = []
        for o in range(self.num_orientations):
            if self.interp:
                # out tap p = sum_q M[p, q] * src tap q (M == perm matrix
                # at 90-degree multiples; bilinear at 45-degree ones)
                wo = jnp.einsum('pq,qbio->pbio', interp_ops[o], w)
            else:
                wo = w[perms[o]]                  # rotate taps
            if self.in_orientations > 1:
                # roll input-orientation channels by o
                shift = o * (self.in_orientations // self.num_orientations)
                wo = jnp.roll(wo, shift, axis=2)
            rotated.append(wo)
        # (k*k, cin_base, in_or, out, num_or) -> flatten both orientation-
        # minor: input (base, orient), output (out, orient)
        wall = jnp.stack(rotated, axis=-1).reshape(
            k * k, cin_base * self.in_orientations,
            self.out_channels * self.num_orientations)
        wall = wall.reshape(k, k, cin, -1).astype(self.dtype)

        import jax.lax as lax
        out = lax.conv_general_dilated(
            x.astype(self.dtype), wall,
            window_strides=(self.stride,) * 2,
            padding=[(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros,
                           (self.out_channels * self.num_orientations,),
                           jnp.float32)
            out = out + b.astype(self.dtype)
        return out


def rotation_invariant_pooling(x, num_orientations: int = 8):
    """Max over orientation channels (reference ``ripool.py:18-23``):
    (B, H, W, C) with orientation-minor layout -> (B, H, W, C/num_or)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w, c // num_orientations,
                     num_orientations).max(-1)
