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


def c8_steerable_basis(num_orientations: int = 8):
    """Sampled steerable filter basis for C8 on the 3x3 grid — the
    precomputed-basis-expansion scheme of e2cnn's ``R2Conv`` (reference
    ``models/utils/enn.py:37-161``, SURVEY §7.8), discretized for the C8
    gspace.

    Basis functions are continuous polar profiles
    ``b(r, phi) = G_{r0}(r) * {cos,sin}(k * phi)`` with Gaussian radial
    rings ``r0 in {0, 1, sqrt(2)}`` (sigma 0.6, e2cnn's default ring
    placement for a 3x3 kernel) and angular frequencies band-limited at
    ``k <= 4``; ``sin(4 phi)`` is excluded because it samples to exactly
    zero on the 3x3 tap angles (all multiples of 45 deg). Rotating such a
    function by ``alpha`` is EXACT in function space (a phase shift of the
    trigonometric factor), so each rotated filter copy is the sample of the
    *exactly* rotated function — no tap interpolation error, unlike the
    bilinear operator (``rotation_interp_matrix``).

    Returns:
        (num_orientations, 9, n_basis) float32: basis function ``b``
        sampled on the 3x3 grid for the copy rotated by ``o*360/num_or``
        degrees, L2-normalized per basis element at rotation 0. Layout of
        the tap axis matches the flattened (row-major) 3x3 kernel.
    """
    # tap coordinates in array layout: tap i = (row, col), row down. Use
    # phi measured so that rotating by +45 deg matches one _RING step of
    # the permutation table (validated against _rotation_perms in tests).
    rows, cols = np.divmod(np.arange(9), 3)
    dy = rows - 1.0
    dx = cols - 1.0
    r = np.sqrt(dx * dx + dy * dy)
    phi = np.arctan2(dy, dx)

    sigma = 0.6
    specs = []                      # (r0, k, use_sin)
    specs.append((0.0, 0, False))
    for r0 in (1.0, np.sqrt(2.0)):
        for k in range(0, 5):
            specs.append((r0, k, False))
            if 1 <= k <= 3:
                specs.append((r0, k, True))

    step = 2 * np.pi / num_orientations
    basis = np.zeros((num_orientations, 9, len(specs)), np.float32)
    norms = np.ones(len(specs), np.float32)
    for b, (r0, k, use_sin) in enumerate(specs):
        radial = np.exp(-(r - r0) ** 2 / (2 * sigma * sigma))
        if k > 0:
            # phi is ill-defined at the origin; a k>=1 angular profile is
            # only continuous there if it vanishes (e2cnn masks the same
            # way) — otherwise the center tap would break equivariance
            radial = radial * (r > 1e-6)
        for o in range(num_orientations):
            ang = k * (phi - o * step)
            angular = np.sin(ang) if use_sin else np.cos(ang)
            basis[o, :, b] = radial * angular
        norms[b] = max(np.linalg.norm(basis[0, :, b]), 1e-6)
    basis /= norms[None, None, :]
    return basis


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
    steerable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        assert k == 3, 'active rotating filters defined for 3x3'
        cin = x.shape[-1]
        cin_base = cin // self.in_orientations
        if self.steerable:
            # precomputed-basis expansion (e2cnn R2Conv scheme): the free
            # parameters are COEFFICIENTS over the steerable basis; every
            # rotated copy is the sample of the exactly-rotated continuous
            # function, so no tap-rotation error enters the filter bank.
            basis = jnp.asarray(c8_steerable_basis(self.num_orientations))
            n_basis = basis.shape[-1]
            fan_in = cin_base * self.in_orientations * k * k
            coeff = self.param(
                'coeff',
                nn.initializers.normal(float(np.sqrt(2.0 / fan_in))),
                (n_basis, cin_base, self.in_orientations,
                 self.out_channels), jnp.float32)
        else:
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
            if self.steerable:
                wo = jnp.einsum('pb,bcio->pcio', basis[o], coeff)
            elif self.interp:
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
