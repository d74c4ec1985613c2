"""Rotation-equivariant ResNet + FPN (ReDet) — C8 group convs in flax.

Rebuilds reference ``backbones/re_resnet.py:17-616`` + ``necks/re_fpn.py``
(which use e2cnn regular representations, pure PyTorch — SURVEY.md §2.9).

TPU-native formulation: a C8-*regular* feature carries 8 orientation
channels per base channel (orientation-minor layout, C = base * 8). A
group-equivariant conv applies 8 rotated copies of one learned filter, each
rotated copy ALSO cycling the input orientation channels. Two filter
parameterizations are provided (``conv_basis``):

- ``'permutation'`` (default): the 45-degree spatial rotation of a 3x3
  kernel is the ring permutation of its taps — the ORConv (8, 8)
  active-rotating-filter scheme (``models/utils_rotation.py``). Exact at
  90-degree multiples; measured LOWER 45-degree equivariance error than
  bilinear tap rotation (tests/test_models/test_equivariance.py).
- ``'steerable'``: e2cnn's R2Conv scheme (reference
  ``models/utils/enn.py:37-161``) — filters are coefficients over a
  precomputed Gaussian-ring x angular-frequency basis
  (``utils_rotation.c8_steerable_basis``); every rotated copy samples the
  EXACTLY-rotated continuous function, so no tap-rotation error enters
  the filter bank.

The lifting conv (image -> regular) uses the same scheme with 1 input
orientation. Reference e2cnn checkpoints convert via their expanded
``.filter`` buffers (``tools/model_converters/convert_torch_weights.py``
``torch_re_resnet_to_flax`` / ``torch_re_fpn_to_flax``, round-trip-tested).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES, NECKS
from ..backbones.resnet import FrozenBatchNorm
from ..utils_rotation import ORConv2d


class ReConv(nn.Module):
    """C8-equivariant conv over regular features (orientation-minor)."""
    out_base_channels: int
    kernel_size: int = 3
    stride: int = 1
    in_orientations: int = 8
    use_bias: bool = False
    steerable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kernel_size == 1:
            # 1x1 group conv = plain conv with orientation-cycled weights;
            # equivalently a grouped dense over (base_in, 8) with cycling.
            # Implement via ORConv-style weight roll at k=1 (no spatial
            # rotation needed).
            cin = x.shape[-1]
            cin_base = cin // self.in_orientations
            w = self.param('kernel', nn.initializers.he_normal(),
                           (1, cin_base, self.in_orientations,
                            self.out_base_channels), jnp.float32)
            ws = []
            for o in range(8):
                wo = jnp.roll(w, o, axis=2) if self.in_orientations == 8 \
                    else w
                ws.append(wo)
            wall = jnp.stack(ws, -1).reshape(
                1, 1, cin, self.out_base_channels * 8).astype(self.dtype)
            import jax.lax as lax
            out = lax.conv_general_dilated(
                x.astype(self.dtype), wall, (self.stride,) * 2, 'VALID',
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return self._add_field_bias(out)
        # stride goes INTO the conv (a full-res conv + [::stride] slice
        # wastes stride^2 x the MXU work)
        # ring permutation, NOT bilinear tap rotation: for a 3x3 kernel the
        # measured 45-degree equivariance error of the permutation is LOWER
        # (bilinear clips corner mass out of the grid) — see
        # tests/test_models/test_equivariance.py
        oc = ORConv2d(self.out_base_channels, kernel_size=3,
                      in_orientations=self.in_orientations,
                      num_orientations=8, use_bias=False,
                      steerable=self.steerable,
                      stride=self.stride, dtype=self.dtype, name='orconv')
        return self._add_field_bias(oc(x))

    def _add_field_bias(self, out):
        """Per-FIELD bias repeated over the 8 orientation channels —
        e2cnn's equivariance-preserving bias form (an orientation-varying
        bias would break C8 equivariance; reference ReFPN ConvModules carry
        exactly this per-field bias, ``necks/re_fpn.py:72-86``)."""
        if not self.use_bias:
            return out
        b = self.param('bias', nn.initializers.zeros,
                       (self.out_base_channels,), jnp.float32)
        return out + jnp.repeat(b, 8).astype(out.dtype)


class ReBottleneck(nn.Module):
    base_planes: int
    stride: int = 1
    downsample: bool = False
    steerable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ReConv(self.base_planes, 1, dtype=self.dtype,
                     name='conv1')(x)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn1')(out)
        out = nn.relu(out)
        out = ReConv(self.base_planes, 3, stride=self.stride,
                     steerable=self.steerable,
                     dtype=self.dtype, name='conv2')(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn2')(out)
        out = nn.relu(out)
        out = ReConv(self.base_planes * 4, 1, dtype=self.dtype,
                     name='conv3')(out)
        out = FrozenBatchNorm(zero_scale=True, dtype=self.dtype,
                              name='bn3')(out)
        if self.downsample:
            identity = ReConv(self.base_planes * 4, 1, stride=self.stride,
                              dtype=self.dtype, name='ds_conv')(x)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name='ds_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ReResNet(nn.Module):
    """C8-equivariant ResNet (channels are base*8 regular features).

    depth 50 arch; base widths are 1/8 of standard ResNet so the regular
    feature width matches (reference uses gspace N=8, ``utils/enn.py:5-6``).
    """
    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    norm_eval: bool = True
    style: str = 'pytorch'
    zero_init_residual: bool = False
    conv_basis: str = 'permutation'   # 'steerable' = e2cnn basis expansion
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # depth 18 = 1-block stages (tiny test arch; same out channels)
        stage_blocks = {18: (1, 1, 1, 1), 50: (3, 4, 6, 3),
                        101: (3, 4, 23, 3)}[self.depth]
        # lifting stem: image (1 orientation) -> regular C8 features
        steer = self.conv_basis == 'steerable'
        x = ORConv2d(8, kernel_size=3, in_orientations=1,
                     num_orientations=8, use_bias=False, stride=2,
                     steerable=steer, dtype=self.dtype,
                     name='stem_lift')(x)          # 64 channels = 8 base * 8
        x = FrozenBatchNorm(dtype=self.dtype, name='stem_bn')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        outs = []
        base = 8                                     # 8 base * 8 orient = 64
        for i in range(self.num_stages):
            for j in range(stage_blocks[i]):
                stride = self.strides[i] if j == 0 else 1
                need_ds = (j == 0) and (stride != 1 or
                                        x.shape[-1] != base * 4 * 8)
                x = ReBottleneck(base_planes=base, stride=stride,
                                 downsample=need_ds, steerable=steer,
                                 dtype=self.dtype,
                                 name=f'layer{i + 1}_{j}')(x)
            if i in self.out_indices:
                outs.append(x)
            base *= 2
        return tuple(outs)


@NECKS.register_module()
class ReFPN(nn.Module):
    """Equivariant FPN (reference ``necks/re_fpn.py:14-325``): 1x1 group-conv
    laterals + top-down + 3x3 group-conv outputs, all C8-regular."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Any = False
    conv_basis: str = 'permutation'   # 'steerable' = e2cnn basis expansion
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        from ..necks.fpn import upsample_nearest_2x
        used = list(inputs[self.start_level:])
        out_base = self.out_channels // 8
        # lateral/fpn convs carry a per-field bias like the reference's
        # equivariant ConvModule (bias='auto' with no norm -> True,
        # ``necks/re_fpn.py:72-86``)
        laterals = [
            ReConv(out_base, 1, use_bias=True, dtype=self.dtype,
                   name=f'lateral_{i}')(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [ReConv(out_base, 3, use_bias=True,
                       steerable=self.conv_basis == 'steerable',
                       dtype=self.dtype, name=f'fpn_{i}')(lat)
                for i, lat in enumerate(laterals)]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


def ri_roi_align_rotated(feats, rois, out_size=(7, 7),
                         spatial_scales=(1 / 8, 1 / 16, 1 / 32, 1 / 64),
                         sampling_ratio: int = 2, num_orientations: int = 8):
    """Rotation-invariant RoIAlign (reference ``RiRoIAlignRotated`` use:
    redet configs): RoIAlignRotated + circular shift of the orientation
    channels by the roi angle, aligning features into the roi frame."""
    import jax
    from ...ops.roi_align_rotated import roi_align_rotated

    pooled = roi_align_rotated(feats, rois, out_size, spatial_scales,
                               sampling_ratio)          # (B, R, h, w, C)
    b, r, h, w, c = pooled.shape
    base = c // num_orientations
    theta = rois[..., 4]
    # A pattern rotated by +45deg has orientation channels rolled by -1
    # (verified: 90deg rotation <-> roll(-2)); aligning into the roi frame
    # therefore rolls by +theta/45 -> gather index (i - shift).
    shift = jnp.round(theta / (2 * jnp.pi / num_orientations)
                      ).astype(jnp.int32) % num_orientations   # (B, R)
    ori = pooled.reshape(b, r, h, w, base, num_orientations)
    idx = (jnp.arange(num_orientations)[None, None] -
           shift[..., None]) % num_orientations          # (B, R, 8)
    rolled = jnp.take_along_axis(
        ori, idx[:, :, None, None, None, :], axis=-1)
    return rolled.reshape(b, r, h, w, c)
