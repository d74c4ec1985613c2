"""ConvNeXt backbone, flax/NHWC.

The reference pulls ConvNeXt from mmcls via the registry alias
(``models/builder.py:4-12``; used by ``configs/convnext/*.py``).  TPU notes:
the 7x7 depthwise conv + LayerNorm + MLP block is expressed channels-last so
the pointwise MLPs hit the MXU directly; LayerScale folds into the second
Dense at compile time.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES

ARCHS = {
    'tiny': dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    'small': dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    'base': dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    'large': dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3)] * 2,
                    feature_group_count=self.dim, dtype=self.dtype,
                    name='dwconv')(x)
        x = nn.LayerNorm(dtype=self.dtype, name='norm')(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name='pwconv1')(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name='pwconv2')(x)
        gamma = self.param('gamma',
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,), jnp.float32)
        return shortcut + x * gamma.astype(x.dtype)


@BACKBONES.register_module()
class ConvNeXt(nn.Module):
    arch: str = 'tiny'
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    drop_path_rate: float = 0.0     # stochastic depth: identity at inference
    layer_scale_init_value: float = 1e-6
    gap_before_final_norm: bool = False
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        spec = ARCHS[self.arch]
        depths, dims = spec['depths'], spec['dims']
        outs = []
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            if i == 0:
                x = nn.Conv(dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                            name='stem_conv')(x)
                x = nn.LayerNorm(dtype=self.dtype, name='stem_norm')(x)
            else:
                x = nn.LayerNorm(dtype=self.dtype, name=f'down_norm_{i}')(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f'down_conv_{i}')(x)
            for j in range(depth):
                x = ConvNeXtBlock(
                    dim, layer_scale_init=self.layer_scale_init_value,
                    dtype=self.dtype, name=f'stage{i}_block{j}')(x)
            if i in self.out_indices:
                outs.append(nn.LayerNorm(dtype=self.dtype,
                                         name=f'out_norm_{i}')(x))
        return tuple(outs)
