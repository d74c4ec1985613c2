"""ResNet backbone (flax.linen, NHWC, bf16-ready).

The reference pulls ``ResNet`` from mmdet via registry alias
(``models/builder.py:4-12``; configs ``rotated_retinanet/*.py`` use R50 with
``frozen_stages=1, norm_eval=True``). This is a ground-up JAX module, laid
out for TPU: NHWC convs (XLA's native layout), norm+activation fused by XLA,
frozen BatchNorm folded into scale/bias (the reference always trains
detection with ``norm_eval=True``, so running stats are constants).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES


class FrozenBatchNorm(nn.Module):
    """BatchNorm: frozen running statistics by default, live when trained
    with a mutable ``batch_stats`` collection.

    Frozen mode is the reference's ``norm_eval=True`` BN (the default for
    every pretrained-ResNet detection config): a per-channel affine using
    checkpoint statistics. When the train step applies the model with
    ``mutable=['batch_stats']`` (``norm_eval=False`` configs — CSPNeXt /
    YOLO prototypes train BN live, reference ``base_backbone.py:216-224``),
    the layer normalizes with the current batch's statistics and EMA-updates
    the running stats (momentum 0.1, torch convention). ``zero_scale``
    (residual-branch-final norms) keeps activation variance bounded at init
    when training without pretrained stats.
    """
    eps: float = 1e-5
    momentum: float = 0.1
    zero_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param(
            'scale',
            nn.initializers.zeros if self.zero_scale
            else nn.initializers.ones, (c,), jnp.float32)
        beta = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((c,), jnp.float32))
        live = self.is_mutable_collection('batch_stats') and \
            not self.is_initializing()
        if live:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            # batch statistics; under a batch-sharded jit XLA turns these
            # reductions into cross-replica means (SyncBN for free)
            bmean = xf.mean(axes)
            bvar = xf.var(axes)
            mean.value = (1 - self.momentum) * mean.value + \
                self.momentum * bmean
            var.value = (1 - self.momentum) * var.value + \
                self.momentum * bvar
            use_mean, use_var = bmean, bvar
        else:
            use_mean, use_var = mean.value, var.value
        scale = gamma / jnp.sqrt(use_var + self.eps)
        bias = beta - use_mean * scale
        return (x * scale.astype(self.dtype) + bias.astype(self.dtype))


def make_norm(norm_cfg: Optional[dict], dtype, name=None):
    norm_cfg = norm_cfg or dict(type='BN')
    t = norm_cfg.get('type', 'BN')
    if t in ('BN', 'SyncBN', 'FrozenBN'):
        # Detection training runs norm_eval; SyncBN differences only matter
        # for from-scratch training (handled by GN fallback for now).
        return FrozenBatchNorm(dtype=dtype, name=name)
    if t == 'GN':
        return nn.GroupNorm(num_groups=norm_cfg.get('num_groups', 32),
                            dtype=dtype, name=name)
    raise ValueError(f'unknown norm {t}')


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 with identity/projection shortcut
    (torchvision/mmdet 'pytorch' style: stride on the 3x3)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm_cfg: Optional[dict] = None
    zero_init_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = make_norm(self.norm_cfg, self.dtype, 'bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=[(self.dilation, self.dilation)] * 2,
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = make_norm(self.norm_cfg, self.dtype, 'bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name='conv3')(out)
        out = FrozenBatchNorm(zero_scale=self.zero_init_residual,
                              dtype=self.dtype, name='bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = make_norm(self.norm_cfg, self.dtype,
                                 'downsample_bn')(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                      name='conv1')(x)
        out = make_norm(self.norm_cfg, self.dtype, 'bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2,
                      use_bias=False, dtype=self.dtype, name='conv2')(out)
        out = make_norm(self.norm_cfg, self.dtype, 'bn2')(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            identity = make_norm(self.norm_cfg, self.dtype,
                                 'downsample_bn')(identity)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nn.Module):
    """mmdet-config-compatible ResNet.

    Config keys accepted (reference configs, e.g.
    ``rotated_retinanet_obb_r50_fpn_1x_dota_le90.py``): depth, num_stages,
    out_indices, frozen_stages (freezing is handled by the optimizer mask in
    :mod:`parallel.train_state`), norm_cfg, norm_eval, zero_init_residual,
    style, init_cfg (ignored — weights come from the converter).
    """
    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    norm_eval: bool = True
    style: str = 'pytorch'
    zero_init_residual: bool = False
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block, stage_blocks = ARCH_SETTINGS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = make_norm(self.norm_cfg, self.dtype, 'bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        outs = []
        planes = 64
        for i in range(self.num_stages):
            n_blocks = stage_blocks[i]
            for j in range(n_blocks):
                stride = self.strides[i] if j == 0 else 1
                expansion = 4 if block is Bottleneck else 1
                need_ds = (j == 0) and (stride != 1 or
                                        x.shape[-1] != planes * expansion)
                kw = {}
                if block is Bottleneck:
                    kw['zero_init_residual'] = self.zero_init_residual
                x = block(planes=planes, stride=stride,
                          dilation=self.dilations[i], downsample=need_ds,
                          norm_cfg=self.norm_cfg, dtype=self.dtype,
                          name=f'layer{i + 1}_{j}', **kw)(x)
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
