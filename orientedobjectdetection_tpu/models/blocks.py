"""YOLO-family building blocks (flax, NHWC).

Rebuilds the block set the jy models use (reference
``models/blocks/next_modules.py`` and ``yolo_blocks.py``): ConvModule
(conv+BN+SiLU), DarknetBottleneck, CSPNeXtBlock, ChannelAttention, CSPLayer,
SPPFBottleneck, CSPLayerWithTwoConv (YOLOv8 C2f). BatchNorm is the frozen
variant (detection fine-tuning / pretrained warm-start mode; the reference's
prototypes train from COCO-pretrained CSPNeXt weights).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones.resnet import FrozenBatchNorm


class ConvModule(nn.Module):
    """conv + norm + activation (mmcv ConvModule semantics)."""
    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    norm_cfg: Optional[dict] = None
    act: str = 'silu'
    use_depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = [(k // 2, k // 2)] * 2
        if self.use_depthwise:
            cin = x.shape[-1]
            x = nn.Conv(cin, (k, k), strides=(self.stride,) * 2,
                        padding=pad, feature_group_count=cin,
                        use_bias=False, dtype=self.dtype, name='dw')(x)
            x = FrozenBatchNorm(dtype=self.dtype, name='dw_bn')(x)
            x = _act(x, self.act)
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name='pw')(x)
            x = FrozenBatchNorm(dtype=self.dtype, name='pw_bn')(x)
            return _act(x, self.act)
        x = nn.Conv(self.out_channels, (k, k), strides=(self.stride,) * 2,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name='conv')(x)
        x = FrozenBatchNorm(dtype=self.dtype, name='bn')(x)
        return _act(x, self.act)


def _act(x, kind: str):
    if kind is None:
        return x
    if kind == 'silu':
        return nn.silu(x)
    if kind == 'relu':
        return nn.relu(x)
    if kind == 'lrelu':
        return nn.leaky_relu(x, 0.1)
    if kind == 'none':
        return x
    raise ValueError(kind)


class DarknetBottleneck(nn.Module):
    """1x1 -> 3x3 with optional identity (reference next_modules.py:9-75)."""
    out_channels: int
    expansion: float = 0.5
    add_identity: bool = True
    kernel_size: Tuple[int, int] = (1, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_channels * self.expansion)
        out = ConvModule(hidden, self.kernel_size[0], dtype=self.dtype,
                         name='conv1')(x)
        out = ConvModule(self.out_channels, self.kernel_size[1],
                         dtype=self.dtype, name='conv2')(out)
        if self.add_identity and x.shape[-1] == self.out_channels:
            out = out + x
        return out


class CSPNeXtBlock(nn.Module):
    """3x3 conv -> depthwise 5x5 conv (reference next_modules.py:78-140)."""
    out_channels: int
    expansion: float = 0.5
    add_identity: bool = True
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_channels * self.expansion)
        out = ConvModule(hidden, 3, dtype=self.dtype, name='conv1')(x)
        out = ConvModule(self.out_channels, self.kernel_size,
                         use_depthwise=True, dtype=self.dtype,
                         name='conv2')(out)
        if self.add_identity and x.shape[-1] == self.out_channels:
            out = out + x
        return out


class ChannelAttention(nn.Module):
    """Global-pool -> 1x1 -> hardsigmoid gate (next_modules.py:220-246)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = x.mean(axis=(1, 2), keepdims=True)
        g = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name='fc')(g)
        g = jnp.clip(g / 6.0 + 0.5, 0.0, 1.0)   # hardsigmoid
        return x * g


class CSPLayer(nn.Module):
    """Cross Stage Partial layer (next_modules.py:248-341)."""
    out_channels: int
    expand_ratio: float = 0.5
    num_blocks: int = 1
    add_identity: bool = True
    use_cspnext_block: bool = False
    channel_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.expand_ratio)
        block = CSPNeXtBlock if self.use_cspnext_block else DarknetBottleneck
        main = ConvModule(mid, 1, dtype=self.dtype, name='main_conv')(x)
        short = ConvModule(mid, 1, dtype=self.dtype, name='short_conv')(x)
        for i in range(self.num_blocks):
            main = block(mid, add_identity=self.add_identity,
                         dtype=self.dtype, name=f'block_{i}')(main)
        out = jnp.concatenate([main, short], axis=-1)
        if self.channel_attention:
            out = ChannelAttention(dtype=self.dtype, name='attn')(out)
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='final_conv')(out)


class SPPFBottleneck(nn.Module):
    """Spatial pyramid pooling, fast variant (yolo_blocks.py SPPF)."""
    out_channels: int
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1] // 2
        x = ConvModule(mid, 1, dtype=self.dtype, name='conv1')(x)
        k = self.kernel_size
        pad = [(k // 2, k // 2)] * 2
        p1 = nn.max_pool(x, (k, k), strides=(1, 1), padding=pad)
        p2 = nn.max_pool(p1, (k, k), strides=(1, 1), padding=pad)
        p3 = nn.max_pool(p2, (k, k), strides=(1, 1), padding=pad)
        out = jnp.concatenate([x, p1, p2, p3], axis=-1)
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='conv2')(out)


class CSPLayerWithTwoConv(nn.Module):
    """YOLOv8 C2f layer (reference yolo_blocks.py:978)."""
    out_channels: int
    expand_ratio: float = 0.5
    num_blocks: int = 1
    add_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.expand_ratio)
        y = ConvModule(2 * mid, 1, dtype=self.dtype, name='main_conv')(x)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        cur = y2
        for i in range(self.num_blocks):
            cur = DarknetBottleneck(mid, expansion=1.0,
                                    add_identity=self.add_identity,
                                    kernel_size=(3, 3), dtype=self.dtype,
                                    name=f'block_{i}')(cur)
            outs.append(cur)
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='final_conv')(jnp.concatenate(outs, -1))


def make_divisible(x: float, widen_factor: float = 1.0,
                   divisor: int = 8) -> int:
    """mmyolo make_divisible: scale then round to the divisor."""
    v = x * widen_factor
    return max(divisor, int(v + divisor / 2) // divisor * divisor) \
        if v > 1 else int(max(round(v), 1))


def make_round(x: float, deepen_factor: float = 1.0) -> int:
    return max(round(x * deepen_factor), 1) if x > 1 else int(x)
