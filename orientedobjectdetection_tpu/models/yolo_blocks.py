"""YOLO-family building blocks, flax/NHWC.

Rebuilds the reference's block library (``models/blocks/yolo_blocks.py``,
2671 LoC): RepVGG re-parameterizable convs, CSP variants, SPP variants, and
the attention/fusion blocks (CBAM, ESE, LSK, AFF/iAFF, ASFF) used by the
YOLOv6/v8 necks and jy prototypes.  TPU notes: everything is expressed as
dense NHWC convs so XLA can fuse the elementwise tails into the MXU matmuls;
RepVGG keeps the multi-branch form (branch fusion is a weight-space identity
the converter can apply offline — on TPU the 3 parallel convs fuse into one
XLA computation anyway).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvModule, CSPLayer, DarknetBottleneck, make_divisible


class RepVGGBlock(nn.Module):
    """Re-parameterizable block (reference yolo_blocks.py RepVGGBlock):
    3x3 conv + 1x1 conv + identity-BN branches summed, ReLU.  At deploy the
    reference folds them into one 3x3; under XLA the three branches compile
    into a single fused kernel, so the train-time form is kept."""
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvModule(self.out_channels, 3, stride=self.stride,
                       act=None, dtype=self.dtype, name='rbr_dense')(x)
        y = y + ConvModule(self.out_channels, 1, stride=self.stride,
                           act=None, dtype=self.dtype, name='rbr_1x1')(x)
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            scale = self.param('id_scale', nn.initializers.ones,
                               (self.out_channels,), jnp.float32)
            bias = self.param('id_bias', nn.initializers.zeros,
                              (self.out_channels,), jnp.float32)
            y = y + x * scale.astype(y.dtype) + bias.astype(y.dtype)
        return nn.relu(y)


class RepStageBlock(nn.Module):
    """n chained RepVGG blocks (YOLOv6 stage body)."""
    out_channels: int
    num_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = RepVGGBlock(self.out_channels, dtype=self.dtype,
                            name=f'block_{i}')(x)
        return x


class SPPBottleneck(nn.Module):
    """Parallel-pool SPP (kernel sizes 5/9/13), the non-sequential variant."""
    out_channels: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.out_channels // 2
        x = ConvModule(mid, 1, dtype=self.dtype, name='conv1')(x)
        pools = [x] + [
            nn.max_pool(x, (k, k), strides=(1, 1),
                        padding=[(k // 2, k // 2)] * 2)
            for k in self.kernel_sizes]
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='conv2')(jnp.concatenate(pools, -1))


class CSPSPPFBottleneck(nn.Module):
    """CSP-wrapped sequential SPPF (reference yolo_blocks.py CSPSPPF)."""
    out_channels: int
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.out_channels // 2
        a = ConvModule(mid, 1, dtype=self.dtype, name='short')(x)
        y = ConvModule(mid, 1, dtype=self.dtype, name='main1')(x)
        y = ConvModule(mid, 3, dtype=self.dtype, name='main2')(y)
        y = ConvModule(mid, 1, dtype=self.dtype, name='main3')(y)
        k = self.kernel_size
        p1 = nn.max_pool(y, (k, k), strides=(1, 1),
                         padding=[(k // 2, k // 2)] * 2)
        p2 = nn.max_pool(p1, (k, k), strides=(1, 1),
                         padding=[(k // 2, k // 2)] * 2)
        p3 = nn.max_pool(p2, (k, k), strides=(1, 1),
                         padding=[(k // 2, k // 2)] * 2)
        y = ConvModule(mid, 1, dtype=self.dtype, name='main4')(
            jnp.concatenate([y, p1, p2, p3], -1))
        y = ConvModule(mid, 3, dtype=self.dtype, name='main5')(y)
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='final')(jnp.concatenate([a, y], -1))


class C3(nn.Module):
    """CSP bottleneck with 3 convs (yolov5 C3; reference C3/C3K2 base)."""
    out_channels: int
    num_blocks: int = 1
    add_identity: bool = True
    expand_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.expand_ratio)
        a = ConvModule(mid, 1, dtype=self.dtype, name='cv1')(x)
        b = ConvModule(mid, 1, dtype=self.dtype, name='cv2')(x)
        for i in range(self.num_blocks):
            a = DarknetBottleneck(mid, add_identity=self.add_identity,
                                  dtype=self.dtype, name=f'm_{i}')(a)
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='cv3')(jnp.concatenate([a, b], -1))


class CBAM(nn.Module):
    """Convolutional block attention (reference yolo_blocks.py CBAM):
    channel gate (avg+max MLP) then spatial gate (avg/max-over-C 7x7)."""
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mlp = nn.Sequential([
            nn.Dense(max(c // self.reduction, 8), dtype=self.dtype),
            nn.relu,
            nn.Dense(c, dtype=self.dtype)])
        gate = jax.nn.sigmoid(mlp(x.mean((1, 2))) + mlp(x.max((1, 2))))
        x = x * gate[:, None, None, :]
        s = jnp.concatenate([x.mean(-1, keepdims=True),
                             x.max(-1, keepdims=True)], -1)
        sg = jax.nn.sigmoid(nn.Conv(1, (7, 7), padding=[(3, 3)] * 2,
                                    dtype=self.dtype, name='spatial')(s))
        return x * sg


class ESEAttn(nn.Module):
    """Effective squeeze-excite (reference ESE): 1x1 on GAP, sigmoid gate."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = x.mean((1, 2), keepdims=True)
        gate = jax.nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                                      name='fc')(g))
        return x * gate


class LSKBlock(nn.Module):
    """Large selective kernel (LSKNet block; reference LSK attention):
    two depthwise branches (5x5, then 7x7 dilated-3 for ~23x23 RF), spatially
    selected by avg/max descriptor convs."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a1 = nn.Conv(c, (5, 5), padding=[(2, 2)] * 2, feature_group_count=c,
                     dtype=self.dtype, name='dw5')(x)
        a2 = nn.Conv(c, (7, 7), padding=[(9, 9)] * 2, kernel_dilation=(3, 3),
                     feature_group_count=c, dtype=self.dtype,
                     name='dw7d3')(a1)
        a1 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name='pw1')(a1)
        a2 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name='pw2')(a2)
        u = jnp.concatenate([a1, a2], -1)
        s = jnp.concatenate([u.mean(-1, keepdims=True),
                             u.max(-1, keepdims=True)], -1)
        sel = jax.nn.sigmoid(nn.Conv(2, (7, 7), padding=[(3, 3)] * 2,
                                     dtype=self.dtype, name='select')(s))
        fused = a1 * sel[..., 0:1] + a2 * sel[..., 1:2]
        return x * nn.Conv(c, (1, 1), dtype=self.dtype, name='proj')(fused)


class AFF(nn.Module):
    """Attentional feature fusion (reference AFF): fuse x+y by a gate from
    local (1x1 convs) + global (GAP) MS-CAM attention."""
    reduction: int = 4
    iterative: bool = False
    dtype: Any = jnp.float32

    def _ms_cam(self, z, name):
        c = z.shape[-1]
        mid = max(c // self.reduction, 8)
        local = nn.Conv(c, (1, 1), dtype=self.dtype, name=f'{name}_l2')(
            nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype,
                            name=f'{name}_l1')(z)))
        g = z.mean((1, 2), keepdims=True)
        glob = nn.Conv(c, (1, 1), dtype=self.dtype, name=f'{name}_g2')(
            nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype,
                            name=f'{name}_g1')(g)))
        return jax.nn.sigmoid(local + glob)

    @nn.compact
    def __call__(self, x, y):
        w = self._ms_cam(x + y, 'attn1')
        out = x * w + y * (1 - w)
        if self.iterative:                      # iAFF second stage
            w2 = self._ms_cam(out, 'attn2')
            out = x * w2 + y * (1 - w2)
        return out


class iAFF(AFF):
    iterative: bool = True


class ASFF(nn.Module):
    """Adaptively spatial feature fusion (reference ASFF): resample all
    levels to one level's resolution, softmax-weight per location."""
    level: int = 0                               # index into inputs (0=finest)
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        tgt_h, tgt_w = feats[self.level].shape[1:3]
        resized = []
        for i, f in enumerate(feats):
            f = ConvModule(self.out_channels, 1, dtype=self.dtype,
                           name=f'compress_{i}')(f)
            h, w = f.shape[1:3]
            if h != tgt_h:
                f = jax.image.resize(f, (f.shape[0], tgt_h, tgt_w,
                                         f.shape[-1]), 'nearest')
            resized.append(f)
        stack = jnp.stack(resized, 1)            # (B, L, H, W, C)
        lvl_w = [ConvModule(8, 1, dtype=self.dtype, name=f'weight_{i}')(f)
                 for i, f in enumerate(resized)]
        logits = nn.Conv(len(feats), (1, 1), dtype=self.dtype,
                         name='weight_levels')(jnp.concatenate(lvl_w, -1))
        attn = jax.nn.softmax(logits, -1)        # (B, H, W, L)
        fused = (stack * jnp.moveaxis(attn, -1, 1)[..., None]).sum(1)
        return ConvModule(self.out_channels, 3, dtype=self.dtype,
                          name='expand')(fused)


class BiFusion(nn.Module):
    """YOLOv6 BiFusion: merge current, upsampled-coarser and downsampled-
    finer levels."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cur, coarser_up, finer):
        c0 = ConvModule(self.out_channels, 1, dtype=self.dtype,
                        name='cv_cur')(cur)
        c1 = ConvModule(self.out_channels, 1, dtype=self.dtype,
                        name='cv_fine')(finer)
        c1 = ConvModule(self.out_channels, 3, stride=2, dtype=self.dtype,
                        name='down')(c1)
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='cv_out')(
            jnp.concatenate([coarser_up, c0, c1], -1))
