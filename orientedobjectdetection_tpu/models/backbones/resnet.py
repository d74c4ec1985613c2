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

import jax
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


def _tiled_stem_indices():
    """Index map folding a 7x7/2 conv into a 3x3/1 conv over 4x4
    space-to-depth blocks with a 2x2 output tile.

    The stem conv (7x7, stride 2, pad 3, cin=3) is the slowest op in the
    whole detector on TPU: 3 input channels leave the MXU's 128-wide
    contraction ~2% utilized. Rewriting it over 4x4 input blocks
    (channels 16*cin) emitting 2x2 output tiles (channels 4*cout) gives a
    contraction of 9*16*cin=432 and output width 4*cout=256 — MXU-shaped —
    and is EXACT: output pixel (2I+u, 2J+v) reads input 4(I+P-1)+s for
    P in [0,3), s in [0,4), matching original tap p = 4P + s - 2u - 1
    (taps outside [0,7) get zero weight).

    Returns (p_idx, q_idx, valid) of shape (3, 3, 4, 4, 2, 2) for
    gathering w9[P,Q,sr,sc,u,v] = w7[p, q] * valid.
    """
    import numpy as np
    P = np.arange(3)[:, None, None, None, None, None]
    Q = np.arange(3)[None, :, None, None, None, None]
    sr = np.arange(4)[None, None, :, None, None, None]
    sc = np.arange(4)[None, None, None, :, None, None]
    u = np.arange(2)[None, None, None, None, :, None]
    v = np.arange(2)[None, None, None, None, None, :]
    p = 4 * P + sr - 2 * u - 1 + 0 * (Q + sc + v)
    q = 4 * Q + sc - 2 * v - 1 + 0 * (P + sr + u)
    valid = (p >= 0) & (p < 7) & (q >= 0) & (q < 7)
    return np.clip(p, 0, 6), np.clip(q, 0, 6), valid


class TiledStemConv(nn.Module):
    """7x7/2 stem conv, lowered as space-to-depth(4) -> 3x3/1 conv ->
    depth-to-space(2). Parameter name/shape ('kernel', (7,7,cin,f))
    matches ``nn.Conv`` so converted checkpoints load unchanged; the
    weight fold is a tiny gather re-done each call (XLA keeps it fused).
    Falls back to the plain conv when H or W is not a multiple of 4.
    """
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param('kernel', nn.initializers.lecun_normal(),
                       (7, 7, cin, self.features), jnp.float32)
        x = x.astype(self.dtype)   # loader feeds f32; compute in bf16
        B, H, W, _ = x.shape
        if H % 4 or W % 4:
            return jax.lax.conv_general_dilated(
                x, w.astype(self.dtype), (2, 2), [(3, 3)] * 2,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        p_idx, q_idx, valid = _tiled_stem_indices()
        w9 = w[p_idx, q_idx] * valid[..., None, None]  # (3,3,4,4,2,2,cin,f)
        w9 = w9.transpose(0, 1, 2, 3, 6, 4, 5, 7)      # (3,3,sr,sc,c,u,v,f)
        w9 = w9.reshape(3, 3, 16 * cin, 4 * self.features)
        xs = x.reshape(B, H // 4, 4, W // 4, 4, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4,
                                                    16 * cin)
        y = jax.lax.conv_general_dilated(
            xs, w9.astype(self.dtype), (1, 1), [(1, 1)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y = y.reshape(B, H // 4, W // 4, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(B, H // 2, W // 2, self.features)


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
        x = TiledStemConv(features=64, dtype=self.dtype, name='conv1')(x)
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
