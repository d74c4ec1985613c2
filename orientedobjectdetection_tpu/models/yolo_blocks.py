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


# ---------------------------------------------------------------------------
# Round-3 completion of the reference block surface
# (reference models/blocks/yolo_blocks.py classes not covered above; the
# CSP/darknet primitives DarknetBottleneck / CSPLayerWithTwoConv /
# SPPFBottleneck live in models/blocks.py and are re-exported below).
# ---------------------------------------------------------------------------


class BottleRep(nn.Module):
    """Two chained RepVGG blocks with an optionally learned residual weight
    (reference yolo_blocks.py BottleRep:266)."""
    out_channels: int
    adaptive_weight: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = RepVGGBlock(self.out_channels, dtype=self.dtype, name='conv1')(x)
        y = RepVGGBlock(self.out_channels, dtype=self.dtype, name='conv2')(y)
        if x.shape[-1] != self.out_channels:
            return y
        if self.adaptive_weight:
            alpha = self.param('alpha', nn.initializers.ones, (1,),
                               jnp.float32)
            return y + alpha.astype(y.dtype) * x
        return y + x


class ConvWrapper(nn.Module):
    """Plain conv (with bias, no norm) + SiLU (reference ConvWrapper:310 —
    the YOLOv6 'fuse-ready' conv)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        y = nn.Conv(self.out_channels, (k, k), strides=(self.stride,) * 2,
                    padding=[(k // 2, k // 2)] * 2, use_bias=True,
                    dtype=self.dtype, name='conv')(x)
        return nn.silu(y)


class BepC3StageBlock(nn.Module):
    """Beer-mug RepC3 (reference BepC3StageBlock:415): CSP split where the
    main branch is a chain of adaptive-weight BottleRep pairs."""
    out_channels: int
    num_blocks: int = 1
    hidden_ratio: float = 0.5
    concat_all_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.hidden_ratio)
        a = ConvModule(mid, 1, act='relu', dtype=self.dtype, name='conv1')(x)
        # RepStage with BottleRep bottle block: 1 + max(num_blocks//2 - 1, 0)
        # adaptive BottleRep units (reference RepStageBlock:351 branch)
        n = max(self.num_blocks // 2, 1)
        for i in range(n):
            a = BottleRep(mid, adaptive_weight=True, dtype=self.dtype,
                          name=f'rep_{i}')(a)
        if not self.concat_all_layer:
            return ConvModule(self.out_channels, 1, act='relu',
                              dtype=self.dtype, name='conv3')(a)
        b = ConvModule(mid, 1, act='relu', dtype=self.dtype, name='conv2')(x)
        return ConvModule(self.out_channels, 1, act='relu', dtype=self.dtype,
                          name='conv3')(jnp.concatenate([a, b], -1))


class C3k(C3):
    """C3 with configurable bottleneck kernel size (reference C3k:1473)."""
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.expand_ratio)
        a = ConvModule(mid, 1, dtype=self.dtype, name='cv1')(x)
        b = ConvModule(mid, 1, dtype=self.dtype, name='cv2')(x)
        for i in range(self.num_blocks):
            a = DarknetBottleneck(
                mid, expansion=1.0,
                kernel_size=(self.kernel_size, self.kernel_size),
                add_identity=self.add_identity,
                dtype=self.dtype, name=f'm_{i}')(a)
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='cv3')(jnp.concatenate([a, b], -1))


class C3K2(nn.Module):
    """YOLOv11 C2f whose inner blocks are 2-deep C3k units (reference
    C3K2:1507)."""
    out_channels: int
    num_blocks: int = 1
    expand_ratio: float = 0.5
    add_identity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.expand_ratio)
        y = ConvModule(2 * mid, 1, dtype=self.dtype, name='main')(x)
        parts = [y[..., :mid], y[..., mid:]]
        for i in range(self.num_blocks):
            parts.append(C3k(mid, num_blocks=2,
                             add_identity=self.add_identity,
                             dtype=self.dtype, name=f'c3k_{i}')(parts[-1]))
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='final')(jnp.concatenate(parts, -1))


class PSAAttention(nn.Module):
    """Spatial self-attention with conv qkv + depthwise positional encoding
    (reference Attention:1539; the PSA building block)."""
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        qk = 2 * key_dim * self.num_heads
        qkv = ConvModule(qk + c, 1, act=None, dtype=self.dtype,
                         name='qkv')(x).reshape(b, h * w, -1)
        q = qkv[..., :qk // 2].reshape(b, h * w, self.num_heads, key_dim)
        k = qkv[..., qk // 2:qk].reshape(b, h * w, self.num_heads, key_dim)
        v = qkv[..., qk:].reshape(b, h * w, self.num_heads, head_dim)
        attn = jnp.einsum('bqhd,bkhd->bhqk', q, k) / (key_dim ** 0.5)
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, v).reshape(b, h, w, c)
        vmap = v.reshape(b, h, w, c)
        pe = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, feature_group_count=c,
                     dtype=self.dtype, name='pe')(vmap)
        return ConvModule(c, 1, act=None, dtype=self.dtype,
                          name='proj')(out + pe)


class PSABlock(nn.Module):
    """Attention + conv-FFN with shortcuts (reference PSABlock:1597)."""
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a = PSAAttention(num_heads=self.num_heads,
                         attn_ratio=self.attn_ratio, dtype=self.dtype,
                         name='attn')(x)
        x = x + a if self.shortcut else a
        f = ConvModule(c, 1, act=None, dtype=self.dtype, name='ffn2')(
            ConvModule(2 * c, 1, act=None, dtype=self.dtype, name='ffn1')(x))
        return x + f if self.shortcut else f


class C2PSA(nn.Module):
    """CSP-split stack of PSABlocks (reference C2PSA:1638)."""
    out_channels: int
    num_blocks: int = 1
    expand_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = int(self.out_channels * self.expand_ratio)
        y = ConvModule(2 * mid, 1, act=None, dtype=self.dtype,
                       name='cv1')(x)
        a, b = y[..., :mid], y[..., mid:]
        for i in range(self.num_blocks):
            b = PSABlock(num_heads=max(mid // 64, 1), dtype=self.dtype,
                         name=f'psa_{i}')(b)
        return ConvModule(self.out_channels, 1, act=None, dtype=self.dtype,
                          name='cv2')(jnp.concatenate([a, b], -1))


class MaxSigmoidAttnBlock(nn.Module):
    """Text-guided max-sigmoid gating (reference MaxSigmoidAttnBlock:1114):
    per-head dot of embedded features with guide tokens, max over tokens,
    sigmoid gate applied to the projected features."""
    out_channels: int
    embed_channels: int
    num_heads: int = 1
    with_scale: bool = False
    rep_proj: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        b, h, w, c = x.shape
        hc = self.out_channels // self.num_heads
        ec = self.embed_channels // self.num_heads
        g = nn.Dense(self.embed_channels, dtype=self.dtype,
                     name='guide_fc')(guide)             # (B, n, E)
        g = g.reshape(b, -1, self.num_heads, ec)
        embed = x if self.embed_channels == c else ConvModule(
            self.embed_channels, 1, act=None, dtype=self.dtype,
            name='embed_conv')(x)
        e = embed.reshape(b, h * w, self.num_heads, ec)
        attn = jnp.einsum('bphe,bnhe->bhpn', e, g).max(-1)   # (B, H*W? heads)
        attn = attn / (hc ** 0.5)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.num_heads,), jnp.float32)
        attn = jax.nn.sigmoid(attn + bias.astype(attn.dtype)[None, :, None])
        if self.with_scale:
            scale = self.param('scale', nn.initializers.ones,
                               (self.num_heads,), jnp.float32)
            attn = attn * scale.astype(attn.dtype)[None, :, None]
        if self.rep_proj:
            proj = RepVGGBlock(self.out_channels, dtype=self.dtype,
                               name='project_rep')(x)
        else:
            proj = ConvModule(self.out_channels, 3, act=None,
                              dtype=self.dtype, name='project_conv')(x)
        proj = proj.reshape(b, h * w, self.num_heads, hc)
        out = proj * attn.transpose(0, 2, 1)[..., None]
        return out.reshape(b, h, w, self.out_channels)


class RepConvMaxSigmoidAttnBlock(MaxSigmoidAttnBlock):
    """MaxSigmoid attention with a RepVGG projection (reference :1281)."""
    rep_proj: bool = True


class MaxSigmoidCSPLayerWithTwoConv(nn.Module):
    """C2f whose extra branch runs guided max-sigmoid attention blocks
    (reference MaxSigmoidCSPLayerWithTwoConv:1052)."""
    out_channels: int
    guide_channels: int
    embed_channels: int
    num_blocks: int = 1
    num_heads: int = 1
    depth: int = 3
    expand_ratio: float = 0.5
    add_identity: bool = True
    with_scale: bool = False
    rep_attn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        mid = int(self.out_channels * self.expand_ratio)
        y = ConvModule(2 * mid, 1, dtype=self.dtype, name='main')(x)
        parts = [y[..., :mid], y[..., mid:]]
        for i in range(self.num_blocks):
            parts.append(DarknetBottleneck(
                mid, add_identity=self.add_identity, dtype=self.dtype,
                name=f'block_{i}')(parts[-1]))
        attn = parts[-1]
        for i in range(self.depth):
            attn = MaxSigmoidAttnBlock(
                mid, embed_channels=self.embed_channels,
                num_heads=self.num_heads, with_scale=self.with_scale,
                rep_proj=self.rep_attn, dtype=self.dtype,
                name=f'attn_{i}')(attn, guide)
        parts.append(attn)
        return ConvModule(self.out_channels, 1, dtype=self.dtype,
                          name='final')(jnp.concatenate(parts, -1))


class RepConvMaxSigmoidCSPLayerWithTwoConv(MaxSigmoidCSPLayerWithTwoConv):
    """RepVGG-projection variant (reference :1360)."""
    rep_attn: bool = True


class ImagePoolingAttentionModule(nn.Module):
    """Text features attend into pooled multi-level image features
    (reference ImagePoolingAttentionModule:1199). Image maps are projected,
    max-pooled to ``pool_size**2`` patches per level, and used as K/V for a
    cross-attention whose queries are the text features; residual on text."""
    text_channels: int
    embed_channels: int
    num_heads: int = 8
    pool_size: int = 3
    with_scale: bool = False
    dtype: Any = jnp.float32

    def _adaptive_max_pool(self, x):
        # torch adaptive_max_pool2d semantics: output cell i covers rows
        # [floor(i*h/p), ceil((i+1)*h/p)) — windows overlap when h < p and
        # are never empty (a pad-to-multiple scheme leaves all-pad cells for
        # small maps, which poisons the downstream LayerNorm with -inf).
        b, h, w, c = x.shape
        p = self.pool_size
        rows = [x[:, (i * h) // p:-(-((i + 1) * h) // p)].max(1)
                for i in range(p)]
        x = jnp.stack(rows, 1)                        # (B, p, W, C)
        cols = [x[:, :, (j * w) // p:-(-((j + 1) * w) // p)].max(2)
                for j in range(p)]
        return jnp.stack(cols, 2).reshape(b, p * p, c)

    @nn.compact
    def __call__(self, text, feats):
        b = feats[0].shape[0]
        hc = self.embed_channels // self.num_heads
        patches = []
        for i, f in enumerate(feats):
            f = ConvModule(self.embed_channels, 1, act=None,
                           dtype=self.dtype, name=f'proj_{i}')(f)
            patches.append(self._adaptive_max_pool(f))
        img = jnp.concatenate(patches, 1)            # (B, L*p^2, E)
        q = nn.Dense(self.embed_channels, dtype=self.dtype, name='query')(
            nn.LayerNorm(dtype=self.dtype, name='q_norm')(text))
        k = nn.Dense(self.embed_channels, dtype=self.dtype, name='key')(
            nn.LayerNorm(dtype=self.dtype, name='k_norm')(img))
        v = nn.Dense(self.embed_channels, dtype=self.dtype, name='value')(
            nn.LayerNorm(dtype=self.dtype, name='v_norm')(img))
        q = q.reshape(b, -1, self.num_heads, hc)
        k = k.reshape(b, -1, self.num_heads, hc)
        v = v.reshape(b, -1, self.num_heads, hc)
        attn = jnp.einsum('bqhd,bkhd->bhqk', q, k) / (hc ** 0.5)
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, v)
        out = nn.Dense(self.text_channels, dtype=self.dtype, name='proj')(
            out.reshape(b, -1, self.embed_channels))
        if self.with_scale:
            scale = self.param('scale', nn.initializers.zeros, (1,),
                               jnp.float32).astype(out.dtype)
            out = out * scale
        return text + out


class AFF_CSP(nn.Module):
    """CSP-split attentional fusion (reference AFF_CSP:1719): the first
    half of x fuses with y through an MS-CAM gate (2x-scaled convex mix),
    the second half rides through; 1x1 projection to half channels."""
    reduction: int = 4
    iterative: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        half = c // 2
        x0, x1 = x[..., :half], x[..., half:]
        aff = AFF(reduction=max(self.reduction // 2, 1),
                  iterative=self.iterative, dtype=self.dtype, name='aff')
        fused = 2.0 * aff(x0, y)
        return ConvModule(half, 1, dtype=self.dtype, name='final')(
            jnp.concatenate([fused, x1], -1))


class iAFF_CSP(AFF_CSP):
    iterative: bool = True


class SpatialAttention(nn.Module):
    """Spatial gate of CBAM as a standalone block (reference
    SpatialAttention:1927)."""
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        s = jnp.concatenate([x.mean(-1, keepdims=True),
                             x.max(-1, keepdims=True)], -1)
        g = jax.nn.sigmoid(nn.Conv(1, (k, k), padding=[(k // 2, k // 2)] * 2,
                                   use_bias=False, dtype=self.dtype,
                                   name='conv')(s))
        return x * g


class C2fCBAM(nn.Module):
    """CSPLayerWithTwoConv followed by CBAM (reference C2fCBAM:1955)."""
    out_channels: int
    num_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = CSPLayerWithTwoConv(self.out_channels,
                                num_blocks=self.num_blocks,
                                dtype=self.dtype, name='c2f')(x)
        return CBAM(dtype=self.dtype, name='cbam')(y)


class ESE(nn.Module):
    """Effective squeeze-excite with trailing 1x1 ConvModule (reference
    ESE:1964; ESEAttn above is the bare gate)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = jax.nn.sigmoid(nn.Conv(
            c, (1, 1), kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name='fc')(x.mean((1, 2), keepdims=True)))
        return ConvModule(c, 1, dtype=self.dtype, name='conv')(x * g)


class LSKAttention(nn.Module):
    """proj -> GELU -> LSK spatial gating -> proj, residual (reference
    LSKAttention:2023)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.gelu(nn.Conv(c, (1, 1), dtype=self.dtype, name='proj_1')(x))
        y = LSKBlock(dtype=self.dtype, name='lsk')(y)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name='proj_2')(y)


class ConvMlp(nn.Module):
    """1x1 -> depthwise 3x3 -> GELU -> 1x1 conv MLP (reference Mlp:2050 +
    DWConv:2041)."""
    hidden_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hid = int(c * self.hidden_ratio)
        y = nn.Conv(hid, (1, 1), dtype=self.dtype, name='fc1')(x)
        y = nn.Conv(hid, (3, 3), padding=[(1, 1)] * 2,
                    feature_group_count=hid, dtype=self.dtype,
                    name='dwconv')(y)
        y = nn.gelu(y)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name='fc2')(y)


class LSKA(nn.Module):
    """Pre-norm LSK attention + conv-MLP transformer block with layer scale
    (reference LSKA:2071)."""
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ls1 = self.param('layer_scale_1',
                         nn.initializers.constant(1e-2), (c,), jnp.float32)
        ls2 = self.param('layer_scale_2',
                         nn.initializers.constant(1e-2), (c,), jnp.float32)
        a = LSKAttention(dtype=self.dtype, name='attn')(
            nn.LayerNorm(dtype=self.dtype, name='norm1')(x))
        x = x + ls1.astype(x.dtype) * a
        m = ConvMlp(hidden_ratio=self.mlp_ratio, dtype=self.dtype,
                    name='mlp')(nn.LayerNorm(dtype=self.dtype,
                                             name='norm2')(x))
        return x + ls2.astype(x.dtype) * m


class ESELSKA(nn.Module):
    """ESE then LSKA (reference ESELSKA:2094)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return LSKA(dtype=self.dtype, name='lska')(
            ESE(dtype=self.dtype, name='ese')(x))


class ASFFDown(nn.Module):
    """Two-input spatial-attention fusion (reference ASFFDown:2105):
    project both, derive a 7x7 spatial gate from the concat, convex-mix."""
    out_channels: int
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        x = ConvModule(self.out_channels, 1, dtype=self.dtype, name='conv1')(x)
        y = ConvModule(self.out_channels, 1, dtype=self.dtype, name='conv2')(y)
        z = ConvModule(self.out_channels, 1, dtype=self.dtype,
                       name='proj1')(jnp.concatenate([x, y], -1))
        k = self.kernel_size
        s = jnp.concatenate([z.mean(-1, keepdims=True),
                             z.max(-1, keepdims=True)], -1)
        g = jax.nn.sigmoid(nn.Conv(1, (k, k), padding=[(k // 2, k // 2)] * 2,
                                   use_bias=False, dtype=self.dtype,
                                   name='saconv')(s))
        return g * x + (1.0 - g) * y


class DCAttention(nn.Module):
    """Deformable CROSS attention (reference DCAttention:2258): queries from
    x predict offsets; keys/values are bilinearly sampled from y at the
    deformed reference points of a stride-decimated grid."""
    num_heads: int = 4
    n_groups: int = 4
    stride: int = 4
    offset_range_factor: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        from ..ops.feature_align import bilinear_sample
        b, h, w, c = x.shape
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name='proj_q')(x)
        rh, rw = h // self.stride, w // self.stride
        ry, rx = jnp.meshgrid((jnp.arange(rh) + 0.5) * self.stride,
                              (jnp.arange(rw) + 0.5) * self.stride,
                              indexing='ij')
        qp = nn.avg_pool(q, (self.stride,) * 2, strides=(self.stride,) * 2)
        off = nn.Conv(2, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                      name='conv_offset')(nn.gelu(qp))
        off = jnp.tanh(off) * self.offset_range_factor * self.stride
        py = (ry[None] + off[..., 0]).reshape(b, -1)
        px = (rx[None] + off[..., 1]).reshape(b, -1)
        sampled = bilinear_sample(y, px, py)            # (B, rh*rw, C)
        k = nn.Dense(c, dtype=self.dtype, name='proj_k')(sampled)
        v = nn.Dense(c, dtype=self.dtype, name='proj_v')(sampled)
        hd = c // self.num_heads
        qf = q.reshape(b, h * w, self.num_heads, hd)
        kf = k.reshape(b, -1, self.num_heads, hd)
        vf = v.reshape(b, -1, self.num_heads, hd)
        attn = jnp.einsum('bqhd,bkhd->bhqk', qf, kf) / (hd ** 0.5)
        attn = jax.nn.softmax(attn, -1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, vf).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name='proj_out')(out)
        pos = jnp.stack([px, py], -1)
        return out, pos


class DASFF(nn.Module):
    """Fuse two inputs then add deformable self-attention (reference
    DASFF:2166; reuses the DAT block from backbones/jy_modules)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        from .backbones.jy_modules import DAttentionBaseline
        x = ConvModule(self.out_channels, 1, dtype=self.dtype, name='conv1')(x)
        y = ConvModule(self.out_channels, 1, dtype=self.dtype, name='conv2')(y)
        z = ConvModule(self.out_channels, 1, dtype=self.dtype,
                       name='proj1')(jnp.concatenate([x, y], -1))
        return z + DAttentionBaseline(
            dim=self.out_channels, num_heads=4, n_groups=4, stride=4,
            dtype=self.dtype, name='deformable_attn')(z)


class DCASFF(nn.Module):
    """Deformable cross-attention fusion with learned per-channel gates
    (reference DCASFF:2210)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        x = ConvModule(self.out_channels, 1, dtype=self.dtype, name='conv1')(x)
        y = ConvModule(self.out_channels, 1, dtype=self.dtype, name='conv2')(y)
        out, _ = DCAttention(dtype=self.dtype, name='deformable_cattn')(x, y)
        alpha = self.param('alpha', nn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
        beta = self.param('beta', nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        return (jax.nn.sigmoid(alpha).astype(out.dtype) * out +
                jax.nn.sigmoid(beta).astype(x.dtype) * x)


# Reference-name surface also provided by models/blocks.py / jy_modules:
#   DarknetBottleneck / MMDarknetBottleneck  -> blocks.DarknetBottleneck
#   CSPLayerWithTwoConv                      -> blocks.CSPLayerWithTwoConv
#   SPPFBottleneck                           -> blocks.SPPFBottleneck
#   ChannelAttention                         -> blocks.ChannelAttention
#   DAttention                               -> jy_modules.DAttentionBaseline
#   LayerNormProxy                           -> flax nn.LayerNorm (NHWC)
#   SiLU                                     -> flax nn.silu
#   LSKModule                                -> LSKBlock (above)
#   CSPSPPFModule                            -> CSPSPPFBottleneck (above)
from .blocks import (CSPLayerWithTwoConv, SPPFBottleneck,  # noqa: E402,F401
                     ChannelAttention)

LSKModule = LSKBlock
CSPSPPFModule = CSPSPPFBottleneck
MMDarknetBottleneck = DarknetBottleneck
