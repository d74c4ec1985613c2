"""CSPNeXt backbone (RTMDet-style), flax/NHWC.

Rebuilds reference ``backbones/cspnext.py:14-212``: 3-conv stem, four P5
stages of [stride-2 conv, optional SPPF, CSPLayer(+ChannelAttention)], with
deepen/widen factors and a configurable last-stage width. BatchNorm runs in
frozen (pretrained warm-start) mode, matching how the reference's prototypes
are trained (COCO-pretrained CSPNeXt, ``configs/jy/prototype4.py:31``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..blocks import (ChannelAttention, ConvModule, CSPLayer, SPPFBottleneck)

# in_channels, out_channels, num_blocks, add_identity, use_spp
P5_ARCH = [
    [64, 128, 3, True, False],
    [128, 256, 6, True, False],
    [256, 512, 6, True, False],
    [512, 1024, 3, False, True],
]


@BACKBONES.register_module()
class CSPNeXt(nn.Module):
    arch: str = 'P5'
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    last_stage_out_channels: int = 1024
    out_indices: Tuple[int, ...] = (2, 3, 4)
    frozen_stages: int = -1
    use_depthwise: bool = False
    expand_ratio: float = 0.5
    channel_attention: bool = True
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    norm_eval: bool = False
    stage_aux: Optional[int] = None
    reverse: bool = True
    cspnext_block: bool = True
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        arch = [list(s) for s in P5_ARCH]
        arch[-1][1] = self.last_stage_out_channels
        wf, df = self.widen_factor, self.deepen_factor

        # stem: 3 convs at stride 2,1,1 (reference cspnext.py:120-147)
        stem_out = int(arch[0][0] * wf)
        x = ConvModule(stem_out // 2, 3, stride=2, dtype=self.dtype,
                       name='stem_0')(x)
        x = ConvModule(stem_out // 2, 3, stride=1, dtype=self.dtype,
                       name='stem_1')(x)
        x = ConvModule(stem_out, 3, stride=1, dtype=self.dtype,
                       name='stem_2')(x)

        outs = []
        if 0 in self.out_indices:
            outs.append(x)
        for i, (cin, cout, n_blocks, add_id, use_spp) in enumerate(arch):
            cout = int(cout * wf)
            n = max(round(n_blocks * df), 1)
            x = ConvModule(cout, 3, stride=2, dtype=self.dtype,
                           name=f'stage{i + 1}_conv')(x)
            if use_spp:
                x = SPPFBottleneck(cout, 5, dtype=self.dtype,
                                   name=f'stage{i + 1}_spp')(x)
            x = CSPLayer(cout, expand_ratio=self.expand_ratio, num_blocks=n,
                         add_identity=add_id,
                         use_cspnext_block=self.cspnext_block,
                         channel_attention=self.channel_attention,
                         dtype=self.dtype, name=f'stage{i + 1}_csp')(x)
            if self.stage_aux is not None:
                num = len(arch)
                use_aux = i < self.stage_aux if self.reverse \
                    else i >= num - self.stage_aux
                if use_aux:
                    from .jy_modules import MSARCModule
                    x = MSARCModule(cout, dtype=self.dtype,
                                    name=f'stage{i + 1}_aux')(x)
            if (i + 1) in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class CSPNeXtLarge(CSPNeXt):
    """prototype3's backbone alias (reference configs/jy/prototype3.py:
    CSPNeXt with stage_aux MSARC attention stages)."""
    pass
