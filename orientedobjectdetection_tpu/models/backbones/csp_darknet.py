"""YOLOv8 CSPDarknet backbone (reference ``backbones/csp_darknet.py:21-176``):
single-conv stem, stages = stride-2 conv + C2f, SPPF on the last stage."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..blocks import ConvModule, CSPLayerWithTwoConv, SPPFBottleneck

P5_DARKNET = [
    [64, 128, 3, True],
    [128, 256, 6, True],
    [256, 512, 6, True],
    [512, 1024, 3, True],
]


@BACKBONES.register_module()
class YOLOv8CSPDarknet(nn.Module):
    arch: str = 'P5'
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    last_stage_out_channels: int = 1024
    out_indices: Tuple[int, ...] = (2, 3, 4)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        arch = [list(a) for a in P5_DARKNET]
        arch[-1][1] = self.last_stage_out_channels
        wf, df = self.widen_factor, self.deepen_factor
        x = ConvModule(int(arch[0][0] * wf), 3, stride=2, dtype=self.dtype,
                       name='stem')(x)
        outs = []
        if 0 in self.out_indices:
            outs.append(x)
        for i, (cin, cout, n_blocks, add_id) in enumerate(arch):
            cout = int(cout * wf)
            n = max(round(n_blocks * df), 1)
            x = ConvModule(cout, 3, stride=2, dtype=self.dtype,
                           name=f'stage{i + 1}_conv')(x)
            x = CSPLayerWithTwoConv(cout, num_blocks=n, add_identity=add_id,
                                    dtype=self.dtype,
                                    name=f'stage{i + 1}_csp')(x)
            if i == len(arch) - 1:
                x = SPPFBottleneck(cout, 5, dtype=self.dtype,
                                   name=f'stage{i + 1}_sppf')(x)
            if (i + 1) in self.out_indices:
                outs.append(x)
        return tuple(outs)
