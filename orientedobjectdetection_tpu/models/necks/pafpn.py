"""YOLOv8 PAFPN neck (reference ``necks/pafpn.py:192-`` on the
``BaseYOLONeck`` scaffold ``base_yolo_neck.py:19-269``).

Top-down: upsample + concat + C2f; bottom-up: stride-2 conv + concat + C2f;
no reduce/out layers (identity) — the YOLOv8 layout.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS
from ..blocks import (ConvModule, CSPLayerWithTwoConv, make_divisible,
                      make_round)


def upsample2x(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


@NECKS.register_module()
class YOLOv8PAFPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024)
    out_channels: Union[Sequence[int], int] = (256, 512, 1024)
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    num_csp_blocks: int = 3
    freeze_all: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.in_channels)
        wf, df = self.widen_factor, self.deepen_factor
        out_ch = self.out_channels
        if isinstance(out_ch, int):
            out_ch = [out_ch] * len(self.in_channels)
        n_blocks = make_round(self.num_csp_blocks, df)
        L = len(feats)

        # top-down
        inner = [feats[-1]]
        for idx in range(L - 1, 0, -1):
            high = inner[0]
            low = feats[idx - 1]
            up = upsample2x(high)
            cat = jnp.concatenate([up, low], axis=-1)
            td = CSPLayerWithTwoConv(
                make_divisible(out_ch[idx - 1], wf), num_blocks=n_blocks,
                add_identity=False, dtype=self.dtype,
                name=f'top_down_{idx - 1}')(cat)
            inner.insert(0, td)

        # bottom-up
        outs = [inner[0]]
        for idx in range(L - 1):
            low = outs[-1]
            down = ConvModule(low.shape[-1], 3, stride=2, dtype=self.dtype,
                              name=f'downsample_{idx}')(low)
            cat = jnp.concatenate([down, inner[idx + 1]], axis=-1)
            bu = CSPLayerWithTwoConv(
                make_divisible(out_ch[idx + 1], wf), num_blocks=n_blocks,
                add_identity=False, dtype=self.dtype,
                name=f'bottom_up_{idx}')(cat)
            outs.append(bu)
        return tuple(outs)


@NECKS.register_module()
class YOLOv8PAFPN_E(YOLOv8PAFPN):
    """PAFPN with extra stride-2 output level(s) appended (reference
    ``necks/pafpn.py`` ``YOLOv8PAFPN_E``; jy's expanded-neck prototype).

    ``expanded_down_feat_channels`` sets the per-extra-level channel count
    (widen_factor applied, like the regular levels); defaults to the last
    level's width."""
    num_extra_levels: int = 1
    expanded_down_feat_channels: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, feats):
        outs = list(YOLOv8PAFPN.__call__(self, feats))
        extra_ch = self.expanded_down_feat_channels
        n_extra = len(extra_ch) if extra_ch else self.num_extra_levels
        for i in range(n_extra):
            ch = make_divisible(extra_ch[i], self.widen_factor) \
                if extra_ch else outs[-1].shape[-1]
            outs.append(ConvModule(ch, 3, stride=2,
                                   dtype=self.dtype, name=f'extra_{i}')(
                                       outs[-1]))
        return tuple(outs)


@NECKS.register_module()
class YOLOv6RepPAFPN(nn.Module):
    """YOLOv6 Rep-PAFPN (reference ``necks/pafpn.py:28-`` YOLOv6RepPAFPN):
    1x1 reduce + upsample + concat + RepStage top-down; stride-2 conv +
    concat + RepStage bottom-up."""
    in_channels: Sequence[int] = (256, 512, 1024)
    out_channels: Union[Sequence[int], int] = (128, 256, 512)
    deepen_factor: float = 1.0
    widen_factor: float = 1.0
    num_csp_blocks: int = 12
    freeze_all: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from ..yolo_blocks import RepStageBlock
        wf, df = self.widen_factor, self.deepen_factor
        out_ch = self.out_channels
        if isinstance(out_ch, int):
            out_ch = [out_ch] * len(self.in_channels)
        n_blocks = make_round(self.num_csp_blocks, df)
        L = len(feats)

        inner = [feats[-1]]
        reduces = []
        for idx in range(L - 1, 0, -1):
            red = ConvModule(make_divisible(out_ch[idx - 1], wf), 1,
                             dtype=self.dtype,
                             name=f'reduce_{idx - 1}')(inner[0])
            reduces.insert(0, red)
            up = upsample2x(red)
            cat = jnp.concatenate([up, feats[idx - 1]], axis=-1)
            td = RepStageBlock(make_divisible(out_ch[idx - 1], wf),
                               num_blocks=n_blocks, dtype=self.dtype,
                               name=f'top_down_{idx - 1}')(cat)
            inner.insert(0, td)

        outs = [inner[0]]
        for idx in range(L - 1):
            down = ConvModule(outs[-1].shape[-1], 3, stride=2,
                              dtype=self.dtype,
                              name=f'downsample_{idx}')(outs[-1])
            ref = reduces[idx] if idx < len(reduces) else inner[idx + 1]
            cat = jnp.concatenate([down, ref], axis=-1)
            bu = RepStageBlock(make_divisible(out_ch[idx + 1], wf),
                               num_blocks=n_blocks, dtype=self.dtype,
                               name=f'bottom_up_{idx}')(cat)
            outs.append(bu)
        return tuple(outs)
