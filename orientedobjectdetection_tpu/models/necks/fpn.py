"""Feature Pyramid Network (flax.linen, NHWC).

mmdet-config-compatible FPN used by every reference detector config
(e.g. ``configs/rotated_retinanet/rotated_retinanet_obb_r50_fpn_1x_dota_le90.py``
neck block: in_channels=[256,512,1024,2048], out 256, start_level=1,
add_extra_convs='on_input', num_outs=5).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS


def upsample_nearest_2x(x, target_hw):
    """Nearest-neighbor upsample to ``target_hw`` (handles odd sizes the way
    torch's interpolate(size=...) does for 2x FPN pyramids)."""
    b, h, w, c = x.shape
    th, tw = target_hw
    # nearest: index mapping floor(i * h / th)
    rows = (jnp.arange(th) * h) // th
    cols = (jnp.arange(tw) * w) // tw
    return x[:, rows][:, :, cols]


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = False
    upsample_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level in (-1,
                                                          None) \
            else self.end_level + 1
        used = list(inputs[self.start_level:end])

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f'lateral_{i}')(x)
            for i, x in enumerate(used)
        ]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[1:3])

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f'fpn_{i}')(laterals[i])
            for i in range(len(laterals))
        ]

        # extra levels
        extra = self.num_outs - len(outs)
        if extra > 0:
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                mode = self.add_extra_convs
                if mode is True:
                    mode = 'on_input'
                if mode == 'on_input':
                    src = used[-1]
                elif mode == 'on_lateral':
                    src = laterals[-1]
                else:  # on_output
                    src = outs[-1]
                for k in range(extra):
                    if k > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                  padding=[(1, 1)] * 2, dtype=self.dtype,
                                  name=f'extra_{k}')(src)
                    outs.append(src)
        return tuple(outs)
