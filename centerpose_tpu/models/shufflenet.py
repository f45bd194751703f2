"""ShuffleNetV2 backbone with upsampling to stride 4.

Behavioral spec: reference lib/models/backbones/shufflenetv2.py
(SURVEY.md §2 #12): 1.0x trunk — stem conv s2 + maxpool s2; three stages of
channel-split units (s1: split half/half, process one half, concat+shuffle;
s2: both halves strided, doubling channels); then the standard 3-stage
deconv path to stride 4 and the shared heads.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.models.common import ConvBN, HeadStack
from centerpose_tpu.models.mobilenet import _PoseUpsample


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class ShuffleUnit(nn.Module):
    features: int  # total output channels
    stride: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        half = self.features // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            y = ConvBN(half, 1, 1, **common)(x2, train)
            y = ConvBN(half, 3, 1, groups=half, relu=False, **common)(y, train)
            y = ConvBN(half, 1, 1, **common)(y, train)
            out = jnp.concatenate([x1, y], axis=-1)
        else:
            # branch 1: depthwise s2 + 1x1
            b1 = ConvBN(
                x.shape[-1], 3, 2, groups=x.shape[-1], relu=False, **common
            )(x, train)
            b1 = ConvBN(half, 1, 1, **common)(b1, train)
            # branch 2: 1x1 + depthwise s2 + 1x1
            b2 = ConvBN(half, 1, 1, **common)(x, train)
            b2 = ConvBN(half, 3, 2, groups=half, relu=False, **common)(b2, train)
            b2 = ConvBN(half, 1, 1, **common)(b2, train)
            out = jnp.concatenate([b1, b2], axis=-1)
        return channel_shuffle(out, 2)


class PoseShuffleNetV2(nn.Module):
    heads: Dict[str, int] = None
    head_conv: int = 64
    stage_channels: tuple = (116, 232, 464)
    stage_repeats: tuple = (4, 8, 4)
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ConvBN(24, 3, 2, **common)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for c, n in zip(self.stage_channels, self.stage_repeats):
            x = ShuffleUnit(c, 2, **common)(x, train)
            for _ in range(n - 1):
                x = ShuffleUnit(c, 1, **common)(x, train)
        x = ConvBN(1024, 1, 1, **common)(x, train)
        x = _PoseUpsample(**common)(x, train)
        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(x)
