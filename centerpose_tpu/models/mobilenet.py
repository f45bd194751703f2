"""MobileNetV2 / V3 backbones with light deconv upsampling to stride 4.

Behavioral spec: reference lib/models/backbones/mobilenet.py /
mobilenetv3.py (SURVEY.md §2 #11): inverted-residual trunk (V3 adds
squeeze-excite + h-swish), then three upsample stages back to stride 4,
then the shared heads.  Deconv filters (256, 128, 64) — light, matching the
mobile deployment intent (BASELINE config #5: batched video-stream
inference).

TPU notes: depthwise convs use ``feature_group_count``; SE pooling is a
spatial mean (no adaptive pooling needed at fixed shapes).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.models.common import ConvBN, DeconvBN, HeadStack


def h_swish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def h_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class SqueezeExcite(nn.Module):
    reduce: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(8, c // self.reduce), (1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype)(s)
        return x * h_sigmoid(s)


class InvertedResidual(nn.Module):
    """MobileNet inverted residual: expand 1x1 -> depthwise kxk -> project 1x1."""

    features: int
    expand: int  # hidden dim
    kernel: int = 3
    stride: int = 1
    use_se: bool = False
    use_hs: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = h_swish if self.use_hs else nn.relu
        inp = x.shape[-1]
        y = x
        if self.expand != inp:
            y = ConvBN(
                self.expand, 1, 1, relu=False,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
            )(y, train)
            y = act(y)
        # depthwise
        y = ConvBN(
            self.expand, self.kernel, self.stride, groups=self.expand, relu=False,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(y, train)
        if self.use_se:
            y = SqueezeExcite(dtype=self.dtype)(y)
        y = act(y)
        y = ConvBN(
            self.features, 1, 1, relu=False,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(y, train)
        if self.stride == 1 and inp == self.features:
            y = y + x
        return y


class _PoseUpsample(nn.Module):
    """Three DeconvBN stages: stride 32 -> 4 (filters 256/128/64)."""

    filters: Tuple[int, ...] = (256, 128, 64)
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.filters:
            x = DeconvBN(f, bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)
        return x


# (expand_ratio, out_ch, repeats, stride)
_V2_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class PoseMobileNetV2(nn.Module):
    heads: Dict[str, int] = None
    head_conv: int = 64
    width_mult: float = 1.0
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        c = int(32 * self.width_mult)
        x = ConvBN(c, 3, 2, **common)(x, train)
        for t, co, n, s in _V2_CFG:
            co = int(co * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    co, expand=t * x.shape[-1], stride=s if i == 0 else 1, **common
                )(x, train)
        x = _PoseUpsample(**common)(x, train)
        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(x)


# (kernel, expand_dim, out_ch, SE, h-swish, stride) — MobileNetV3-Large
_V3_CFG = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]


class PoseMobileNetV3(nn.Module):
    heads: Dict[str, int] = None
    head_conv: int = 64
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ConvBN(16, 3, 2, relu=False, **common)(x, train)
        x = h_swish(x)
        for k, exp, co, se, hs, s in _V3_CFG:
            x = InvertedResidual(
                co, expand=exp, kernel=k, stride=s, use_se=se, use_hs=hs, **common
            )(x, train)
        x = _PoseUpsample(**common)(x, train)
        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(x)
