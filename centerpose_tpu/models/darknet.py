"""Darknet-53 backbone with upsampling to stride 4.

Behavioral spec: reference lib/models/backbones/darknet.py (SURVEY.md §2
#14): Darknet-53 trunk — stem 3x3/32 then five stages of (strided 3x3
downsample, N residual units of 1x1-half + 3x3-full) at channels
64..1024 with repeats (1, 2, 8, 8, 4) — followed by the standard deconv
path and shared heads.  LeakyReLU(0.1) activations per Darknet convention.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.models.common import HeadStack
from centerpose_tpu.models.mobilenet import _PoseUpsample


class DarkConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x)
        return nn.leaky_relu(x, 0.1)


class DarkResidual(nn.Module):
    features: int  # full channels; bottleneck = features // 2
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        y = DarkConv(self.features // 2, 1, 1, **common)(x, train)
        y = DarkConv(self.features, 3, 1, **common)(y, train)
        return x + y


class PoseDarknet(nn.Module):
    heads: Dict[str, int] = None
    head_conv: int = 64
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = DarkConv(32, 3, 1, **common)(x, train)
        for ch, n in ((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)):
            x = DarkConv(ch, 3, 2, **common)(x, train)
            for _ in range(n):
                x = DarkResidual(ch, **common)(x, train)
        x = _PoseUpsample(**common)(x, train)
        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(x)
