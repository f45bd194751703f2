"""ResNet backbones with deconv upsampling to stride 4 (plain conv, no DCN).

Behavioral spec: reference lib/models/backbones/resnet.py (SURVEY.md §2 #9) —
ResNet-18/34/50/101/152 trunk, then three (ConvTranspose k4 s2 + BN + ReLU)
stages carrying the stride-32 trunk output back to stride 4 with 256 filters
per stage, then the shared HeadStack.

Design notes (TPU-first):
- NHWC + HWIO everywhere; the 7x7 stem, residual 3x3s, and 1x1 bottlenecks
  all tile directly onto the MXU.
- No max-pool indices or in-place ops; the stem max-pool is a reduce_window.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.models.common import ConvBN, DeconvBN, HeadStack


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(
            self.features, 3, self.strides, bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(x, train)
        y = ConvBN(
            self.features, 3, 1, relu=False, bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(y, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = ConvBN(
                self.features, 1, self.strides, relu=False,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
            )(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.features * 4
        residual = x
        y = ConvBN(self.features, 1, 1, bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, self.strides, bn_axis_name=self.bn_axis_name, dtype=self.dtype)(y, train)
        y = ConvBN(out_ch, 1, 1, relu=False, bn_axis_name=self.bn_axis_name, dtype=self.dtype)(y, train)
        if self.strides != 1 or x.shape[-1] != out_ch:
            residual = ConvBN(
                out_ch, 1, self.strides, relu=False,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
            )(x, train)
        return nn.relu(y + residual)


_RESNET_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class PoseResNet(nn.Module):
    """ResNet trunk + 3-stage deconv + heads -> dict of stride-4 head maps."""

    num_layers: int = 18
    heads: Dict[str, int] = None
    head_conv: int = 64
    deconv_filters: Tuple[int, ...] = (256, 256, 256)
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        block, layers = _RESNET_SPECS[self.num_layers]

        # Stem: 7x7 s2 conv + BN + ReLU + 3x3 s2 max-pool -> stride 4.
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, kernel_init=nn.initializers.he_normal(),
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        for stage, (w, n) in enumerate(zip(widths, layers)):
            for i in range(n):
                strides = 2 if (stage > 0 and i == 0) else 1
                x = block(
                    w, strides, bn_axis_name=self.bn_axis_name, dtype=self.dtype
                )(x, train)

        # Deconv path: stride 32 -> 4.
        for f in self.deconv_filters:
            x = DeconvBN(f, bn_axis_name=self.bn_axis_name, dtype=self.dtype)(x, train)

        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(x)
