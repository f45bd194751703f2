"""HarDNet (Harmonic DenseNet) backbone with upsampling to stride 4.

Behavioral spec: reference lib/models/backbones/hardnet.py (SURVEY.md §2
#13): HarDNet-68-style trunk — harmonic dense blocks where layer i draws
skip inputs from layers i - 2^k (k: 2^k | i), growth-rate multiplier 1.7,
block output = concat of odd-indexed + final layers — followed by the
standard 3-stage deconv path and shared heads.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.models.common import ConvBN, HeadStack
from centerpose_tpu.models.mobilenet import _PoseUpsample


def _hard_link(layer: int, base_ch: int, gr: int, grmul: float):
    """(out_channels, links) for a harmonic dense layer (public HarDNet rule)."""
    if layer == 0:
        return base_ch, []
    out_ch = float(gr)
    links = []
    for i in range(10):
        dv = 2 ** i
        if layer % dv == 0:
            links.append(layer - dv)
            if i > 0:
                out_ch *= grmul
    out_ch = int(int(out_ch + 1) / 2) * 2
    return out_ch, sorted(links)


class HarDBlock(nn.Module):
    growth: int
    n_layers: int
    grmul: float = 1.7
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        layers = [x]
        for i in range(1, self.n_layers + 1):
            out_ch, links = _hard_link(i, x.shape[-1], self.growth, self.grmul)
            inp = jnp.concatenate([layers[l] for l in links], axis=-1)
            layers.append(ConvBN(out_ch, 3, 1, name=f"l{i}", **common)(inp, train))
        # output: concat of final layer + odd-indexed layers (+ layer 0)
        keep = [
            layers[i]
            for i in range(self.n_layers + 1)
            if i == self.n_layers or i % 2 == 1 or i == 0
        ]
        return jnp.concatenate(keep, axis=-1)


class PoseHardNet(nn.Module):
    heads: Dict[str, int] = None
    head_conv: int = 64
    # HarDNet-68 schedule
    ch_list: Tuple[int, ...] = (128, 256, 320, 640)
    growth: Tuple[int, ...] = (14, 16, 20, 40)
    n_layers: Tuple[int, ...] = (8, 16, 16, 16)
    down: Tuple[int, ...] = (1, 1, 1, 0)
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ConvBN(32, 3, 2, **common)(x, train)
        x = ConvBN(64, 3, 1, **common)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, (c, g, n, d) in enumerate(
            zip(self.ch_list, self.growth, self.n_layers, self.down)
        ):
            x = HarDBlock(g, n, name=f"block{i}", **common)(x, train)
            x = ConvBN(c, 1, 1, name=f"trans{i}", **common)(x, train)
            if d:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _PoseUpsample(**common)(x, train)
        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(x)
