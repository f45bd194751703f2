"""EfficientNet-B0 backbone with BiFPN-style fusion to stride 4.

Behavioral spec: reference lib/models/backbones/efficientdet.py
(SURVEY.md §2 #15): EfficientNet trunk (MBConv + SE + SiLU) with a light
bidirectional-FPN-flavored fusion bringing C3/C4/C5 features back to the
stride-4 grid for the shared heads.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.models.common import ConvBN, HeadStack, upsample_nearest
from centerpose_tpu.models.mobilenet import SqueezeExcite


class MBConv(nn.Module):
    features: int
    expand_ratio: int
    kernel: int = 3
    stride: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        inp = x.shape[-1]
        hidden = inp * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = ConvBN(hidden, 1, 1, relu=False, **common)(y, train)
            y = nn.silu(y)
        y = ConvBN(
            hidden, self.kernel, self.stride, groups=hidden, relu=False, **common
        )(y, train)
        y = nn.silu(y)
        y = SqueezeExcite(reduce=4 * self.expand_ratio, dtype=self.dtype)(y)
        y = ConvBN(self.features, 1, 1, relu=False, **common)(y, train)
        if self.stride == 1 and inp == self.features:
            y = y + x
        return y


# (expand, out_ch, repeats, stride, kernel) — B0
_B0_CFG = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


class BiFPNLayer(nn.Module):
    """One bidirectional FPN pass with fast-normalized fusion
    (EfficientDet-style: top-down path, then bottom-up path, each fused
    edge carrying a learned softplus weight normalized across inputs).

    Input/output: list of per-level features (fine -> coarse), all fpn_ch.
    """

    fpn_ch: int
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def _fuse(self, name, inputs, train):
        w = self.param(name, nn.initializers.ones, (len(inputs),), jnp.float32)
        w = nn.softplus(w)
        w = w / (jnp.sum(w) + 1e-4)
        y = sum(wi * t for wi, t in zip(w, inputs))
        y = nn.silu(y)
        return ConvBN(
            self.fpn_ch, 3, 1, relu=False, name=f"{name}_conv",
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(y, train)

    @nn.compact
    def __call__(self, ps: List[jnp.ndarray], train: bool = False):
        n = len(ps)
        # top-down: coarse -> fine
        td = [None] * n
        td[n - 1] = ps[n - 1]
        for i in range(n - 2, -1, -1):
            td[i] = self._fuse(
                f"td{i}", [ps[i], upsample_nearest(td[i + 1], 2)], train
            )
        # bottom-up: fine -> coarse (stride-2 max-pool downsample)
        out = [None] * n
        out[0] = td[0]
        for i in range(1, n):
            down = nn.max_pool(out[i - 1], (3, 3), strides=(2, 2), padding="SAME")
            ins = [ps[i], td[i], down] if i < n - 1 else [ps[i], down]
            out[i] = self._fuse(f"bu{i}", ins, train)
        return out


class PoseEfficientNet(nn.Module):
    heads: Dict[str, int] = None
    head_conv: int = 64
    fpn_ch: int = 64
    fpn_repeats: int = 2
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        x = ConvBN(32, 3, 2, relu=False, **common)(x, train)
        x = nn.silu(x)
        feats: List[jnp.ndarray] = []  # C2 (s4), C3 (s8), C4 (s16), C5 (s32)
        for t, c, n, s, k in _B0_CFG:
            if s == 2:
                feats.append(x)
            for i in range(n):
                x = MBConv(c, t, k, s if i == 0 else 1, **common)(x, train)
        feats.append(x)
        feats = feats[1:]  # drop stride-2; keep s4, s8, s16, s32

        # project each level to fpn_ch, then run repeated BiFPN passes
        # (reference efficientdet fusion, SURVEY.md §2 #15); the heads read
        # the stride-4 level.
        ps = [
            ConvBN(self.fpn_ch, 1, 1, name=f"lat{i}", **common)(f, train)
            for i, f in enumerate(feats)
        ]
        for r in range(self.fpn_repeats):
            ps = BiFPNLayer(
                self.fpn_ch, name=f"bifpn{r}", **common
            )(ps, train)
        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(ps[0])
