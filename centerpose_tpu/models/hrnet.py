"""HRNet-W32/W48 backbone (high-resolution parallel branches).

Behavioral spec: reference lib/models/backbones/hrnet.py (SURVEY.md §2 #10):
stride-4 stem (two 3x3 s2 convs), stage1 = 4 bottlenecks, then 3 multi-
resolution stages (2/3/4 parallel branches of 4 BasicBlocks, widths
W * 2^i) with full cross-resolution fuse layers after every module
(1x1-conv + nearest-upsample for coarse->fine; strided 3x3 chains for
fine->coarse).  Heads read the stride-4 branch.

TPU notes: every fuse path is conv + elementwise — XLA fuses the adds into
the conv epilogues; nearest upsample is the broadcast-reshape from
models/common.py (no gather).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.models.common import ConvBN, HeadStack, upsample_nearest
from centerpose_tpu.models.resnet import BasicBlock, Bottleneck


class HRModule(nn.Module):
    """One multi-resolution module: per-branch blocks + full fuse."""

    widths: Sequence[int]
    num_blocks: int = 4
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        n = len(self.widths)
        # per-branch residual blocks
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.widths[i], 1, name=f"branch{i}_block{b}", **common)(
                    x, train
                )
            ys.append(x)
        # full fuse: out_i = relu(sum_j T_ij(y_j))
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    t = ys[j]
                elif j > i:
                    # coarse -> fine: 1x1 conv + BN, nearest upsample 2^(j-i)
                    t = ConvBN(
                        self.widths[i], 1, 1, relu=False,
                        name=f"fuse_{i}_{j}", **common,
                    )(ys[j], train)
                    t = upsample_nearest(t, 2 ** (j - i))
                else:
                    # fine -> coarse: chain of strided 3x3s
                    t = ys[j]
                    for s in range(i - j):
                        last = s == i - j - 1
                        t = ConvBN(
                            self.widths[i] if last else self.widths[j],
                            3, 2, relu=not last,
                            name=f"fuse_{i}_{j}_{s}", **common,
                        )(t, train)
                acc = t if acc is None else acc + t
            outs.append(nn.relu(acc))
        return outs


class PoseHighResolutionNet(nn.Module):
    """HRNet trunk + heads on the stride-4 branch."""

    width: int = 32
    heads: Dict[str, int] = None
    head_conv: int = 64
    stage_modules: Sequence[int] = (1, 4, 3)  # stages 2, 3, 4
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        w = self.width
        # stem: stride 4
        x = ConvBN(64, 3, 2, name="stem1", **common)(x, train)
        x = ConvBN(64, 3, 2, name="stem2", **common)(x, train)
        # stage 1: 4 bottlenecks at width 64 (256 out)
        for b in range(4):
            x = Bottleneck(64, 1, name=f"layer1_{b}", **common)(x, train)

        widths = [w, 2 * w, 4 * w, 8 * w]
        # transition1: 2 branches
        xs = [
            ConvBN(widths[0], 3, 1, name="trans1_0", **common)(x, train),
            ConvBN(widths[1], 3, 2, name="trans1_1", **common)(x, train),
        ]
        for m in range(self.stage_modules[0]):
            xs = HRModule(widths[:2], name=f"stage2_m{m}", **common)(xs, train)
        # transition2: add branch at width 4w
        xs = xs + [ConvBN(widths[2], 3, 2, name="trans2_2", **common)(xs[-1], train)]
        for m in range(self.stage_modules[1]):
            xs = HRModule(widths[:3], name=f"stage3_m{m}", **common)(xs, train)
        # transition3: add branch at width 8w
        xs = xs + [ConvBN(widths[3], 3, 2, name="trans3_3", **common)(xs[-1], train)]
        for m in range(self.stage_modules[2]):
            xs = HRModule(widths[:4], name=f"stage4_m{m}", **common)(xs, train)

        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(xs[0])
