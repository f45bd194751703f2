"""DLA-34 backbone with DCNv2 iterative-deep-aggregation upsampling.

Behavioral spec: reference lib/models/backbones/dla.py (upstream
``pose_dla_dcn.py``; SURVEY.md §2 #8): DLA-34 trunk (BasicBlock / Root /
Tree, levels [1,1,1,2,2,1], channels [16,32,64,128,256,512]) producing
feature maps at strides 1..32; DLAUp/IDAUp aggregation where every
lateral/node conv is a DCNv2 (3x3, deformable_groups=1) + BN + ReLU and
2x/4x upsampling uses a fixed bilinear depthwise kernel (the reference's
frozen ``fill_up_weights`` grouped transpose conv); heads on the stride-4
output.

TPU-native notes:
- the DCN gather+GEMM runs through ops/dcn.py (pure XLA, MXU contraction);
- the bilinear upsample is a constant depthwise transpose conv expressed as
  ``lax.conv_general_dilated`` with ``lhs_dilation`` — no learnable params,
  no gather;
- offset/mask branch is zero-initialized so training starts from plain-conv
  behavior (reference DCN.reset_parameters).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from centerpose_tpu.models.common import ConvBN, HeadStack, bilinear_kernel
from centerpose_tpu.ops.dcn import dcn_v2


class _OffsetMaskParams(nn.Module):
    """Parameter-only stand-in for the offset/mask ``nn.Conv``: declares the
    identical ``{kernel, bias}`` subtree (checkpoint-compatible with models
    trained before the om-fold) but lets the caller run the conv INSIDE the
    fused Pallas kernel (``dcn_v2_pallas_fused``) or as an explicit
    ``lax.conv`` on the XLA paths."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, cin: int):
        w = self.param(
            "kernel", nn.initializers.zeros,
            (self.kernel, self.kernel, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return w, b


class DCN(nn.Module):
    """Modulated deformable conv module: offset/mask conv branch + dcn_v2.

    (reference: DCNv2/dcn_v2.py class DCN — conv_offset_mask zero-init,
    sigmoid mask.)  ``impl`` selects the sampling backend: 'xla' gather+GEMM,
    'pallas' fused kernel, or 'conv' (plain conv ablation that ignores the
    learned offsets/mask — NOT a DCN; perf baseline only).

    Under the pallas impls, supported sites run ``dcn_v2_pallas_fused``:
    the offset/mask conv is computed inside the kernel from the resident
    input slab (the reference's single-CUDA-extension-call structure,
    SURVEY.md §2 #16) instead of as a standalone 27-channel XLA conv.

    ``chsec``: input/output in channel-second [B, H, C, W] layout (layout
    persistence across the IDAUp chain); sites that fall outside the fused
    envelope transpose locally, so correctness never depends on the flag.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    deformable_groups: int = 1
    impl: str = "xla"
    # y-offset clamp radius for the fused kernels (0 = auto: per-width
    # DEFAULT_MAX_DY sized from the measured learned-offset envelope).
    max_dy: int = 0
    fused_om: bool = True
    chsec: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k2 = self.kernel * self.kernel
        g = self.deformable_groups
        pad = self.dilation * (self.kernel - 1) // 2
        if self.chsec:
            b, h, cin, w = x.shape
        else:
            b, h, w, cin = x.shape
        weight = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel, self.kernel, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.impl == "conv":
            assert not self.chsec, "'conv' ablation path is NHWC-only"
            y = lax.conv_general_dilated(
                x.astype(self.dtype),
                weight.astype(self.dtype),
                (self.stride, self.stride),
                [(pad, pad)] * 2,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias

        omw, omb = _OffsetMaskParams(
            3 * k2 * g, self.kernel, name="conv_offset_mask")(cin)

        if self.impl in ("pallas", "pallas_full"):
            from centerpose_tpu.ops.dcn_pallas import (
                dcn_v2_pallas,
                dcn_v2_pallas_fused,
                fused_om_supported,
                pallas_supported,
            )

            # The om-fused kernel is the INFERENCE path only: in training
            # the fused backward pays an om-residual round trip that the
            # separate-conv path does not (A/B: 141.7 vs 139.2 ms dla_34
            # step), while at inference the fold removes the standalone
            # conv dispatch (output/dcn_overhead.json in_model_ab).
            if (self.fused_om and not train and fused_om_supported(
                    h, w, cin, self.features, self.kernel,
                    self.stride, self.dilation, g, max_dy=self.max_dy)):
                return dcn_v2_pallas_fused(
                    x.astype(self.dtype), omw.astype(self.dtype),
                    omb.astype(self.dtype), weight.astype(self.dtype), bias,
                    self.stride, pad, self.dilation, g,
                    self.impl == "pallas_full", self.max_dy,
                    self.chsec, self.chsec,
                )

        # Non-fused paths run NHWC with an explicit offset/mask conv
        # (identical math to the former nn.Conv module).
        xn = jnp.transpose(x, (0, 1, 3, 2)) if self.chsec else x
        om = lax.conv_general_dilated(
            xn.astype(self.dtype), omw.astype(self.dtype),
            (self.stride, self.stride), [(pad, pad)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + omb.astype(self.dtype)
        offset = om[..., : 2 * k2 * g]
        mask = jax.nn.sigmoid(om[..., 2 * k2 * g :])
        if self.impl in ("pallas", "pallas_full"):
            oh, ow = xn.shape[1], xn.shape[2]
            if pallas_supported(oh, ow, cin, self.features, self.kernel,
                                self.stride, self.dilation, g,
                                max_dy=self.max_dy):
                out = dcn_v2_pallas(
                    xn.astype(self.dtype), offset, mask,
                    weight.astype(self.dtype),
                    bias, stride=self.stride, padding=pad,
                    dilation=self.dilation, deformable_groups=g,
                    kernel_bwd=(self.impl == "pallas_full"),
                    max_dy=self.max_dy,
                )
                return jnp.transpose(out, (0, 1, 3, 2)) if self.chsec else out
            # outside the fused kernel's envelope (shape or VMEM): XLA path
        if self.impl == "xla_patch":
            from centerpose_tpu.ops.dcn import dcn_v2_patch

            out = dcn_v2_patch(
                xn.astype(self.dtype), offset, mask, weight.astype(self.dtype),
                bias, stride=self.stride, padding=pad,
                dilation=self.dilation, deformable_groups=g,
            )
            return jnp.transpose(out, (0, 1, 3, 2)) if self.chsec else out
        out = dcn_v2(
            xn.astype(self.dtype),
            offset,
            mask,
            weight.astype(self.dtype),
            bias,
            stride=self.stride,
            padding=pad,
            dilation=self.dilation,
            deformable_groups=g,
        )
        return jnp.transpose(out, (0, 1, 3, 2)) if self.chsec else out


class DeformConv(nn.Module):
    """DCN 3x3 -> BN -> ReLU (reference: pose_dla_dcn.DeformConv).

    ``chsec``: the whole block runs in channel-second [B, H, C, W] layout
    (BN feature axis moves to -2; the param tree is unchanged)."""

    features: int
    bn_axis_name: Optional[str] = None
    dcn_impl: str = "xla"
    dcn_max_dy: int = 0
    dcn_fused_om: bool = True
    chsec: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DCN(self.features, impl=self.dcn_impl, max_dy=self.dcn_max_dy,
                fused_om=self.dcn_fused_om, chsec=self.chsec,
                dtype=self.dtype)(x, train)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis=-2 if self.chsec else -1,
            axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x)
        return nn.relu(x)


def _bilinear_weights_1d(factor: int) -> np.ndarray:
    """1-D bilinear kernel of size 2*factor (separable row of fill_up_weights)."""
    k = 2 * factor
    f = int(np.ceil(k / 2.0))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    return np.array([1 - abs(i / f - c) for i in range(k)], dtype=np.float32)


def _upsample_1d(x: jnp.ndarray, axis: int, factor: int) -> jnp.ndarray:
    """Depthwise transpose-conv upsample along one axis (stride=f, k=2f,
    pad=f//2) expressed as zero-stuffing + 2f shifted scaled adds.

    Grouped/dilated convs compile pathologically on the TPU backend (minutes
    per op); slices and adds fuse instantly and the math is identical."""
    w = _bilinear_weights_1d(factor)
    k = 2 * factor
    n = x.shape[axis]
    # zero-stuff: values at multiples of f, length (n-1)*f + 1
    expand = [x] + [jnp.zeros_like(x)] * (factor - 1)
    stuffed = jnp.stack(expand, axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = n * factor
    stuffed = stuffed.reshape(new_shape)
    stuffed = lax.slice_in_dim(stuffed, 0, (n - 1) * factor + 1, axis=axis)
    # pad so that 'valid' correlation yields exactly n*f outputs
    pad = k - 1 - factor // 2
    cfg = [(0, 0, 0)] * x.ndim
    cfg[axis] = (pad, pad, 0)
    padded = lax.pad(stuffed, jnp.zeros((), x.dtype), cfg)
    out_len = n * factor
    acc = None
    for t in range(k):
        sl = lax.slice_in_dim(padded, t, t + out_len, axis=axis)
        term = sl * w[t]
        acc = term if acc is None else acc + term
    return acc


def bilinear_upsample(x: jnp.ndarray, factor: int,
                      chsec: bool = False) -> jnp.ndarray:
    """Fixed depthwise bilinear 2x/4x upsample (frozen fill_up_weights
    transpose conv: kernel 2f, stride f, pad f//2, groups=C), separable.
    ``chsec``: x is [B, H, C, W] (spatial axes 1 and 3)."""
    x = _upsample_1d(x, 1, factor)  # H
    x = _upsample_1d(x, 3 if chsec else 2, factor)  # W
    return x


class DlaBasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        y = ConvBN(
            self.features, 3, self.stride, dilation=self.dilation,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x, train)
        y = ConvBN(
            self.features, 3, 1, dilation=self.dilation, relu=False,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(y, train)
        return nn.relu(y + residual)


class Root(nn.Module):
    """Aggregation node: 1x1 conv over concat(children) (+ residual)."""

    features: int
    residual: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: List[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(
            self.features, 1, 1, relu=False,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive DLA tree (reference: dla.py Tree)."""

    levels: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = [] if children is None else list(children)
        bottom = (
            nn.max_pool(
                x, (self.stride, self.stride), strides=(self.stride, self.stride)
            )
            if self.stride > 1
            else x
        )
        if x.shape[-1] != self.features:
            proj = ConvBN(
                self.features, 1, 1, relu=False,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="project",
            )(bottom, train)
        else:
            proj = bottom
        if residual is None:
            residual = proj
        if self.level_root:
            children.append(bottom)

        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        if self.levels == 1:
            x1 = DlaBasicBlock(self.features, self.stride, name="tree1", **common)(
                x, residual, train
            )
            x2 = DlaBasicBlock(self.features, 1, name="tree2", **common)(x1, None, train)
            out = Root(
                self.features, self.root_residual, name="root", **common
            )([x2, x1] + children, train)
        else:
            x1 = Tree(
                self.levels - 1, self.features, self.stride,
                root_residual=self.root_residual, name="tree1", **common,
            )(x, residual, None, train)
            children.append(x1)
            out = Tree(
                self.levels - 1, self.features, 1,
                root_residual=self.root_residual, name="tree2", **common,
            )(x1, None, children, train)
        return out


class DLATrunk(nn.Module):
    """DLA-34 trunk -> 6 feature maps at strides [1, 2, 4, 8, 16, 32]."""

    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        common = dict(bn_axis_name=self.bn_axis_name, dtype=self.dtype)
        ch = self.channels
        y = []
        # base: 7x7 s1
        x = ConvBN(ch[0], 7, 1, name="base_layer", **common)(x, train)
        # level0: one 3x3 s1; level1: one 3x3 s2
        x = ConvBN(ch[0], 3, 1, name="level0", **common)(x, train)
        y.append(x)
        x = ConvBN(ch[1], 3, 2, name="level1", **common)(x, train)
        y.append(x)
        x = Tree(self.levels[2], ch[2], 2, level_root=False, name="level2", **common)(
            x, train=train
        )
        y.append(x)
        x = Tree(self.levels[3], ch[3], 2, level_root=True, name="level3", **common)(
            x, train=train
        )
        y.append(x)
        x = Tree(self.levels[4], ch[4], 2, level_root=True, name="level4", **common)(
            x, train=train
        )
        y.append(x)
        x = Tree(self.levels[5], ch[5], 2, level_root=True, name="level5", **common)(
            x, train=train
        )
        y.append(x)
        return y


class IDAUp(nn.Module):
    """Iterative deep aggregation step over layers[startp:endp].

    For each deeper layer: DCN-project to ``features`` channels, bilinear
    upsample by its factor, then DCN-node fuse with the shallower neighbor.
    (reference: pose_dla_dcn.IDAUp.)
    """

    features: int
    up_factors: Sequence[int]
    bn_axis_name: Optional[str] = None
    dcn_impl: str = "xla"
    dcn_max_dy: int = 0
    dcn_fused_om: bool = True
    chsec: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], startp: int, endp: int,
                 train: bool = False) -> List[jnp.ndarray]:
        layers = list(layers)
        common = dict(bn_axis_name=self.bn_axis_name, dcn_impl=self.dcn_impl,
                      dcn_max_dy=self.dcn_max_dy,
                      dcn_fused_om=self.dcn_fused_om, chsec=self.chsec,
                      dtype=self.dtype)
        for i in range(startp + 1, endp):
            f = int(self.up_factors[i - startp])
            p = DeformConv(self.features, name=f"proj_{i - startp}", **common)(
                layers[i], train
            )
            if f > 1:
                p = bilinear_upsample(p, f, chsec=self.chsec)
            layers[i] = DeformConv(self.features, name=f"node_{i - startp}", **common)(
                p + layers[i - 1], train
            )
        return layers


class DLAUp(nn.Module):
    """Progressive aggregation of trunk levels startp..5 down to stride-4.

    (reference: pose_dla_dcn.DLAUp — repeatedly applies IDAUp over the tail
    of the layer list, mutating channels toward the shallow end.)
    """

    startp: int
    channels: Sequence[int]  # channels[startp:] of the trunk
    bn_axis_name: Optional[str] = None
    dcn_impl: str = "xla"
    dcn_max_dy: int = 0
    dcn_fused_om: bool = True
    chsec: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        layers = list(layers)
        channels = list(self.channels)
        scales = [2 ** i for i in range(len(channels))]
        out = [layers[-1]]
        for i in range(len(channels) - 1):
            j = -i - 2
            up_f = [s // scales[j] for s in scales[j:]]
            layers_tail = IDAUp(
                channels[j], up_f, name=f"ida_{i}",
                bn_axis_name=self.bn_axis_name, dcn_impl=self.dcn_impl,
                dcn_max_dy=self.dcn_max_dy,
                dcn_fused_om=self.dcn_fused_om, chsec=self.chsec,
                dtype=self.dtype,
            )(layers, len(layers) + j, len(layers), train)
            layers = layers_tail
            out.insert(0, layers[-1])
            for t in range(j + 1, 0):
                scales[t] = scales[j]
                channels[t] = channels[j]
        return out


class DLASeg(nn.Module):
    """Full DLA-34 pose net: trunk -> DLAUp -> final IDAUp -> heads.

    (reference: pose_dla_dcn.DLASeg with down_ratio=4, last_level=5.)
    """

    heads: Dict[str, int] = None
    head_conv: int = 256
    down_ratio: int = 4
    last_level: int = 5
    bn_axis_name: Optional[str] = None
    dcn_impl: str = "xla"
    dcn_max_dy: int = 0
    dcn_fused_om: bool = True
    dcn_chsec: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        first_level = int(np.log2(self.down_ratio))  # 2
        trunk_channels = (16, 32, 64, 128, 256, 512)
        feats = DLATrunk(
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="base"
        )(x, train)
        # Channel-second persistence: under the fused Pallas impls the whole
        # DLAUp/IDAUp chain runs in [B, H, C, W] — one transpose per trunk
        # level in, one out before the heads, instead of an NHWC round-trip
        # around each of the 16 DCN sites (VERDICT r4 item 1b).
        chsec = (self.dcn_chsec
                 and self.dcn_impl in ("pallas", "pallas_full"))
        if chsec:
            feats = (list(feats[:first_level])
                     + [jnp.transpose(f, (0, 1, 3, 2))
                        for f in feats[first_level:]])
        outs = DLAUp(
            first_level, trunk_channels[first_level:],
            bn_axis_name=self.bn_axis_name, dcn_impl=self.dcn_impl,
            dcn_max_dy=self.dcn_max_dy, dcn_fused_om=self.dcn_fused_om,
            chsec=chsec, dtype=self.dtype, name="dla_up",
        )(feats, train)

        y = list(outs[: self.last_level - first_level])
        y = IDAUp(
            trunk_channels[first_level],
            [2 ** i for i in range(self.last_level - first_level)],
            bn_axis_name=self.bn_axis_name, dcn_impl=self.dcn_impl,
            dcn_max_dy=self.dcn_max_dy, dcn_fused_om=self.dcn_fused_om,
            chsec=chsec, dtype=self.dtype, name="ida_up",
        )(y, 0, len(y), train)

        out = jnp.transpose(y[-1], (0, 1, 3, 2)) if chsec else y[-1]
        return HeadStack(self.heads, self.head_conv, dtype=self.dtype)(out)
