"""Shared model building blocks (Flax linen, NHWC, MXU-friendly).

Conventions:
- NHWC activations, HWIO conv kernels — the layouts XLA's TPU conv emitter
  tiles onto the MXU without relayout copies.
- BatchNorm matches torch semantics (momentum 0.1 -> flax momentum 0.9,
  eps 1e-5).  Under the jit-compiled SPMD train step BN statistics reduce
  over the *global* batch by construction (SURVEY.md §7 hard-part 4; see the
  TrainConfig BatchNorm note).  ``bn_axis_name`` is reserved for future
  shard_map contexts and is always None today.
- ``bilinear_upsample_init`` reproduces the reference's frozen-bilinear
  transpose-conv initialization (reference: fill_up_weights in the DLA/ResNet
  upsampling paths, SURVEY.md §2 #8).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Heatmap-head bias init: -log((1 - pi) / pi) with prior pi = 0.1, so the
# focal loss starts from a low-confidence prediction everywhere.
HM_BIAS_INIT = -2.19


def bilinear_kernel(size: int) -> np.ndarray:
    """1-channel 2D bilinear upsampling kernel of the given size."""
    f = int(np.ceil(size / 2.0))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((size, size), dtype=np.float32)
    for i in range(size):
        for j in range(size):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    return w


def bilinear_upsample_init(key, shape, dtype=jnp.float32):
    """Initializer for ConvTranspose kernels (kh, kw, in, out): bilinear on
    the diagonal channels, zero off-diagonal."""
    kh, kw, cin, cout = shape
    w = np.zeros(shape, dtype=np.float32)
    bil = bilinear_kernel(kh)
    for c in range(min(cin, cout)):
        w[:, :, c, c] = bil
    return jnp.asarray(w, dtype)


class ConvBN(nn.Module):
    """Conv -> BN -> (optional ReLU)."""

    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    dilation: int = 1
    relu: bool = True
    bn_momentum: float = 0.9
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=[(self.dilation * (self.kernel - 1) // 2,) * 2] * 2,
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBN(nn.Module):
    """ConvTranspose (k4 s2, bilinear init) -> BN -> ReLU; doubles H, W."""

    features: int
    kernel: int = 4
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # padding="SAME" with k4 s2 yields an exact 2x spatial upsample
        # (torch equivalent: ConvTranspose2d(k=4, s=2, p=1)).
        x = nn.ConvTranspose(
            self.features,
            (self.kernel, self.kernel),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            kernel_init=bilinear_upsample_init,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.bn_axis_name,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class HeadStack(nn.Module):
    """Per-task prediction heads on the stride-4 feature map.

    For each (name, channels): 3x3 conv(head_conv) -> ReLU -> 1x1 conv(out).
    Heatmap heads ('hm', 'hm_hp') get bias init -2.19; outputs are raw logits
    (sigmoid applied by loss / detector).  (reference: head construction in
    every backbone's get_pose_net, SURVEY.md §2 #8.)
    """

    heads: Dict[str, int]
    head_conv: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, ch in self.heads.items():
            h = x
            if self.head_conv > 0:
                h = nn.Conv(
                    self.head_conv,
                    (3, 3),
                    padding="SAME",
                    use_bias=True,
                    dtype=self.dtype,
                    name=f"{name}_conv",
                    kernel_init=nn.initializers.he_normal(),
                )(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(HM_BIAS_INIT)
                if name in ("hm", "hm_hp")
                else nn.initializers.zeros
            )
            h = nn.Conv(
                ch,
                (1, 1),
                use_bias=True,
                dtype=self.dtype,
                name=f"{name}_out",
                bias_init=bias_init,
                kernel_init=nn.initializers.normal(0.001),
            )(h)
            out[name] = h.astype(jnp.float32)
        return out


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor spatial upsample for NHWC (pure reshape/broadcast —
    fuses in XLA without gather)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)
