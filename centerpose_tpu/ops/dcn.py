"""Modulated deformable convolution v2 (DCNv2) — TPU-native.

Replaces the reference's ~2.2k-LoC CUDA extension
(lib/models/backbones/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu; SURVEY.md §2 #16)
with a pure-XLA formulation designed for the MXU:

  1. *Gather stage*: for each of the K = kh*kw kernel taps, bilinearly sample
     the input at (p0 + p_k + Δp_k) — four integer gathers with bilinear
     corner weights, zero outside the image (matching the CUDA kernel's
     zero-padding bilinear).  All taps are gathered at once into an
     im2col-style [B, Ho, Wo, K, Cin] buffer (the CUDA kernel builds exactly
     this column buffer, one thread per sample).
  2. *Contraction stage*: one big GEMM [B*Ho*Wo, K*Cin] x [K*Cin, Cout] that
     XLA tiles straight onto the MXU — this is where the FLOPs are.
  3. Modulation masks scale the gathered samples before the GEMM.

Autodiff comes for free (gather/scatter transpose in the VJP), so unlike the
CUDA extension there is no hand-written backward.  A fused Pallas variant can
slot in behind the same API later; this XLA path is the correctness anchor
(SURVEY.md §7: "fallback pure-XLA version keeps DLA-34 correct").

Layouts: NHWC activations, weight [kh, kw, Cin, Cout], offset
[B, Ho, Wo, G*K*2] with (dy, dx) interleaved per tap (CUDA channel order),
mask [B, Ho, Wo, G*K] (already sigmoid-ed by the caller module).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _tap_sample_coords(b, ho, wo, g, k, kh, kw, stride, padding, dilation,
                       offset, f32):
    """Absolute fractional sample coords [B, Ho, Wo, G, K] (sy, sx)."""
    ky = (np.repeat(np.arange(kh), kw) * dilation - padding).astype(np.float32)
    kx = (np.tile(np.arange(kw), kh) * dilation - padding).astype(np.float32)
    oy = (jnp.arange(ho, dtype=f32) * stride)[:, None]
    ox = (jnp.arange(wo, dtype=f32) * stride)[None, :]
    off = offset.reshape(b, ho, wo, g, k, 2).astype(f32)
    sy = oy[None, :, :, None, None] + jnp.asarray(ky)[None, None, None, None, :] + off[..., 0]
    sx = ox[None, :, :, None, None] + jnp.asarray(kx)[None, None, None, None, :] + off[..., 1]
    return sy, sx


def dcn_v2_patch(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """dcn_v2 via 2x2xC patch gathers (deformable_groups == 1 only).

    Instead of four independent bilinear-corner row gathers, issue ONE
    lax.gather of a [2, 2, C] patch per tap sample (CLIP mode clamps the
    start), then select the four corners elementwise.  4x fewer gather
    indices; XLA's TPU gather emitter amortizes its per-index scalar work
    over the whole patch.  Semantics identical to dcn_v2 (zero padding
    outside the image, modulation mask, im2col GEMM on the MXU).
    """
    assert deformable_groups == 1, "patch path is g=1 only"
    b, h, w, cin = x.shape
    kh, kw, wcin, cout = weight.shape
    assert wcin == cin, (wcin, cin)
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offset.shape == (b, ho, wo, k * 2), (offset.shape,)
    assert mask.shape == (b, ho, wo, k), (mask.shape,)

    dtype = x.dtype
    f32 = jnp.float32
    n = ho * wo * k

    sy, sx = _tap_sample_coords(
        b, ho, wo, 1, k, kh, kw, stride, padding, dilation, offset, f32
    )
    sy = sy[..., 0, :].reshape(b, n)  # [B, N]
    sx = sx[..., 0, :].reshape(b, n)
    m = mask.reshape(b, n).astype(f32)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0
    wx1 = sx - x0

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    starts = jnp.stack([y0i, x0i], axis=-1)  # [B, N, 2]; CLIP clamps to valid

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_one(img, idx):
        return lax.gather(
            img, idx, dn, slice_sizes=(2, 2, cin),
            mode=lax.GatherScatterMode.CLIP,
        )  # [N, 2, 2, C]

    patch = jax.vmap(gather_one)(x, starts)  # [B, N, 2, 2, C]
    p00 = patch[:, :, 0, 0, :].astype(f32)
    p01 = patch[:, :, 0, 1, :].astype(f32)
    p10 = patch[:, :, 1, 0, :].astype(f32)
    p11 = patch[:, :, 1, 1, :].astype(f32)

    # The gather start was clamped to [0, H-2] x [0, W-2]; map each original
    # corner to its row/col inside the patch and zero it when outside the
    # image (matching the CUDA kernel's zero-padding bilinear).
    sy0 = jnp.clip(y0i, 0, h - 2).astype(f32)
    sx0 = jnp.clip(x0i, 0, w - 2).astype(f32)

    def corner_val(yc, xc, pa, pb, pc, pd):
        # select among the four patch cells by (row, col) parity
        ry1 = (jnp.clip(yc, 0.0, h - 1.0) - sy0) >= 0.5  # row 1 of patch?
        rx1 = (jnp.clip(xc, 0.0, w - 1.0) - sx0) >= 0.5
        row0 = jnp.where(rx1[..., None], pb, pa)
        row1 = jnp.where(rx1[..., None], pd, pc)
        return jnp.where(ry1[..., None], row1, row0)

    def corner_w(yc, xc, wgt):
        valid = ((yc >= 0.0) & (yc <= h - 1.0) & (xc >= 0.0) & (xc <= w - 1.0))
        return (wgt * valid.astype(f32) * m)[..., None]

    samples = (
        corner_val(y0, x0, p00, p01, p10, p11) * corner_w(y0, x0, (1 - wy1) * (1 - wx1))
        + corner_val(y0, x0 + 1, p00, p01, p10, p11) * corner_w(y0, x0 + 1, (1 - wy1) * wx1)
        + corner_val(y0 + 1, x0, p00, p01, p10, p11) * corner_w(y0 + 1, x0, wy1 * (1 - wx1))
        + corner_val(y0 + 1, x0 + 1, p00, p01, p10, p11) * corner_w(y0 + 1, x0 + 1, wy1 * wx1)
    )  # [B, N, C]

    cols = samples.reshape(b * ho * wo, k * cin)
    w_col = weight.reshape(k * cin, cout)
    out = jnp.dot(
        cols.astype(dtype), w_col.astype(dtype), preferred_element_type=f32
    ).reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out.astype(dtype)


def dcn_v2(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Modulated deformable conv v2.

    x: [B, H, W, Cin]; offset: [B, Ho, Wo, G*K*2] (dy, dx per tap);
    mask: [B, Ho, Wo, G*K]; weight: [kh, kw, Cin, Cout]; -> [B, Ho, Wo, Cout].
    """
    b, h, w, cin = x.shape
    kh, kw, wcin, cout = weight.shape
    assert wcin == cin, (wcin, cin)
    g = deformable_groups
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offset.shape == (b, ho, wo, g * k * 2), (offset.shape, (b, ho, wo, g * k * 2))
    assert mask.shape == (b, ho, wo, g * k), (mask.shape,)
    assert cin % g == 0
    cg = cin // g

    dtype = x.dtype
    f32 = jnp.float32

    # Tap base positions relative to the output cell (dilated, pad-shifted).
    ky = (np.repeat(np.arange(kh), kw) * dilation - padding).astype(np.float32)
    kx = (np.tile(np.arange(kw), kh) * dilation - padding).astype(np.float32)

    # Output-cell base coordinates.
    oy = (jnp.arange(ho, dtype=f32) * stride)[:, None]  # [Ho, 1]
    ox = (jnp.arange(wo, dtype=f32) * stride)[None, :]  # [1, Wo]

    off = offset.reshape(b, ho, wo, g, k, 2).astype(f32)
    m = mask.reshape(b, ho, wo, g, k).astype(f32)

    # Absolute sample coordinates [B, Ho, Wo, G, K].
    sy = oy[None, :, :, None, None] + jnp.asarray(ky)[None, None, None, None, :] + off[..., 0]
    sx = ox[None, :, :, None, None] + jnp.asarray(kx)[None, None, None, None, :] + off[..., 1]

    # Bilinear corners.
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0  # weight toward y0+1
    wx1 = sx - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    if g == 1:
        # Fast path: single flat gather per corner, no group transposes.
        x_flat = x.reshape(b, h * w, cin)  # [B, HW, C]
        sy1 = sy[..., 0, :]  # [B, Ho, Wo, K]
        sx1 = sx[..., 0, :]
        m1 = m[..., 0, :]  # [B, Ho, Wo, K]
        y0 = jnp.floor(sy1)
        x0 = jnp.floor(sx1)
        wy1 = sy1 - y0
        wx1 = sx1 - x0

        def corner1(yc, xc, wgt):
            valid = (
                (yc >= 0) & (yc <= h - 1) & (xc >= 0) & (xc <= w - 1)
            ).astype(f32)
            yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
            idx = (yi * w + xi).reshape(b, ho * wo * k)
            gathered = jnp.take_along_axis(
                x_flat, idx[:, :, None], axis=1
            )  # [B, HoWoK, C]
            wfull = (wgt * valid * m1).reshape(b, ho * wo * k, 1)
            return gathered.astype(f32) * wfull

        samples = (
            corner1(y0, x0, (1 - wy1) * (1 - wx1))
            + corner1(y0, x0 + 1, (1 - wy1) * wx1)
            + corner1(y0 + 1, x0, wy1 * (1 - wx1))
            + corner1(y0 + 1, x0 + 1, wy1 * wx1)
        )  # [B, HoWoK, C]
        cols = samples.reshape(b * ho * wo, k * cin)
        w_col = weight.reshape(k * cin, cout)
        # weight layout check: weight is [kh, kw, Cin, Cout] -> flat index
        # (ky*kw + kx)*Cin + ci, matching samples' [K, Cin] flattening.
        out = jnp.dot(
            cols.astype(dtype), w_col.astype(dtype), preferred_element_type=f32
        ).reshape(b, ho, wo, cout)
        if bias is not None:
            out = out + bias
        return out.astype(dtype)

    x_flat = x.reshape(b, h * w, g, cg)  # [B, HW, G, Cg]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0  # weight toward y0+1
    wx1 = sx - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def corner(yc, xc, wgt):
        """Gather one bilinear corner for all taps: returns [B,Ho,Wo,G,K,Cg]."""
        # zero-pad semantics: corners outside [0,H-1]x[0,W-1] contribute 0
        valid = (
            (yc >= 0) & (yc <= h - 1) & (xc >= 0) & (xc <= w - 1)
        ).astype(f32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        flat = yi * w + xi  # [B, Ho, Wo, G, K]
        idx = flat.transpose(0, 3, 1, 2, 4).reshape(b, g, ho * wo * k)

        def gather_one(src_g, idx_g):
            # src_g [B, HW, Cg]; idx_g [B, N] -> [B, N, Cg]
            return jnp.take_along_axis(src_g, idx_g[:, :, None], axis=1)

        gathered = jax.vmap(gather_one, in_axes=(2, 1), out_axes=1)(
            x_flat, idx
        )  # [B, G, Ho*Wo*K, Cg]
        gathered = (
            gathered.reshape(b, g, ho, wo, k, cg).transpose(0, 2, 3, 1, 4, 5)
        )  # [B, Ho, Wo, G, K, Cg]
        return gathered.astype(f32) * (wgt * valid)[..., None]

    samples = (
        corner(y0, x0, wy0 * wx0)
        + corner(y0, x0 + 1, wy0 * wx1)
        + corner(y0 + 1, x0, wy1 * wx0)
        + corner(y0 + 1, x0 + 1, wy1 * wx1)
    )  # [B, Ho, Wo, G, K, Cg]

    samples = samples * m[..., None]

    # im2col GEMM: [B*Ho*Wo, K*Cin] @ [K*Cin, Cout] -> MXU.
    # weight [kh, kw, Cin, Cout] -> [K, G, Cg, Cout] -> [G*K*Cg, Cout] with
    # sample layout [G, K, Cg] flattened identically.
    w_col = weight.reshape(k, g, cg, cout).transpose(1, 0, 2, 3).reshape(g * k * cg, cout)
    cols = samples.reshape(b * ho * wo, g * k * cg)
    out = jnp.dot(
        cols.astype(dtype), w_col.astype(dtype), preferred_element_type=f32
    )
    out = out.reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out.astype(dtype)
