"""DCNv2 correctness tests (SURVEY.md §4: zero-offset ≡ conv, shifted conv,
VJP finite-difference)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from centerpose_tpu.ops.dcn import dcn_v2


def plain_conv(x, w, stride=1, padding=1, dilation=1):
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32) * scale
    )


def test_zero_offset_equals_conv():
    b, h, w, cin, cout = 2, 8, 8, 4, 6
    x = rand((b, h, w, cin), 0)
    wgt = rand((3, 3, cin, cout), 1, 0.3)
    offset = jnp.zeros((b, h, w, 18))
    mask = jnp.ones((b, h, w, 9))
    out = dcn_v2(x, offset, mask, wgt)
    ref = plain_conv(x, wgt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_zero_offset_stride2():
    b, h, w, cin, cout = 1, 8, 8, 3, 5
    x = rand((b, h, w, cin), 2)
    wgt = rand((3, 3, cin, cout), 3, 0.3)
    offset = jnp.zeros((b, 4, 4, 18))
    mask = jnp.ones((b, 4, 4, 9))
    out = dcn_v2(x, offset, mask, wgt, stride=2)
    ref = plain_conv(x, wgt, stride=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_integer_offset_equals_shifted_conv():
    """All taps offset by a constant integer (dy=0, dx=1) ≡ conv of the
    x-shifted input (interior cells)."""
    b, h, w, cin, cout = 1, 10, 10, 3, 4
    x = rand((b, h, w, cin), 4)
    wgt = rand((3, 3, cin, cout), 5, 0.3)
    offset = np.zeros((b, h, w, 18), np.float32)
    offset[..., 1::2] = 1.0  # dx = +1 for every tap
    mask = jnp.ones((b, h, w, 9))
    out = dcn_v2(x, jnp.asarray(offset), mask, wgt)
    # shift input left by one (sample at x+1) then plain conv
    x_shift = jnp.concatenate([x[:, :, 1:, :], jnp.zeros((b, h, 1, cin))], axis=2)
    ref = plain_conv(x_shift, wgt)
    # compare away from the right border (zero-padding details differ there)
    np.testing.assert_allclose(
        np.asarray(out)[:, 2:-2, 2:-2], np.asarray(ref)[:, 2:-2, 2:-2],
        rtol=1e-4, atol=1e-4,
    )


def test_fractional_offset_bilinear():
    """Half-pixel offset on a linear ramp image: samples average neighbors."""
    h = w = 6
    ramp = np.arange(w, dtype=np.float32)[None, None, :, None]
    x = jnp.asarray(np.broadcast_to(ramp, (1, h, w, 1)).copy())
    # 1x1 kernel, identity weight
    wgt = jnp.ones((1, 1, 1, 1))
    offset = np.zeros((1, h, w, 2), np.float32)
    offset[..., 1] = 0.5  # dx = 0.5
    mask = jnp.ones((1, h, w, 1))
    out = dcn_v2(x, jnp.asarray(offset), mask, wgt, padding=0)
    # interior: value = (v[x] + v[x+1]) / 2 = x + 0.5
    got = np.asarray(out)[0, 2, 1:4, 0]
    np.testing.assert_allclose(got, [1.5, 2.5, 3.5], rtol=1e-5)


def test_mask_modulation_scales_output():
    b, h, w, cin, cout = 1, 6, 6, 2, 3
    x = rand((b, h, w, cin), 6)
    wgt = rand((3, 3, cin, cout), 7, 0.3)
    offset = jnp.zeros((b, h, w, 18))
    out_half = dcn_v2(x, offset, jnp.full((b, h, w, 9), 0.5), wgt)
    out_full = dcn_v2(x, offset, jnp.ones((b, h, w, 9)), wgt)
    np.testing.assert_allclose(
        np.asarray(out_half), 0.5 * np.asarray(out_full), rtol=1e-4, atol=1e-5
    )


def test_deformable_groups_independent_offsets():
    b, h, w, cin, cout, g = 1, 6, 6, 4, 4, 2
    x = rand((b, h, w, cin), 8)
    wgt = rand((3, 3, cin, cout), 9, 0.3)
    # group 0: zero offset; group 1: dx=+1 integer offset
    offset = np.zeros((b, h, w, g * 9 * 2), np.float32)
    offset[..., 18 + 1 :: 2][..., :9 - 0] = 0  # layout check below
    off = offset.reshape(b, h, w, g, 9, 2)
    off[..., 1, :, 1] = 1.0
    mask = jnp.ones((b, h, w, g * 9))
    out = dcn_v2(
        x, jnp.asarray(off.reshape(b, h, w, -1)), mask, wgt, deformable_groups=2
    )
    # Reference: conv with group-0 channels normal + group-1 channels shifted
    x_shift = jnp.concatenate([x[:, :, 1:, :], jnp.zeros((b, h, 1, cin))], axis=2)
    x_mix = jnp.concatenate([x[..., :2], x_shift[..., 2:]], axis=-1)
    ref = plain_conv(x_mix, wgt)
    np.testing.assert_allclose(
        np.asarray(out)[:, 2:-2, 2:-2], np.asarray(ref)[:, 2:-2, 2:-2],
        rtol=1e-4, atol=1e-4,
    )


def test_dcn_gradients_finite_difference():
    b, h, w, cin, cout = 1, 5, 5, 2, 2
    x = rand((b, h, w, cin), 10)
    wgt = rand((3, 3, cin, cout), 11, 0.3)
    offset = rand((b, h, w, 18), 12, 0.3)
    mask = jnp.asarray(
        1 / (1 + np.exp(-np.random.default_rng(13).normal(size=(b, h, w, 9)))),
        jnp.float32,
    )

    def f_off(o):
        return jnp.sum(jnp.sin(dcn_v2(x, o, mask, wgt)))

    def f_x(xx):
        return jnp.sum(jnp.sin(dcn_v2(xx, offset, mask, wgt)))

    def f_w(ww):
        return jnp.sum(jnp.sin(dcn_v2(x, offset, mask, ww)))

    for f, arg in ((f_off, offset), (f_x, x), (f_w, wgt)):
        g = jax.grad(f)(arg)
        rng = np.random.default_rng(14)
        v = jnp.asarray(rng.normal(size=arg.shape).astype(np.float32))
        eps = 1e-3
        fd = (float(f(arg + eps * v)) - float(f(arg - eps * v))) / (2 * eps)
        an = float(jnp.vdot(g, v))
        np.testing.assert_allclose(an, fd, rtol=2e-2, atol=2e-3)


def test_dcn_jit_compiles():
    b, h, w, cin, cout = 2, 8, 8, 4, 4
    x = rand((b, h, w, cin), 15)
    wgt = rand((3, 3, cin, cout), 16, 0.3)
    offset = rand((b, h, w, 18), 17, 0.1)
    mask = jnp.ones((b, h, w, 9)) * 0.7
    out = jax.jit(dcn_v2, static_argnames=("stride", "padding", "dilation", "deformable_groups"))(
        x, offset, mask, wgt
    )
    assert out.shape == (b, h, w, cout)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# dcn_v2_patch (single 2x2xC patch-gather formulation)
# ---------------------------------------------------------------------------


def test_patch_matches_reference():
    from centerpose_tpu.ops.dcn import dcn_v2_patch

    for seed, (h, w, cin, cout, stride) in enumerate(
        [(16, 16, 8, 12, 1), (17, 13, 4, 6, 1), (16, 16, 8, 8, 2)]
    ):
        pad, dil = 1, 1
        ho = (h + 2 * pad - dil * 2 - 1) // stride + 1
        wo = (w + 2 * pad - dil * 2 - 1) // stride + 1
        x = rand((2, h, w, cin), 20 + seed)
        offset = rand((2, ho, wo, 18), 30 + seed, 3.0)
        mask = jax.nn.sigmoid(rand((2, ho, wo, 9), 40 + seed))
        wgt = rand((3, 3, cin, cout), 50 + seed, 0.3)
        bias = rand((cout,), 60 + seed)
        a = dcn_v2(x, offset, mask, wgt, bias, stride=stride)
        b_ = dcn_v2_patch(x, offset, mask, wgt, bias, stride=stride)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


# ---------------------------------------------------------------------------
# dcn_v2_pallas (fused TPU kernel; interpret mode on CPU)
# ---------------------------------------------------------------------------


def _clamp_y(offset, r=4.0):
    b, h, w, c = offset.shape
    off = offset.reshape(b, h, w, c // 2, 2)
    return jnp.stack(
        [jnp.clip(off[..., 0], -r, r), off[..., 1]], -1
    ).reshape(b, h, w, c)


def test_pallas_kernel_matches_reference_interpret():
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        for seed, (h, w, cin, cout, offscale) in enumerate(
            [(16, 16, 8, 16, 2.0), (16, 12, 4, 8, 6.0), (32, 32, 16, 8, 1.0)]
        ):
            x = rand((2, h, w, cin), 70 + seed)
            offset = rand((2, h, w, 18), 80 + seed, offscale)
            mask = jax.nn.sigmoid(rand((2, h, w, 9), 90 + seed))
            wgt = rand((3, 3, cin, cout), 100 + seed, 0.3)
            bias = rand((cout,), 110 + seed)
            md = dp.resolve_max_dy(h, w, cin, cout)
            ref = dcn_v2(x, _clamp_y(offset, md), mask, wgt, bias)
            out = dp.dcn_v2_pallas(x, offset, mask, wgt, bias)
            ref = np.asarray(ref)
            out = np.asarray(out)
            # row-major fwd runs its z/A matmuls in bf16 (native MXU
            # precision); grouped fwd is f32-exact — one tolerance for both
            rel = np.abs(ref - out).max() / max(np.abs(ref).max(), 1e-6)
            assert rel < 1e-2, f"fwd rel err {rel} at {(h, w, cin, cout)}"
    finally:
        dp._INTERPRET[0] = False


def test_pallas_vjp_matches_xla_grads():
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        b, h, w, cin, cout = 1, 16, 16, 4, 6
        x = rand((b, h, w, cin), 120)
        offset = rand((b, h, w, 18), 121, 1.5)
        mask = jax.nn.sigmoid(rand((b, h, w, 9), 122))
        wgt = rand((3, 3, cin, cout), 123, 0.3)
        bias = jnp.zeros((cout,))

        # explicit vjp with a FIXED cotangent: the bf16 forward's output
        # differs from the f32 XLA forward at ~1e-3, so grad-of-loss would
        # compare (identical XLA) backwards at different cotangents
        md = dp.resolve_max_dy(h, w, cin, cout)
        _, vjp_p = jax.vjp(
            lambda x, o, m, wt: dp.dcn_v2_pallas(x, o, m, wt, bias),
            x, offset, mask, wgt)
        _, vjp_x = jax.vjp(
            lambda x, o, m, wt: dcn_v2(x, _clamp_y(o, md), m, wt, bias),
            x, offset, mask, wgt)
        ct = rand((b, h, w, cout), 124)
        for a, b_ in zip(vjp_p(ct), vjp_x(ct)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3
            )
    finally:
        dp._INTERPRET[0] = False


@pytest.mark.slow
def test_pallas_grouped_kernel_matches_reference_interpret():
    """Row-grouped variant (narrow maps, rows packed into lanes)."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        for seed, (hw, cin, cout, offscale) in enumerate(
            [(16, 24, 16, 6.0), (32, 16, 8, 2.0), (64, 8, 8, 1.0)]
        ):
            assert dp._grouped_ok(hw, hw, cin, cout)
            x = rand((2, hw, hw, cin), 130 + seed)
            offset = rand((2, hw, hw, 18), 140 + seed, offscale)
            mask = jax.nn.sigmoid(rand((2, hw, hw, 9), 150 + seed))
            wgt = rand((3, 3, cin, cout), 160 + seed, 0.3)
            bias = rand((cout,), 170 + seed)
            ref = np.asarray(dcn_v2(x, _clamp_y(offset), mask, wgt, bias))
            out = np.asarray(
                dp._dcn_pallas_grouped_impl(x, offset, mask, wgt, bias, max_dy=4))
            # grouped fwd z/A matmuls run bf16 (native MXU precision)
            rel = np.abs(ref - out).max() / max(np.abs(ref).max(), 1e-6)
            assert rel < 1e-2, f"grouped fwd rel err {rel} at {(hw, cin, cout)}"
    finally:
        dp._INTERPRET[0] = False


def test_pallas_dispatch_covers_all_dla34_sites():
    """Every DCN site in DLA-34 @512^2 must take a fused path (no silent
    XLA fallback in the flagship config)."""
    from centerpose_tpu.ops.dcn_pallas import (
        _grouped_ok,
        _rowmajor_ok,
        pallas_supported,
    )

    sites = [
        (512, 256, 16), (256, 256, 32), (256, 128, 32), (128, 128, 64),
        (128, 64, 64), (256, 64, 32), (64, 64, 128),
    ]
    for cin, cout, hw in sites:
        assert pallas_supported(hw, hw, cin, cout), (cin, cout, hw)
        assert _rowmajor_ok(hw, hw, cin, cout) or _grouped_ok(hw, hw, cin, cout)
    # narrow sites route grouped-first (full lane occupancy, less VMEM);
    # W=128 uses the slab-DMA row-major kernel
    for cin, cout, hw in sites:
        if hw in (16, 32, 64):
            assert _grouped_ok(hw, hw, cin, cout), (cin, cout, hw)
    assert _rowmajor_ok(128, 128, 64, 64)


@pytest.mark.slow
def test_pallas_fused_backward_matches_xla_grads():
    """kernel_bwd=True routes through the fused grouped backward kernel."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        hw, cin, cout = 16, 8, 8
        md = dp.resolve_max_dy(hw, hw, cin, cout)
        assert dp._grouped_bwd_ok(hw, hw, cin, cout, md)
        x = rand((1, hw, hw, cin), 200)
        offset = rand((1, hw, hw, 18), 201, 5.0)
        mask = jax.nn.sigmoid(rand((1, hw, hw, 9), 202))
        wgt = rand((3, 3, cin, cout), 203, 0.3)
        bias = rand((cout,), 204)

        # fixed cotangent (see test_pallas_vjp_matches_xla_grads)
        _, vjp_k = jax.vjp(
            lambda *a: dp.dcn_v2_pallas(*a, 1, 1, 1, 1, True),
            x, offset, mask, wgt, bias)
        _, vjp_x = jax.vjp(
            lambda x, o, m, wt, bb: dcn_v2(x, _clamp_y(o, md), m, wt, bb),
            x, offset, mask, wgt, bias)
        ct = rand((1, hw, hw, cout), 205)
        gk = vjp_k(ct)
        gx = vjp_x(ct)
        for name, a, b_ in zip(("dx", "doff", "dmask", "dw", "dbias"), gk, gx):
            a = np.asarray(a)
            b_ = np.asarray(b_)
            # grouped bwd dcols/dx matmuls run bf16 (native MXU precision)
            rel = np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)
            assert rel < 2e-2, f"{name} rel err {rel}"
    finally:
        dp._INTERPRET[0] = False


def test_pallas_grouped_kernel_small_interpret():
    """Fast-tier smoke of the row-grouped layout (full sweep in slow tier)."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        hw, cin, cout = 16, 8, 8
        assert dp._grouped_ok(hw, hw, cin, cout)
        x = rand((1, hw, hw, cin), 300)
        offset = rand((1, hw, hw, 18), 301, 5.0)
        mask = jax.nn.sigmoid(rand((1, hw, hw, 9), 302))
        wgt = rand((3, 3, cin, cout), 303, 0.3)
        bias = rand((cout,), 304)
        ref = np.asarray(dcn_v2(x, _clamp_y(offset), mask, wgt, bias))
        out = np.asarray(
            dp._dcn_pallas_grouped_impl(x, offset, mask, wgt, bias, max_dy=4))
        rel = np.abs(ref - out).max() / max(np.abs(ref).max(), 1e-6)
        assert rel < 1e-2, f"grouped fwd rel err {rel}"
    finally:
        dp._INTERPRET[0] = False


@pytest.mark.slow
def test_rowmajor_dx_split_backward_matches_xla_grads():
    """kernel_bwd=True at a W=128 site routes the backward through the
    two-pass Pallas split: pass A (_dcn_rowmajor_grads_impl) computes
    doffset/dmask/dweight/dbias, pass B (_dcn_rowmajor_dx_impl) computes dx;
    all five gradients must match the clamped XLA formulation's autodiff."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        h, w, cin, cout = 8, 128, 4, 4
        md = dp.resolve_max_dy(h, w, cin, cout)
        assert md == dp._ROWMAJOR_DY_CAP
        assert dp._rowmajor_dx_ok(h, w, cin, cout, md)
        assert not dp._grouped_bwd_ok(h, w, cin, cout, md)
        x = rand((1, h, w, cin), 400)
        offset = rand((1, h, w, 18), 401, 5.0)
        mask = jax.nn.sigmoid(rand((1, h, w, 9), 402))
        wgt = rand((3, 3, cin, cout), 403, 0.3)
        bias = rand((cout,), 404)

        # explicit vjp with a FIXED cotangent: the bf16 forward's output
        # differs from the f32 XLA forward at ~1e-3, so grad-of-loss would
        # compare gradients at different cotangents
        _, vjp_k = jax.vjp(
            lambda *a: dp.dcn_v2_pallas(*a, 1, 1, 1, 1, True),
            x, offset, mask, wgt, bias)
        _, vjp_x = jax.vjp(
            lambda x, o, m, wt, bb: dcn_v2(x, _clamp_y(o, md), m, wt, bb),
            x, offset, mask, wgt, bias)
        ct = rand((1, h, w, cout), 405)
        gk = vjp_k(ct)
        gx = vjp_x(ct)
        for name, a, b_ in zip(("dx", "doff", "dmask", "dw", "dbias"), gk, gx):
            a = np.asarray(a)
            b_ = np.asarray(b_)
            # all five gradients come from bf16 band matmuls (pass A for
            # doffset/dmask/dW, pass B for dx; native MXU precision,
            # hardware-measured rel err ~3e-3)
            rel = np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)
            assert rel < 2e-2, f"{name} rel err {rel}"
    finally:
        dp._INTERPRET[0] = False


# ---------------------------------------------------------------------------
# per-site max_dy envelope (VERDICT r3 item 1)
# ---------------------------------------------------------------------------


def test_resolve_max_dy_defaults():
    """Auto clamp radii cover the measured learned-offset envelope
    (output/offsets_hist.json dy_p99: ~22 @16^2, ~10 @32/64, <5 @128)."""
    import centerpose_tpu.ops.dcn_pallas as dp

    assert dp.resolve_max_dy(16, 16, 512, 256) == 24
    assert dp.resolve_max_dy(32, 32, 256, 256) == 12
    assert dp.resolve_max_dy(64, 64, 128, 128) == 12
    assert dp.resolve_max_dy(128, 128, 64, 64) == dp._ROWMAJOR_DY_CAP
    # explicit override wins (and is lowered to the cap at W=128)
    assert dp.resolve_max_dy(16, 16, 512, 256, max_dy=4) == 4
    assert dp.resolve_max_dy(128, 128, 64, 64, max_dy=20) == dp._ROWMAJOR_DY_CAP
    # every flagship site still takes a fused forward at its auto radius
    for cin, cout, hw in [(512, 256, 16), (256, 256, 32), (256, 128, 32),
                          (128, 128, 64), (128, 64, 64), (256, 64, 32),
                          (64, 64, 128)]:
        assert dp.pallas_supported(hw, hw, cin, cout), (cin, cout, hw)


def test_pallas_wide_band_grouped_matches_unclamped_interpret():
    """At the 16x16 site the auto radius (24) makes the clamp vacuous for
    offsets the model can realistically learn: the fused forward must match
    the UNCLAMPED XLA reference (offsets ~N(0,5) never reach |dy|=24)."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        hw, cin, cout = 16, 8, 8
        x = rand((2, hw, hw, cin), 500)
        offset = rand((2, hw, hw, 18), 501, 5.0)
        assert float(jnp.abs(offset).max()) < 24.0
        mask = jax.nn.sigmoid(rand((2, hw, hw, 9), 502))
        wgt = rand((3, 3, cin, cout), 503, 0.3)
        bias = rand((cout,), 504)
        ref = np.asarray(dcn_v2(x, offset, mask, wgt, bias))  # UNCLAMPED
        out = np.asarray(dp.dcn_v2_pallas(x, offset, mask, wgt, bias))
        rel = np.abs(ref - out).max() / max(np.abs(ref).max(), 1e-6)
        assert rel < 1e-2, f"wide-band fwd rel err {rel}"
    finally:
        dp._INTERPRET[0] = False


@pytest.mark.slow
def test_pallas_wide_band_grouped_backward_matches_unclamped_interpret():
    """Fused grouped backward at w=32 with the auto radius (12): gradients
    match UNCLAMPED XLA autodiff when offsets stay inside the envelope."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        hw, cin, cout = 32, 8, 8
        md = dp.resolve_max_dy(hw, hw, cin, cout)
        assert md == 12 and dp._grouped_bwd_ok(hw, hw, cin, cout, md)
        x = rand((1, hw, hw, cin), 510)
        offset = rand((1, hw, hw, 18), 511, 3.0)
        assert float(jnp.abs(offset).max()) < 12.0
        mask = jax.nn.sigmoid(rand((1, hw, hw, 9), 512))
        wgt = rand((3, 3, cin, cout), 513, 0.3)
        bias = rand((cout,), 514)
        _, vjp_k = jax.vjp(
            lambda *a: dp.dcn_v2_pallas(*a, 1, 1, 1, 1, True),
            x, offset, mask, wgt, bias)
        _, vjp_x = jax.vjp(
            lambda x, o, m, wt, bb: dcn_v2(x, o, m, wt, bb),  # UNCLAMPED
            x, offset, mask, wgt, bias)
        ct = rand((1, hw, hw, cout), 515)
        for name, a, b_ in zip(("dx", "doff", "dmask", "dw", "dbias"),
                               vjp_k(ct), vjp_x(ct)):
            a = np.asarray(a)
            b_ = np.asarray(b_)
            rel = np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)
            assert rel < 2e-2, f"{name} rel err {rel}"
    finally:
        dp._INTERPRET[0] = False


@pytest.mark.slow
def test_grouped_backward_compact_mode_interpret():
    """The compact (bf16 x/w storage) grouped backward — the layout that
    fits the 512->256 @16^2 site under the VMEM cap (VERDICT r3 item 8) —
    must match unclamped XLA autodiff for in-envelope offsets."""
    import centerpose_tpu.ops.dcn_pallas as dp

    # the real flagship site resolves to compact mode
    assert dp._grouped_bwd_mode(16, 16, 512, 256,
                                dp.resolve_max_dy(16, 16, 512, 256)) == "compact"

    dp._INTERPRET[0] = True
    try:
        hw, cin, cout = 16, 16, 8
        md = dp.resolve_max_dy(hw, hw, cin, cout)
        x = rand((1, hw, hw, cin), 600)
        offset = rand((1, hw, hw, 18), 601, 4.0)
        assert float(jnp.abs(offset).max()) < md
        mask = jax.nn.sigmoid(rand((1, hw, hw, 9), 602))
        wgt = rand((3, 3, cin, cout), 603, 0.3)
        ct = rand((1, hw, hw, cout), 604)

        gk = dp._dcn_pallas_grouped_bwd_impl(
            x, offset, mask, wgt, ct, max_dy=md, compact=True)
        _, vjp_x = jax.vjp(
            lambda x, o, m, wt: dcn_v2(x, o, m, wt, None),  # UNCLAMPED
            x, offset, mask, wgt)
        gx = vjp_x(ct)
        for name, a, b_ in zip(("dx", "doff", "dmask", "dw"), gk, gx):
            a = np.asarray(a)
            b_ = np.asarray(b_)
            # compact mode adds one bf16 rounding of the weights
            rel = np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)
            assert rel < 3e-2, f"{name} rel err {rel}"
    finally:
        dp._INTERPRET[0] = False


@pytest.mark.slow
def test_rowmajor_br16_fwd_and_split_backward_interpret():
    """h%16==0 W=128 sites take 16-row blocks (fwd + both split-backward
    passes); numerics must match the clamped XLA reference exactly as the
    8-row blocks do."""
    import centerpose_tpu.ops.dcn_pallas as dp

    h, w, cin, cout = 16, 128, 4, 4
    assert dp._rowmajor_br(h, w, cin, cout) == 16
    md = dp.resolve_max_dy(h, w, cin, cout)
    dp._INTERPRET[0] = True
    try:
        x = rand((1, h, w, cin), 700)
        offset = rand((1, h, w, 18), 701, 4.0)
        mask = jax.nn.sigmoid(rand((1, h, w, 9), 702))
        wgt = rand((3, 3, cin, cout), 703, 0.3)
        bias = rand((cout,), 704)

        ref = np.asarray(dcn_v2(x, _clamp_y(offset, md), mask, wgt, bias))
        out = np.asarray(dp.dcn_v2_pallas(x, offset, mask, wgt, bias))
        rel = np.abs(ref - out).max() / max(np.abs(ref).max(), 1e-6)
        assert rel < 1e-2, f"br16 fwd rel err {rel}"

        _, vjp_k = jax.vjp(
            lambda *a: dp.dcn_v2_pallas(*a, 1, 1, 1, 1, True),
            x, offset, mask, wgt, bias)
        _, vjp_x = jax.vjp(
            lambda x, o, m, wt, bb: dcn_v2(x, _clamp_y(o, md), m, wt, bb),
            x, offset, mask, wgt, bias)
        ct = rand((1, h, w, cout), 705)
        for name, a, b_ in zip(("dx", "doff", "dmask", "dw", "dbias"),
                               vjp_k(ct), vjp_x(ct)):
            a = np.asarray(a)
            b_ = np.asarray(b_)
            rel = np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)
            assert rel < 2e-2, f"br16 {name} rel err {rel}"
    finally:
        dp._INTERPRET[0] = False


# ---------------------------------------------------------------------------
# dcn_v2_pallas_fused: offset/mask conv folded into the kernel (r5)
# ---------------------------------------------------------------------------


def _fused_ref(x, omw, omb, wgt, bias, md):
    """Reference chain for the fused op: explicit XLA offset/mask conv ->
    y-clamped dcn_v2 (what the DCN module computed before the fold)."""
    om = lax.conv_general_dilated(
        x, omw, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + omb
    off = om[..., :18]
    mask = jax.nn.sigmoid(om[..., 18:])
    offc = off.reshape(*off.shape[:-1], 9, 2)
    offc = jnp.stack(
        [jnp.clip(offc[..., 0], -md, md), offc[..., 1]], -1
    ).reshape(off.shape)
    return dcn_v2(x, offc, mask, wgt, bias)


def _fused_case(seed, h, w, cin, cout, om_scale=0.3):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(2, h, w, cin)).astype(np.float32))
    omw = jnp.asarray((r.normal(size=(3, 3, cin, 27)) * om_scale)
                      .astype(np.float32))
    omb = jnp.asarray((r.normal(size=(27,)) * 1.0).astype(np.float32))
    wgt = jnp.asarray((r.normal(size=(3, 3, cin, cout)) / np.sqrt(9 * cin))
                      .astype(np.float32))
    bias = jnp.asarray(r.normal(size=(cout,)).astype(np.float32))
    return x, omw, omb, wgt, bias


def test_fused_om_rowmajor_and_chsec_interpret():
    """Fused-om forward (row-major W=128) matches the explicit conv->DCN
    chain; channel-second in/out is a pure relayout of the same values."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        h, w, cin, cout = 16, 128, 8, 8
        x, omw, omb, wgt, bias = _fused_case(200, h, w, cin, cout)
        md = dp.resolve_max_dy(h, w, cin, cout)
        assert dp.fused_om_supported(h, w, cin, cout)
        ref = np.asarray(_fused_ref(x, omw, omb, wgt, bias, md))
        out = np.asarray(dp.dcn_v2_pallas_fused(x, omw, omb, wgt, bias))
        rel = np.abs(ref - out).max() / max(np.abs(ref).max(), 1e-6)
        # bf16 om projection shifts bilinear corners at knife edges
        assert rel < 2e-2, f"fused fwd rel err {rel}"

        xc = jnp.transpose(x, (0, 1, 3, 2))
        outc = np.asarray(dp.dcn_v2_pallas_fused(
            xc, omw, omb, wgt, bias, 1, 1, 1, 1, False, 0, True, True))
        np.testing.assert_allclose(
            outc, np.transpose(out, (0, 1, 3, 2)), rtol=0, atol=0)
    finally:
        dp._INTERPRET[0] = False


def _fused_ref_st(x, omw, omb, wgt, bias, md, om_kernel):
    """Reference chain linearized AT THE KERNEL'S om values: the fused VJP
    saves the kernel's (bf16-projected) om as its residual and linearizes
    there, so the straight-through substitution om + sg(om_kernel - om)
    makes the comparison exact instead of knife-edge-flipping wherever
    bf16 rounding moves a sample across a grid line."""
    om = lax.conv_general_dilated(
        x, omw, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + omb
    om = om + jax.lax.stop_gradient(om_kernel - om)
    off = om[..., :18]
    mask = jax.nn.sigmoid(om[..., 18:])
    offc = off.reshape(*off.shape[:-1], 9, 2)
    offc = jnp.stack(
        [jnp.clip(offc[..., 0], -md, md), offc[..., 1]], -1
    ).reshape(off.shape)
    return dcn_v2(x, offc, mask, wgt, bias)


def test_fused_om_vjp_matches_reference_chain():
    """Fused VJP (saved-om residual + _bwd_core + linear_transpose conv
    chain) == autodiff of the reference chain linearized at the same om."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        h, w, cin, cout = 16, 128, 8, 8
        x, omw, omb, wgt, bias = _fused_case(201, h, w, cin, cout,
                                             om_scale=0.2)
        x = x[:1]
        md = dp.resolve_max_dy(h, w, cin, cout)
        ct = rand((1, h, w, cout), 202)
        _, om_kernel = dp._dcn_pallas_fwd_fom_impl(
            x, omw, omb, wgt, bias, md, emit_om=True)
        _, vjp_f = jax.vjp(
            lambda *a: dp.dcn_v2_pallas_fused(*a, 1, 1, 1, 1, False, 0),
            x, omw, omb, wgt, bias)
        _, vjp_r = jax.vjp(
            lambda *a: _fused_ref_st(*a, md, om_kernel), x, omw, omb, wgt,
            bias)
        for name, a, b_ in zip(("dx", "domw", "domb", "dW", "db"),
                               vjp_f(ct), vjp_r(ct)):
            a = np.asarray(a)
            b_ = np.asarray(b_)
            rel = np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)
            assert rel < 1e-5, f"fused {name} rel err {rel}"
    finally:
        dp._INTERPRET[0] = False


@pytest.mark.slow
def test_fused_om_grouped_shapes_interpret():
    """Fused-om forward across the grouped widths (16/32/64) incl. the
    cross-row lane-roll wrap of the in-kernel offset conv."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        for seed, (h, w, cin, cout) in enumerate(
            [(32, 16, 8, 8), (16, 32, 8, 8), (32, 64, 8, 8)]
        ):
            x, omw, omb, wgt, bias = _fused_case(210 + seed, h, w, cin, cout)
            md = dp.resolve_max_dy(h, w, cin, cout)
            assert dp.fused_om_supported(h, w, cin, cout), (h, w)
            ref = np.asarray(_fused_ref(x, omw, omb, wgt, bias, md))
            out = np.asarray(dp.dcn_v2_pallas_fused(x, omw, omb, wgt, bias))
            rel = np.abs(ref - out).max() / max(np.abs(ref).max(), 1e-6)
            assert rel < 2e-2, f"fused grouped rel {rel} at {(h, w)}"

            xc = jnp.transpose(x, (0, 1, 3, 2))
            outc = np.asarray(dp.dcn_v2_pallas_fused(
                xc, omw, omb, wgt, bias, 1, 1, 1, 1, False, 0, True, True))
            np.testing.assert_allclose(
                outc, np.transpose(out, (0, 1, 3, 2)), rtol=0, atol=0)
    finally:
        dp._INTERPRET[0] = False


@pytest.mark.slow
def test_fused_om_vjp_kernel_bwd_chsec_interpret():
    """kernel_bwd=True fused VJP (grouped fused backward under the om
    chain) and chsec cotangent routing."""
    import centerpose_tpu.ops.dcn_pallas as dp

    dp._INTERPRET[0] = True
    try:
        h, w, cin, cout = 32, 16, 8, 8
        x, omw, omb, wgt, bias = _fused_case(220, h, w, cin, cout,
                                             om_scale=0.2)
        x = x[:1]
        md = dp.resolve_max_dy(h, w, cin, cout)
        ct = rand((1, h, w, cout), 221)
        _, om_kernel = dp._dcn_pallas_grouped_fom_impl(
            x, omw, omb, wgt, bias, md, emit_om=True)
        _, vjp_f = jax.vjp(
            lambda *a: dp.dcn_v2_pallas_fused(*a, 1, 1, 1, 1, True, 0),
            x, omw, omb, wgt, bias)
        _, vjp_r = jax.vjp(
            lambda *a: _fused_ref_st(*a, md, om_kernel), x, omw, omb, wgt,
            bias)
        grads_f = vjp_f(ct)
        for name, a, b_ in zip(("dx", "domw", "domb", "dW", "db"),
                               grads_f, vjp_r(ct)):
            a = np.asarray(a)
            b_ = np.asarray(b_)
            rel = np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)
            assert rel < 2e-2, f"fused kbwd {name} rel err {rel}"

        # chsec: same gradients through the layout round-trip
        xc = jnp.transpose(x, (0, 1, 3, 2))
        _, vjp_c = jax.vjp(
            lambda *a: dp.dcn_v2_pallas_fused(*a, 1, 1, 1, 1, True, 0,
                                              True, True),
            xc, omw, omb, wgt, bias)
        gc = vjp_c(jnp.transpose(ct, (0, 1, 3, 2)))
        np.testing.assert_allclose(
            np.asarray(gc[0]),
            np.transpose(np.asarray(grads_f[0]), (0, 1, 3, 2)),
            rtol=1e-5, atol=1e-5)
        for a, b_ in zip(gc[1:], grads_f[1:]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-5)
    finally:
        dp._INTERPRET[0] = False
