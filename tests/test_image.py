"""Golden tests for geometry + gaussian utilities (SURVEY.md §4)."""

import numpy as np
import pytest

from centerpose_tpu.ops.image import (
    affine_transform,
    affine_transform_batch,
    draw_umich_gaussian,
    flip_joints,
    gaussian2d,
    gaussian_radius,
    get_affine_transform,
    transform_preds,
)


def test_affine_identity_roundtrip():
    c = np.array([320.0, 240.0])
    s = 640.0
    t = get_affine_transform(c, s, 0.0, (512, 512))
    t_inv = get_affine_transform(c, s, 0.0, (512, 512), inv=True)
    pts = np.array([[100.0, 50.0], [320.0, 240.0], [0.0, 0.0]])
    warped = affine_transform_batch(pts, t)
    back = affine_transform_batch(warped, t_inv)
    np.testing.assert_allclose(back, pts, atol=1e-2)


def test_affine_center_maps_to_center():
    c = np.array([100.0, 200.0])
    t = get_affine_transform(c, 400.0, 0.0, (128, 128))
    out = affine_transform(c, t)
    np.testing.assert_allclose(out, [64.0, 64.0], atol=1e-4)


def test_affine_scale():
    # A crop of side s maps to output side: point at center + s/2 in x lands
    # at the right edge.
    c = np.array([0.0, 0.0])
    s = 200.0
    t = get_affine_transform(c, s, 0.0, (100, 100))
    out = affine_transform(np.array([100.0, 0.0]), t)
    np.testing.assert_allclose(out, [100.0, 50.0], atol=1e-3)


def test_affine_rotation():
    c = np.array([50.0, 50.0])
    t = get_affine_transform(c, 100.0, 90.0, (100, 100))
    # 90° rotation: a point directly above the center maps to a horizontal
    # offset (left edge midpoint, per the reference's rotation convention).
    out = affine_transform(np.array([50.0, 0.0]), t)
    np.testing.assert_allclose(out, [0.0, 50.0], atol=1e-3)
    # and rotating by 0 keeps it at the top edge midpoint
    t0 = get_affine_transform(c, 100.0, 0.0, (100, 100))
    out0 = affine_transform(np.array([50.0, 0.0]), t0)
    np.testing.assert_allclose(out0, [50.0, 0.0], atol=1e-3)


def test_transform_preds_inverse_of_forward():
    c = np.array([333.0, 111.0])
    s = 500.0
    fwd = get_affine_transform(c, s, 0.0, (128, 128))
    pts = np.array([[10.0, 20.0], [500.0, 400.0]])
    grid = affine_transform_batch(pts, fwd)
    back = transform_preds(grid, c, s, (128, 128))
    np.testing.assert_allclose(back, pts, atol=1e-2)


def test_gaussian_radius_known_values():
    # Large boxes -> larger radii; exact values pinned from the 3-case
    # quadratic formula at min_overlap=0.7.
    r = gaussian_radius((10, 10))
    assert 2.0 < r < 4.0
    r_big = gaussian_radius((100, 100))
    assert r_big > r
    # Degenerate tiny box
    assert gaussian_radius((1, 1)) >= 0.0


def test_gaussian2d_peak_is_one():
    g = gaussian2d((7, 7), sigma=7 / 6.0)
    assert g[3, 3] == pytest.approx(1.0)
    assert g[0, 0] < g[3, 3]
    # Symmetry
    np.testing.assert_allclose(g, g.T)
    np.testing.assert_allclose(g, g[::-1, ::-1])


def test_draw_umich_gaussian_max_composite():
    hm = np.zeros((32, 32), np.float32)
    draw_umich_gaussian(hm, (10, 10), 3)
    assert hm[10, 10] == pytest.approx(1.0)
    peak_neighborhood = hm[8:13, 8:13].copy()
    # Second splat nearby must max-compose, not overwrite.
    draw_umich_gaussian(hm, (12, 10), 3)
    assert hm[10, 12] == pytest.approx(1.0)
    assert hm[10, 10] == pytest.approx(1.0)  # old peak survives
    assert np.all(hm[8:13, 8:13] >= peak_neighborhood - 1e-6)


def test_draw_umich_gaussian_border_clipping():
    hm = np.zeros((16, 16), np.float32)
    draw_umich_gaussian(hm, (0, 0), 5)  # corner — must not raise
    assert hm[0, 0] == pytest.approx(1.0)
    draw_umich_gaussian(hm, (15, 15), 5)
    assert hm[15, 15] == pytest.approx(1.0)


def test_flip_joints_swaps_lr():
    pts = np.zeros((17, 2), np.float32)
    pts[1] = [10.0, 5.0]  # left eye
    pts[2] = [20.0, 5.0]  # right eye
    out = flip_joints(pts, width=100)
    # left eye slot now holds the flipped right eye
    np.testing.assert_allclose(out[1], [100 - 20 - 1, 5.0])
    np.testing.assert_allclose(out[2], [100 - 10 - 1, 5.0])
