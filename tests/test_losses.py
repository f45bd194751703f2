"""Golden tests for focal / masked-L1 losses vs hand-computed numpy values."""

import numpy as np
import jax.numpy as jnp

from centerpose_tpu.config import default_config
from centerpose_tpu.losses import (
    focal_loss,
    multi_pose_loss,
    reg_l1_loss,
    reg_weighted_l1_loss,
    sigmoid_clamped,
)


def test_focal_loss_single_positive():
    gt = np.zeros((1, 4, 4, 1), np.float32)
    gt[0, 1, 1, 0] = 1.0
    pred = np.full((1, 4, 4, 1), 0.5, np.float32)
    # hand-computed: pos = log(.5)*(1-.5)^2 at the peak; neg: (1-0)^4 *
    # .25*log(.5) at 15 cells; num_pos=1
    pos = np.log(0.5) * 0.25
    neg = 15 * 0.25 * np.log(0.5)
    expected = -(pos + neg) / 1.0
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_focal_loss_penalty_reduction():
    # A gaussian-valued (non-1) gt cell reduces the negative penalty by
    # (1-gt)^4.
    gt = np.zeros((1, 2, 2, 1), np.float32)
    gt[0, 0, 0, 0] = 1.0
    gt[0, 0, 1, 0] = 0.9  # near-peak cell
    pred = np.full((1, 2, 2, 1), 0.5, np.float32)
    pos = np.log(0.5) * 0.25
    neg_weighted = (1 - 0.9) ** 4 * 0.25 * np.log(0.5)
    neg_plain = 2 * 0.25 * np.log(0.5)
    expected = -(pos + neg_weighted + neg_plain)
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_focal_loss_no_positives():
    gt = np.zeros((1, 2, 2, 1), np.float32)
    pred = np.full((1, 2, 2, 1), 0.1, np.float32)
    expected = -4 * (0.1 ** 2) * np.log(0.9)
    got = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_reg_l1_loss_golden():
    out = np.zeros((1, 4, 4, 2), np.float32)
    out[0, 2, 1, :] = [3.0, 4.0]  # cell (y=2, x=1) -> flat ind 9
    ind = np.array([[9, 0]], np.int32)
    mask = np.array([[1.0, 0.0]], np.float32)
    target = np.array([[[1.0, 2.0], [100.0, 100.0]]], np.float32)
    # |3-1| + |4-2| = 4, mask.sum (broadcast over 2 ch) = 2
    expected = 4.0 / (2.0 + 1e-4)
    got = float(
        reg_l1_loss(jnp.asarray(out), jnp.asarray(mask), jnp.asarray(ind), jnp.asarray(target))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_reg_weighted_l1_loss_per_coordinate_mask():
    out = np.zeros((1, 2, 2, 4), np.float32)
    out[0, 0, 0, :] = [1.0, 2.0, 3.0, 4.0]
    ind = np.array([[0]], np.int32)
    mask = np.array([[[1.0, 1.0, 0.0, 0.0]]], np.float32)  # only joint 0
    target = np.array([[[0.0, 0.0, 0.0, 0.0]]], np.float32)
    expected = (1.0 + 2.0) / (2.0 + 1e-4)
    got = float(
        reg_weighted_l1_loss(
            jnp.asarray(out), jnp.asarray(mask), jnp.asarray(ind), jnp.asarray(target)
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_multi_pose_loss_combines_heads():
    cfg = default_config()
    b, r, j, k = 2, 8, 17, 32
    rng = np.random.default_rng(0)
    outputs = {
        "hm": jnp.asarray(rng.normal(size=(b, r, r, 1)), jnp.float32),
        "wh": jnp.zeros((b, r, r, 2), jnp.float32),
        "hps": jnp.zeros((b, r, r, 2 * j), jnp.float32),
        "reg": jnp.zeros((b, r, r, 2), jnp.float32),
        "hm_hp": jnp.asarray(rng.normal(size=(b, r, r, j)), jnp.float32),
        "hp_offset": jnp.zeros((b, r, r, 2), jnp.float32),
    }
    hm = np.zeros((b, r, r, 1), np.float32)
    hm[0, 3, 3, 0] = 1.0
    batch = {
        "hm": jnp.asarray(hm),
        "hm_hp": jnp.zeros((b, r, r, j), jnp.float32),
        "wh": jnp.ones((b, k, 2), jnp.float32),
        "hps": jnp.zeros((b, k, 2 * j), jnp.float32),
        "reg": jnp.zeros((b, k, 2), jnp.float32),
        "ind": jnp.zeros((b, k), jnp.int32),
        "reg_mask": jnp.zeros((b, k), jnp.float32),
        "hps_mask": jnp.zeros((b, k, 2 * j), jnp.float32),
        "hp_offset": jnp.zeros((b, k * j, 2), jnp.float32),
        "hp_ind": jnp.zeros((b, k * j), jnp.int32),
        "hp_mask": jnp.zeros((b, k * j), jnp.float32),
    }
    total, stats = multi_pose_loss(outputs, batch, cfg)
    assert np.isfinite(float(total))
    # All-zero masks: regression losses ~0, total ≈ hm + hm_hp focal terms.
    np.testing.assert_allclose(
        float(total),
        float(stats["hm_loss"]) + float(stats["hm_hp_loss"]),
        rtol=1e-4,
    )
    for k_, v in stats.items():
        assert np.isfinite(float(v)), k_


def test_sigmoid_clamped_range():
    x = jnp.asarray([-100.0, 0.0, 100.0])
    y = np.asarray(sigmoid_clamped(x))
    assert y[0] == 1e-4 and y[2] == 1.0 - 1e-4 and abs(y[1] - 0.5) < 1e-6
