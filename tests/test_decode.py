"""Golden tests for on-device NMS/top-k/decode vs hand-built heatmaps."""

import numpy as np
import jax.numpy as jnp

from centerpose_tpu.ops.decode import multi_pose_decode
from centerpose_tpu.ops.nms import heat_nms, topk, topk_channel, gather_feat_hw


def test_heat_nms_keeps_only_local_maxima():
    h = np.zeros((1, 8, 8, 1), np.float32)
    h[0, 2, 2, 0] = 0.9
    h[0, 2, 3, 0] = 0.5  # adjacent, suppressed
    h[0, 6, 6, 0] = 0.7  # far, kept
    out = np.asarray(heat_nms(jnp.asarray(h)))
    assert out[0, 2, 2, 0] == 0.9
    assert out[0, 2, 3, 0] == 0.0
    assert out[0, 6, 6, 0] == 0.7


def test_topk_matches_numpy_argsort():
    rng = np.random.default_rng(0)
    h = rng.random((2, 16, 16, 1)).astype(np.float32)
    scores, inds, clses, ys, xs = topk(jnp.asarray(h), 5)
    for b in range(2):
        flat = h[b, :, :, 0].ravel()
        ref_inds = np.argsort(-flat)[:5]
        np.testing.assert_array_equal(np.asarray(inds)[b], ref_inds)
        np.testing.assert_allclose(np.asarray(scores)[b], flat[ref_inds], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ys)[b], ref_inds // 16)
        np.testing.assert_array_equal(np.asarray(xs)[b], ref_inds % 16)


def test_topk_channel_per_joint():
    h = np.zeros((1, 8, 8, 2), np.float32)
    h[0, 1, 2, 0] = 0.8
    h[0, 5, 6, 1] = 0.6
    scores, inds, ys, xs = topk_channel(jnp.asarray(h), 3)
    assert np.asarray(scores)[0, 0, 0] == np.float32(0.8)
    assert (np.asarray(ys)[0, 0, 0], np.asarray(xs)[0, 0, 0]) == (1, 2)
    assert np.asarray(scores)[0, 1, 0] == np.float32(0.6)
    assert (np.asarray(ys)[0, 1, 0], np.asarray(xs)[0, 1, 0]) == (5, 6)


def test_gather_feat_hw():
    f = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    ind = np.array([[5, 0], [15, 7]], np.int32)
    out = np.asarray(gather_feat_hw(jnp.asarray(f), jnp.asarray(ind)))
    np.testing.assert_array_equal(out[0, 0], f[0].reshape(16, 3)[5])
    np.testing.assert_array_equal(out[1, 0], f[1].reshape(16, 3)[15])


def _build_synthetic_scene(two_person=True):
    """Two people on a 32x32 grid with known centers/joints (J=2 for brevity
    of construction; decode is J-generic)."""
    H = W = 32
    J = 2
    hm = np.zeros((1, H, W, 1), np.float32)
    wh = np.zeros((1, H, W, 2), np.float32)
    kps = np.zeros((1, H, W, 2 * J), np.float32)
    reg = np.zeros((1, H, W, 2), np.float32)
    hm_hp = np.zeros((1, H, W, J), np.float32)
    hp_offset = np.zeros((1, H, W, 2), np.float32)

    people = [
        dict(ct=(8, 8), wh=(8, 10), joints=[(7, 6), (9, 10)], score=0.9),
    ]
    if two_person:
        people.append(
            dict(ct=(24, 20), wh=(6, 8), joints=[(23, 18), (25, 22)], score=0.7)
        )

    for p in people:
        cx, cy = p["ct"]
        hm[0, cy, cx, 0] = p["score"]
        wh[0, cy, cx] = p["wh"]
        for j, (jx, jy) in enumerate(p["joints"]):
            kps[0, cy, cx, 2 * j : 2 * j + 2] = [jx - cx, jy - cy]
            # put a confident peak exactly at the joint
            hm_hp[0, jy, jx, j] = max(hm_hp[0, jy, jx, j], 0.8)
    return hm, wh, kps, reg, hm_hp, hp_offset, people


def test_decode_two_person_grouping():
    hm, wh, kps, reg, hm_hp, hp_offset, people = _build_synthetic_scene()
    dets = np.asarray(
        multi_pose_decode(
            jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(kps),
            jnp.asarray(reg), jnp.asarray(hm_hp), jnp.asarray(hp_offset), k=4,
        )
    )
    assert dets.shape == (1, 4, 4 + 1 + 4 + 1)
    # Detection 0 = highest score person
    d0 = dets[0, 0]
    assert d0[4] == np.float32(0.9)
    cx, cy = people[0]["ct"]
    w_, h_ = people[0]["wh"]
    np.testing.assert_allclose(d0[0:4], [cx - w_ / 2, cy - h_ / 2, cx + w_ / 2, cy + h_ / 2], atol=1e-4)
    # Joints snapped exactly to their heatmap peaks
    np.testing.assert_allclose(d0[5:9], np.array(people[0]["joints"]).ravel(), atol=1e-4)
    # Detection 1 = second person, with ITS joints (grouping correct)
    d1 = dets[0, 1]
    assert d1[4] == np.float32(0.7)
    np.testing.assert_allclose(d1[5:9], np.array(people[1]["joints"]).ravel(), atol=1e-4)


def test_decode_low_conf_peak_keeps_regression():
    hm, wh, kps, reg, hm_hp, hp_offset, people = _build_synthetic_scene(
        two_person=False
    )
    # Drop the joint-0 peak below thresh: decode must fall back to the
    # regressed location (here exact since kps encodes it).
    jx, jy = people[0]["joints"][0]
    hm_hp[0, jy, jx, 0] = 0.05
    dets = np.asarray(
        multi_pose_decode(
            jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(kps),
            jnp.asarray(reg), jnp.asarray(hm_hp), jnp.asarray(hp_offset), k=4,
        )
    )
    np.testing.assert_allclose(dets[0, 0, 5:7], [jx, jy], atol=1e-4)


def test_decode_peak_outside_bbox_rejected():
    hm, wh, kps, reg, hm_hp, hp_offset, people = _build_synthetic_scene(
        two_person=False
    )
    # Plant a strong spurious peak far outside the person's box.
    hm_hp[0, 30, 30, 0] = 0.99
    dets = np.asarray(
        multi_pose_decode(
            jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(kps),
            jnp.asarray(reg), jnp.asarray(hm_hp), jnp.asarray(hp_offset), k=4,
        )
    )
    # joint 0 must NOT be at (30, 30)
    assert not np.allclose(dets[0, 0, 5:7], [30, 30], atol=1.0)
    # it stays at the true joint (in-box peak still matches)
    np.testing.assert_allclose(
        dets[0, 0, 5:7], people[0]["joints"][0], atol=1e-4
    )


def test_decode_subpixel_offsets():
    hm, wh, kps, reg, hm_hp, hp_offset, people = _build_synthetic_scene(
        two_person=False
    )
    cx, cy = people[0]["ct"]
    reg[0, cy, cx] = [0.3, 0.4]
    jx, jy = people[0]["joints"][0]
    hp_offset[0, jy, jx] = [0.25, -0.25]
    dets = np.asarray(
        multi_pose_decode(
            jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(kps),
            jnp.asarray(reg), jnp.asarray(hm_hp), jnp.asarray(hp_offset), k=4,
        )
    )
    w_, h_ = people[0]["wh"]
    np.testing.assert_allclose(
        dets[0, 0, 0:2], [cx + 0.3 - w_ / 2, cy + 0.4 - h_ / 2], atol=1e-5
    )
    np.testing.assert_allclose(dets[0, 0, 5:7], [jx + 0.25, jy - 0.25], atol=1e-5)


def test_decode_jits_with_fixed_shapes():
    import jax

    hm, wh, kps, reg, hm_hp, hp_offset, _ = _build_synthetic_scene()
    f = jax.jit(lambda *a: multi_pose_decode(*a, k=4))
    out1 = f(
        jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(kps),
        jnp.asarray(reg), jnp.asarray(hm_hp), jnp.asarray(hp_offset),
    )
    assert out1.shape == (1, 4, 10)
