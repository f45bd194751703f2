"""Tests for the GT encoder (SURVEY.md §2 #5 semantics)."""

import numpy as np

from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.data.encode import encode_example, stack_batch


def small_cfg():
    return update_config(
        default_config(),
        {"model": {"input_res": 128, "output_res": 32}},
    )


def person_ann(x, y, w, h, joints):
    """joints: list of (jx, jy) visible keypoints, indices 0..16 in order."""
    kp = []
    for j in range(17):
        if j < len(joints):
            kp += [joints[j][0], joints[j][1], 2]
        else:
            kp += [0, 0, 0]
    return {"bbox": [x, y, w, h], "keypoints": kp}


def test_encode_shapes():
    cfg = small_cfg()
    img = np.zeros((240, 320, 3), np.uint8)
    ann = person_ann(100, 80, 60, 120, [(130, 100), (125, 95), (135, 95)])
    out = encode_example(img, [ann], cfg, np.random.default_rng(0), is_train=False)
    assert out["input"].shape == (128, 128, 3)
    assert out["hm"].shape == (32, 32, 1)
    assert out["hm_hp"].shape == (32, 32, 17)
    assert out["wh"].shape == (32, 2)
    assert out["hps"].shape == (32, 34)
    assert out["ind"].shape == (32,)
    assert out["hp_ind"].shape == (32 * 17,)
    assert out["hp_offset"].shape == (32 * 17, 2)


def test_encode_center_peak_and_ind_consistency():
    cfg = small_cfg()
    img = np.zeros((256, 256, 3), np.uint8)
    # Person centered at (128, 128) in a 256 image -> grid center (16, 16).
    ann = person_ann(96, 96, 64, 64, [(128, 128)])
    out = encode_example(img, [ann], cfg, is_train=False)
    assert out["reg_mask"][0] == 1.0
    ind = int(out["ind"][0])
    y, x = divmod(ind, 32)
    assert out["hm"][y, x, 0] == 1.0  # exact peak at the indexed cell
    # wh recorded in output-grid units: 64 px / stride 8 (256->32) = 8.
    np.testing.assert_allclose(out["wh"][0], [8.0, 8.0], atol=0.1)
    # reg is the sub-pixel remainder, in [0, 1).
    assert 0.0 <= out["reg"][0, 0] < 1.0
    # Joint 0 at the person center: hps displacement ~0, hm_hp peak at cell.
    assert out["hps_mask"][0, 0] == 1.0
    assert abs(out["hps"][0, 0]) < 1.0
    hp_ind = int(out["hp_ind"][0])
    jy, jx = divmod(hp_ind, 32)
    assert out["hm_hp"][jy, jx, 0] == 1.0


def test_encode_no_visible_joints_suppresses_regression():
    cfg = small_cfg()
    img = np.zeros((256, 256, 3), np.uint8)
    ann = person_ann(96, 96, 64, 64, [])  # no visible keypoints
    out = encode_example(img, [ann], cfg, is_train=False)
    # Regression to this person is masked out...
    assert out["reg_mask"][0] == 0.0
    assert out["hps_mask"][0].sum() == 0.0
    # ...but the center gaussian is still drawn (reference draws it after the
    # 0.9999 sentinel write, max-compositing the peak back to 1.0).
    ind = int(out["ind"][0])
    y, x = divmod(ind, 32)
    assert out["hm"][y, x, 0] == 1.0


def test_encode_train_determinism_per_seed():
    cfg = small_cfg()
    img = (np.arange(256 * 256 * 3) % 255).astype(np.uint8).reshape(256, 256, 3)
    ann = person_ann(50, 50, 100, 150, [(100, 100), (90, 80)])
    a = encode_example(img, [ann], cfg, np.random.default_rng(7), is_train=True)
    b = encode_example(img, [ann], cfg, np.random.default_rng(7), is_train=True)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_stack_batch():
    cfg = small_cfg()
    img = np.zeros((128, 128, 3), np.uint8)
    ann = person_ann(30, 30, 60, 60, [(60, 60)])
    ex = [
        encode_example(img, [ann], cfg, np.random.default_rng(i), is_train=True)
        for i in range(3)
    ]
    batch = stack_batch(ex)
    assert batch["input"].shape == (3, 128, 128, 3)
    assert batch["hm"].shape == (3, 32, 32, 1)


# ---------------------------------------------------------------------------
# Compact H2D wire format (train.wire = "compact"): uint8 pre-aug warp +
# device-replayed color aug + f16 dense targets (trainer.unpack_batch).
# ---------------------------------------------------------------------------


def compact_cfg():
    return update_config(
        default_config(),
        {"model": {"input_res": 128, "output_res": 32},
         "train": {"wire": "compact"}},
    )


def _rand_scene(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    ann = person_ann(100, 80, 60, 120, [(130, 100), (125, 95), (135, 95)])
    return img, [ann]


def test_compact_wire_dtypes_and_sizes():
    img, anns = _rand_scene(0)
    out = encode_example(img, anns, compact_cfg(), np.random.default_rng(0),
                         is_train=True)
    assert out["input"].dtype == np.uint8
    assert out["hm"].dtype == np.float16
    assert out["hm_hp"].dtype == np.float16
    assert out["aug"].shape == (6,)
    ref = encode_example(img, anns, small_cfg(), np.random.default_rng(0),
                         is_train=True)
    nb = lambda d: sum(v.nbytes for v in d.values())
    assert nb(out) < nb(ref) / 2.5  # the point of the format


def test_compact_wire_aug_coeffs_replay_color_aug():
    """color_aug_coeffs replays color_aug exactly on the same rng stream."""
    from centerpose_tpu.ops.image import color_aug, color_aug_coeffs

    img = np.random.default_rng(7).random((64, 64, 3)).astype(np.float32)
    direct = color_aug(np.random.default_rng(3), img.copy())
    co = color_aug_coeffs(np.random.default_rng(3))
    gs = img @ np.array([0.299, 0.587, 0.114], np.float32)
    replay = co[0] * img + co[1] * gs[..., None] + co[2] * gs.mean() + co[3:6]
    np.testing.assert_allclose(direct, replay, atol=1e-5)


def test_compact_wire_unpack_matches_f32_wire():
    """Device-side unpack of a compact batch == the f32 wire batch (the cv2
    uint8 warp is the quantization point in BOTH paths, so identical up to
    f16 target rounding)."""
    import jax.numpy as jnp

    from centerpose_tpu.train.trainer import unpack_batch

    cfg_c, cfg_f = compact_cfg(), small_cfg()
    encs_c, encs_f = [], []
    for i in range(3):
        img, anns = _rand_scene(i)
        encs_c.append(encode_example(img, anns, cfg_c,
                                     np.random.default_rng(i), is_train=True))
        encs_f.append(encode_example(img, anns, cfg_f,
                                     np.random.default_rng(i), is_train=True))
    bc, bf = stack_batch(encs_c), stack_batch(encs_f)
    u = unpack_batch({k: jnp.asarray(v) for k, v in bc.items()}, cfg_c)
    assert "aug" not in u
    np.testing.assert_allclose(np.asarray(u["input"]), bf["input"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(u["hm_hp"]), bf["hm_hp"], atol=6e-4)
    np.testing.assert_allclose(np.asarray(u["hm"]), bf["hm"], atol=6e-4)
    for k in ("wh", "hps", "reg", "ind", "reg_mask"):
        np.testing.assert_array_equal(np.asarray(u[k]), bf[k])


def test_compact_wire_eval_identity_aug():
    """is_train=False compact batches carry identity aug and decode exactly."""
    import jax.numpy as jnp

    from centerpose_tpu.train.trainer import unpack_batch

    img, anns = _rand_scene(5)
    ec = encode_example(img, anns, compact_cfg(), is_train=False)
    ef = encode_example(img, anns, small_cfg(), is_train=False)
    np.testing.assert_array_equal(ec["aug"], [1, 0, 0, 0, 0, 0])
    u = unpack_batch({k: jnp.asarray(v)[None] for k, v in ec.items()},
                     compact_cfg())
    np.testing.assert_allclose(np.asarray(u["input"][0]), ef["input"],
                               atol=1e-6)
