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
