"""Parity tests: native C++ soft-NMS / encoder vs the numpy reference paths."""

import numpy as np
import pytest

from centerpose_tpu import native
from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.data.encode import encode_example
from centerpose_tpu.ops.soft_nms import soft_nms_39_numpy

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def random_dets(rng, n):
    xy = rng.uniform(0, 100, size=(n, 2))
    wh = rng.uniform(5, 60, size=(n, 2))
    dets = np.zeros((n, 39), np.float32)
    dets[:, 0:2] = xy
    dets[:, 2:4] = xy + wh
    dets[:, 4] = rng.uniform(0, 1, size=n)
    dets[:, 5:] = rng.normal(size=(n, 34))
    return dets


@pytest.mark.parametrize("method", [0, 1, 2])
def test_soft_nms_native_matches_numpy(rng, method):
    for trial in range(5):
        dets = random_dets(rng, 60)
        ref = soft_nms_39_numpy(dets, method=method).astype(np.float32)
        out = native.soft_nms_39_native(dets, method=method)
        assert out is not None
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_soft_nms_native_empty():
    out = native.soft_nms_39_native(np.zeros((0, 39), np.float32))
    assert out is not None and out.shape[0] == 0


def _synthetic_sample(rng, n_people=4):
    img = (rng.uniform(0, 255, size=(480, 640, 3))).astype(np.uint8)
    anns = []
    for _ in range(n_people):
        x, y = rng.uniform(0, 400), rng.uniform(0, 300)
        w, h = rng.uniform(30, 200), rng.uniform(40, 170)
        kps = []
        for _j in range(17):
            v = int(rng.integers(0, 3))
            kps += [float(x + rng.uniform(0, w)), float(y + rng.uniform(0, h)), v]
        anns.append({"bbox": [x, y, w, h], "keypoints": kps})
    return img, anns


def test_encoder_native_matches_python(rng, monkeypatch):
    cfg = default_config()
    for trial in range(4):
        img, anns = _synthetic_sample(rng, n_people=3 + trial)
        seed = 1000 + trial
        # same augmentation randomness for both paths
        out_native = encode_example(
            img, anns, cfg, rng=np.random.default_rng(seed), is_train=True
        )
        monkeypatch.setattr(native, "available", lambda: False)
        out_py = encode_example(
            img, anns, cfg, rng=np.random.default_rng(seed), is_train=True
        )
        monkeypatch.undo()
        for key in ("hm", "hm_hp", "wh", "hps", "reg", "reg_mask",
                    "hps_mask", "hp_offset", "hp_mask"):
            np.testing.assert_allclose(
                out_native[key], out_py[key], rtol=1e-5, atol=1e-5,
                err_msg=f"{key} mismatch (trial {trial})",
            )
        for key in ("ind", "hp_ind"):
            np.testing.assert_array_equal(out_native[key], out_py[key])


def test_encoder_native_eval_mode(rng, monkeypatch):
    cfg = default_config()
    img, anns = _synthetic_sample(rng)
    out_native = encode_example(img, anns, cfg, is_train=False)
    monkeypatch.setattr(native, "available", lambda: False)
    out_py = encode_example(img, anns, cfg, is_train=False)
    monkeypatch.undo()
    np.testing.assert_allclose(out_native["hm"], out_py["hm"], atol=1e-5)
    np.testing.assert_allclose(out_native["hm_hp"], out_py["hm_hp"], atol=1e-5)
    np.testing.assert_array_equal(out_native["ind"], out_py["ind"])
