"""Detector pipeline + soft-NMS + flip-remap tests."""

import numpy as np
import jax.numpy as jnp

from centerpose_tpu.config import default_config, update_config
from centerpose_tpu.inference.detector import Detector, flip_lr, flip_lr_off
from centerpose_tpu.ops.image import FLIP_IDX
from centerpose_tpu.ops.soft_nms import soft_nms_39, soft_nms_39_jit


def det_cfg(**test_overrides):
    return update_config(
        default_config(),
        {
            "model": {"name": "res_18", "input_res": 128, "output_res": 32},
            "test": dict(test_overrides),
        },
    )


def test_detector_run_end_to_end():
    cfg = det_cfg()
    det = Detector(cfg)
    img = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
    ret = det.run(img)
    res = ret["results"][1]
    assert res.shape == (100, 39)
    assert np.all(np.isfinite(res))
    # coordinates mapped back to original image scale (not the 32-grid):
    # spread of predicted boxes should exceed the grid size for random init
    for key in ("tot", "pre", "net", "post", "merge"):
        assert ret[key] >= 0


def test_detector_flip_test_batches_two():
    """Under flip_test only the ORIGINAL crosses H2D; the flipped half is
    built on device inside process() (transfer_budget: ~15 MB/s tunnel)."""
    cfg = det_cfg(flip_test=True)
    det = Detector(cfg)
    img = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
    images, meta = det.pre_process(img)
    assert images.shape == (1, 128, 128, 3)
    ret = det.run(img)
    assert ret["results"][1].shape == (100, 39)

    # the on-device flip must reproduce the reference flip-average exactly:
    # manually normalize, build the flipped half on host, run the model on
    # batch 2, average with the flip remaps, decode — and compare with the
    # detector's single-upload process() output.
    from centerpose_tpu.losses import sigmoid_clamped
    from centerpose_tpu.ops.decode import multi_pose_decode

    got = np.asarray(det._process_fn(det.variables, jnp.asarray(images)))

    mean = np.asarray(cfg.dataset.mean, np.float32)
    std = np.asarray(cfg.dataset.std, np.float32)
    norm = (images.astype(np.float32) / 255.0 - mean) / std
    batch2 = jnp.asarray(np.concatenate([norm, norm[:, :, ::-1, :]], axis=0))
    out = det.model.apply(det.variables, batch2, train=False)
    hm = sigmoid_clamped(out["hm"])
    hm_hp = sigmoid_clamped(out["hm_hp"])
    hm = (hm[:1] + hm[1:, :, ::-1, :]) / 2.0
    wh = (out["wh"][:1] + out["wh"][1:, :, ::-1, :]) / 2.0
    hps = (out["hps"][:1] + flip_lr_off(out["hps"][1:])) / 2.0
    hm_hp = (hm_hp[:1] + flip_lr(hm_hp[1:])) / 2.0
    want = np.asarray(multi_pose_decode(
        hm, wh, hps, out["reg"][:1], hm_hp, out["hp_offset"][:1], k=100))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_detector_multi_scale_merge():
    cfg = det_cfg(test_scales=(0.75, 1.0))
    det = Detector(cfg)
    img = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
    ret = det.run(img)
    assert ret["results"][1].shape[0] <= 100
    assert np.all(np.isfinite(ret["results"][1]))


def test_detector_keep_res_pads_to_32():
    cfg = det_cfg(keep_res=True)
    det = Detector(cfg)
    img = np.zeros((100, 130, 3), np.uint8)
    images, meta = det.pre_process(img)
    assert images.shape[1] % 32 == 0 and images.shape[2] % 32 == 0


def test_flip_lr_swaps_channels_and_width():
    x = np.zeros((1, 4, 4, 17), np.float32)
    x[0, 1, 0, 1] = 7.0  # left-eye channel, left edge
    y = np.asarray(flip_lr(jnp.asarray(x)))
    # after flip: appears in right-eye channel at right edge
    assert y[0, 1, 3, 2] == 7.0
    assert y.sum() == 7.0


def test_flip_lr_off_negates_x_and_swaps():
    x = np.zeros((1, 2, 2, 34), np.float32)
    # joint 1 (left eye) offset (dx=3, dy=5) at pixel (0, 0)
    x[0, 0, 0, 2] = 3.0
    x[0, 0, 0, 3] = 5.0
    y = np.asarray(flip_lr_off(jnp.asarray(x)))
    # now at flipped W position (0, 1), joint 2 (right eye), dx negated
    assert y[0, 0, 1, 4] == -3.0
    assert y[0, 0, 1, 5] == 5.0


def test_soft_nms_39_decays_overlaps():
    dets = np.zeros((3, 39), np.float32)
    dets[0, :5] = [0, 0, 10, 10, 0.9]
    dets[1, :5] = [1, 1, 11, 11, 0.8]  # heavy overlap with 0
    dets[2, :5] = [50, 50, 60, 60, 0.7]  # disjoint
    out = soft_nms_39(dets, method=2)
    assert out[0, 4] == 0.9
    # overlapping det decayed below its original score
    row1 = out[np.argmin(np.abs(out[:, 0] - 1.0))]
    assert row1[4] < 0.8
    # disjoint det untouched
    row2 = out[np.argmin(np.abs(out[:, 0] - 50.0))]
    assert row2[4] == np.float32(0.7)


def test_soft_nms_hard_method_removes():
    dets = np.zeros((2, 39), np.float32)
    dets[0, :5] = [0, 0, 10, 10, 0.9]
    dets[1, :5] = [0, 0, 10, 10, 0.8]  # identical box
    out = soft_nms_39(dets, method=0, nt=0.5)
    assert out.shape[0] == 1


def test_soft_nms_jit_matches_host_decay():
    rng = np.random.default_rng(0)
    dets = np.zeros((8, 39), np.float32)
    for i in range(8):
        x, y = rng.uniform(0, 50, 2)
        w, h = rng.uniform(5, 20, 2)
        dets[i, :5] = [x, y, x + w, y + h, rng.uniform(0.1, 1.0)]
    host = soft_nms_39(dets, method=2, thresh=0.0)
    dev = np.asarray(soft_nms_39_jit(jnp.asarray(dets), thresh=0.0))
    # compare final score per (x1) identity
    host_by_x = {round(float(r[0]), 3): float(r[4]) for r in host}
    for r in dev:
        key = round(float(r[0]), 3)
        if key in host_by_x:
            np.testing.assert_allclose(r[4], host_by_x[key], rtol=1e-4)
