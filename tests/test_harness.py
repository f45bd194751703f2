"""Pipelined eval harness: prefetch path must produce byte-identical results
to the serial detector.run loop, for single- and multi-scale configs."""

import numpy as np
import pytest

from centerpose_tpu.config import load_config
from centerpose_tpu.data.synthetic import SyntheticEvalDataset
from centerpose_tpu.eval.harness import evaluate_detector
from centerpose_tpu.inference.detector import Detector


@pytest.fixture(scope="module")
def detector():
    cfg = load_config(opts=[
        "model.name", "res_18", "model.input_res", "256",
        "model.output_res", "64", "test.topk", "20",
    ])
    return Detector(cfg)


def _items(n=5, seed=3):
    ds = SyntheticEvalDataset(n, seed=seed)
    return list(ds.items())


def test_prefetch_matches_serial(detector):
    items = _items()
    serial, _, _ = evaluate_detector(detector, items, workers=0)
    piped, _, _ = evaluate_detector(detector, items, workers=3, inflight=2)
    assert set(serial) == set(piped)
    for img_id in serial:
        np.testing.assert_array_equal(serial[img_id][1], piped[img_id][1])


def test_prefetch_single_worker_small_inflight(detector):
    items = _items(3, seed=4)
    serial, _, _ = evaluate_detector(detector, items, workers=0)
    piped, _, _ = evaluate_detector(detector, items, workers=1, inflight=1)
    for img_id in serial:
        np.testing.assert_array_equal(serial[img_id][1], piped[img_id][1])


def test_prefetch_empty_items(detector):
    results, times, wall = evaluate_detector(detector, [], workers=2)
    assert results == {}


def test_prefetch_to_device_propagates_errors():
    import jax

    from centerpose_tpu.data.loader import prefetch_to_device
    from centerpose_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(jax.devices()[:1])

    def bad_iter():
        yield {"input": np.zeros((1, 8, 8, 3), np.float32)}
        raise RuntimeError("encoder exploded")

    it = prefetch_to_device(bad_iter(), mesh)
    next(it)
    with pytest.raises(RuntimeError, match="encoder exploded"):
        for _ in it:
            pass


def test_prefetch_matches_serial_multiscale_flip():
    # config #4 shape: multi-scale + flip-test + soft-NMS merge
    cfg = load_config(opts=[
        "model.name", "res_18", "model.input_res", "256",
        "model.output_res", "64", "test.topk", "20",
        "test.test_scales", "0.75,1.0", "test.flip_test", "true",
    ])
    det = Detector(cfg)
    items = _items(3, seed=5)
    serial, _, _ = evaluate_detector(det, items, workers=0)
    piped, _, _ = evaluate_detector(det, items, workers=2, inflight=2)
    for img_id in serial:
        np.testing.assert_array_equal(serial[img_id][1], piped[img_id][1])


def test_run_batch_matches_single():
    cfg = load_config(opts=[
        "model.name", "res_18", "model.input_res", "256",
        "model.output_res", "64", "test.topk", "20",
    ])
    det = Detector(cfg)
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(3, 256, 256, 3)).astype(np.float32)
    batched = det.run_batch(frames)
    for i in range(3):
        single = det.run_batch(frames[i : i + 1])
        np.testing.assert_allclose(batched[i], single[0], atol=1e-5)


def test_bucketed_keepres_multiscale_matches_serial():
    """keep_res multi-scale: shapes differ per (image, scale), so the
    harness batches same-shape slots ACROSS images (shape buckets) instead
    of dispatching batch-1 per scale (r4 weak #4).  Results must match the
    serial loop (allclose: batched convs reassociate reductions at 1e-6)."""
    cfg = load_config(opts=[
        "model.name", "res_18", "model.input_res", "256",
        "model.output_res", "64", "test.topk", "20",
        "test.keep_res", "true",
        "test.test_scales", "0.5,1.0",
    ])
    det = Detector(cfg)
    items = _items(5, seed=6)
    serial, _, _ = evaluate_detector(det, items, workers=0)
    piped, _, _ = evaluate_detector(det, items, workers=2, inflight=2)
    assert set(serial) == set(piped)
    for img_id in serial:
        np.testing.assert_allclose(serial[img_id][1], piped[img_id][1],
                                   rtol=1e-4, atol=1e-4)
