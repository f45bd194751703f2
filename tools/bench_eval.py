#!/usr/bin/env python
"""Graded eval-path benchmarks on the real chip (VERDICT r2 item 6):

1. hrnet_w32 multi-scale (0.75/1/1.25) flip-test eval through the pipelined
   harness (BASELINE config #4; reference tools/evaluate.py multi-scale
   test, SURVEY.md §3.4) — images/s, per-stage times, pipelined-vs-serial.
2. mobilenetv3 batched video streaming via ``Detector.run_batch``
   (BASELINE config #5; reference demo.py frame loop, SURVEY.md §3.5).

Rows merge into output/bench_table.json (same schema as bench_suite).

  python tools/bench_eval.py [--images 48] [--frames 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def tunnel_h2d_MBps(reps: int = 3, mb: int = 8) -> float:
    """Instantaneous tunnel H2D rate, recorded alongside every transfer-
    bound row: this sandbox's TPU link is a shared tunnel whose rate swings
    ~4-60 MB/s between sessions, so absolute img/s for video/eval rows is
    tunnel weather unless normalized (output/transfer_budget.json)."""
    import jax
    import jax.numpy as jnp

    rates = []
    for r in range(reps):
        a = np.random.default_rng(r).integers(
            0, 255, size=(mb << 20,), dtype=np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(a)
        np.asarray(jnp.sum(d[:: 1 << 20].astype(jnp.int32)))
        rates.append(mb / (time.perf_counter() - t0))
    return round(max(rates), 1)


def bench_msflip_eval(n_images: int):
    from centerpose_tpu.config import load_config
    from centerpose_tpu.data.synthetic import SyntheticEvalDataset
    from centerpose_tpu.eval.harness import evaluate_detector
    from centerpose_tpu.inference.detector import Detector

    cfg = load_config(opts=[
        "model.name", "hrnet_w32", "model.head_conv", "256",
        "model.compute_dtype", "bfloat16",
        "test.flip_test", "true",
        "test.test_scales", "0.75,1.0,1.25",
    ])
    det = Detector(cfg)
    ds = SyntheticEvalDataset(n_images, seed=2)

    # warm-up / compile (all three scale graphs + flip batches)
    evaluate_detector(det, list(ds.items())[:2], workers=2)

    rows = []
    for workers, label in ((0, "serial"), (4, "pipelined")):
        t0 = time.perf_counter()
        results, times, wall = evaluate_detector(det, ds.items(),
                                                 workers=workers)
        dt = time.perf_counter() - t0
        row = {
            "arch": "hrnet_w32", "variant": f"bfloat16/{label}",
            "mode": "eval_msflip", "batch": 1,
            "ms_per_batch": round(dt / n_images * 1e3, 2),
            "images_per_s": round(n_images / dt, 2),
            "stage_times_s": {k: round(v, 2) for k, v in times.items()},
            "tunnel_h2d_MBps": tunnel_h2d_MBps(),
            "h2d_bytes_per_image": 3 * 512 * 512 * 3,  # 3 scales, no flip
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def bench_video(frames: int, batch: int = 8):
    from centerpose_tpu.config import load_config
    from centerpose_tpu.inference.detector import Detector

    cfg = load_config(opts=[
        "model.name", "mobilenetv3", "model.compute_dtype", "bfloat16",
    ])
    det = Detector(cfg)
    res = cfg.model.input_res
    rng = np.random.default_rng(0)
    stream = rng.integers(0, 255, size=(frames, res, res, 3)).astype(np.uint8)

    det.run_batch(stream[:batch])  # compile
    t0 = time.perf_counter()
    out = None
    for s in range(0, frames, batch):
        out = det.run_batch(stream[s:s + batch])
    assert out is not None and np.isfinite(out).all()
    dt = time.perf_counter() - t0
    row = {
        "arch": "mobilenetv3", "variant": "bfloat16", "mode": "video",
        "batch": batch,
        "ms_per_batch": round(dt / (frames // batch) * 1e3, 2),
        "images_per_s": round(frames / dt, 2),
        "tunnel_h2d_MBps": tunnel_h2d_MBps(),
        "h2d_bytes_per_image": res * res * 3,
    }
    print(json.dumps(row), flush=True)
    return [row]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--json", default="output/bench_table.json")
    ap.add_argument("--skip-msflip", action="store_true")
    ap.add_argument("--skip-video", action="store_true")
    args = ap.parse_args()

    rows = []
    if not args.skip_video:
        rows += bench_video(args.frames)
    if not args.skip_msflip:
        rows += bench_msflip_eval(args.images)

    os.makedirs("output", exist_ok=True)
    table = []
    if os.path.exists(args.json):
        with open(args.json) as f:
            table = json.load(f)
    for row in rows:
        key = (row["arch"], row["variant"], row["mode"], row["batch"])
        table = [r for r in table
                 if (r["arch"], r["variant"], r["mode"], r["batch"]) != key]
        table.append(row)
    table.sort(key=lambda r: (r["arch"], r["mode"], r["variant"], r["batch"]))
    with open(args.json, "w") as f:
        json.dump(table, f, indent=1)
    # regenerate PERF.md with the merged table
    from bench_suite import write_perf_md

    write_perf_md(table)
    print("wrote", args.json, "+ output/PERF.md")


if __name__ == "__main__":
    main()
