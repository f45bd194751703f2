#!/usr/bin/env python
"""Measure the host input pipeline against pod-slice consumption
(VERDICT r4 missing #2 / task 3; SURVEY §7 hard-part 3: "cv2 affine +
gaussian drawing per sample must feed a pod slice, or the >=90% scaling
target dies on input starvation").

Stages measured, host-side (this sandbox has ``os.cpu_count()`` cores —
production v5e hosts have ~112 vCPU per 8 chips, so per-core rates and the
linear projection are the transferable numbers):

  1. raw sample production (dataset.get_raw: image render/decode)
  2. encode_example (affine warp + gaussian targets), native C++ core vs
     pure-Python loop (CENTERPOSE_DISABLE_NATIVE A/B), vs num_workers
  3. DataLoader.epoch sustained batch rate (encode + stacking + IPC)
  4. prefetch_to_device H2D handoff (tunnel-rate caveat stamped; the
     bytes/batch + PCIe projection give the production number)

Budget check: one chip trains at BENCH img/s; a host driving N chips must
sustain N x that. (Reference analog: DataLoader num_workers + pin_memory,
SURVEY §3.1.)

  python tools/bench_input_pipeline.py [--json output/input_pipeline.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_encode(n_images: int, workers: int, disable_native: bool,
                 batch: int = 8) -> dict:
    """Run a DataLoader epoch slice in a SUBPROCESS (clean env so the
    native-disable flag reaches pool workers; cold pool spin-up excluded by
    a warmup batch)."""
    code = f"""
import sys, time, json
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
import numpy as np
from centerpose_tpu.config import load_config
from centerpose_tpu.data.loader import DataLoader
from centerpose_tpu.data.synthetic import SyntheticPoseDataset

cfg = load_config(opts=["model.name", "dla_34"])
ds = SyntheticPoseDataset({n_images}, seed=0)
dl = DataLoader(ds, cfg, batch_size={batch}, is_train=True,
                num_workers={workers}, seed=0)
it = dl.epoch(0)
next(it)  # warmup: pool spin-up + first chunk
t0 = time.perf_counter()
n = 0
for b in it:
    n += b["input"].shape[0]
dt = time.perf_counter() - t0
dl.close()
print(json.dumps({{"img_s": n / dt, "n": n}}))
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if disable_native:
        env["CENTERPOSE_DISABLE_NATIVE"] = "1"
    else:
        env.pop("CENTERPOSE_DISABLE_NATIVE", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def bench_raw(n: int = 64) -> float:
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(n, seed=0)
    ds.get_raw(0)
    t0 = time.perf_counter()
    for i in range(n):
        ds.get_raw(i)
    return n / (time.perf_counter() - t0)


def bench_encode_only(n: int = 64) -> dict:
    """encode_example alone (native vs python) on a pre-rendered sample —
    the per-core encode ceiling with zero IPC/render cost."""
    from centerpose_tpu.config import load_config
    from centerpose_tpu.data import encode as enc
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset

    cfg = load_config(opts=["model.name", "dla_34"])
    ds = SyntheticPoseDataset(8, seed=0)
    img, anns = ds.get_raw(0)
    rng = np.random.default_rng(0)
    out = {}
    orig = enc._try_native_encode
    for name, fn in (("native", orig), ("python", lambda *a, **k: False)):
        enc._try_native_encode = fn
        try:
            enc.encode_example(img, anns, cfg, rng, True)
            t0 = time.perf_counter()
            for _ in range(n):
                enc.encode_example(img, anns, cfg, rng, True)
            out[f"encode_only_{name}_img_s"] = round(
                n / (time.perf_counter() - t0), 1)
        finally:
            enc._try_native_encode = orig
    return out


def bench_prefetch(n_images: int = 96, batch: int = 8,
                   wire: str = "float32") -> dict:
    """Sustained loader -> prefetch_to_device -> consume rate with the real
    chip on the other end (tunnel H2D; bytes/batch recorded so the local
    PCIe projection is derivable).  ``wire`` selects the H2D batch format —
    the flagship yaml trains with ``train.wire: compact`` (uint8 frame +
    fp16 targets), so that row is the one the train e2e number rides on."""
    import jax

    from centerpose_tpu.config import load_config
    from centerpose_tpu.data.loader import DataLoader, prefetch_to_device
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset

    from centerpose_tpu.parallel.mesh import create_mesh

    cfg = load_config(opts=["model.name", "dla_34", "train.wire", wire])
    ds = SyntheticPoseDataset(n_images, seed=0)
    dl = DataLoader(ds, cfg, batch_size=batch, is_train=True,
                    num_workers=max(1, (os.cpu_count() or 2) - 1), seed=0)
    it = prefetch_to_device(dl.epoch(0), create_mesh(), size=2)
    first = next(it)
    bytes_per_batch = sum(
        np.asarray(v).nbytes for v in jax.tree_util.tree_leaves(first))
    t0 = time.perf_counter()
    n = 0
    last = None
    for b in it:
        last = b
        n += int(jax.tree_util.tree_leaves(b)[0].shape[0])
    # force the last H2D to complete
    np.asarray(jax.tree_util.tree_leaves(last)[0][0, 0])
    dt = time.perf_counter() - t0
    dl.close()
    return {"prefetch_img_s": round(n / dt, 2),
            "bytes_per_batch": int(bytes_per_batch),
            "bytes_per_image": int(bytes_per_batch // batch)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="output/input_pipeline.json")
    ap.add_argument("--images", type=int, default=96)
    args = ap.parse_args()

    ncpu = os.cpu_count() or 1
    res = {"host_cpus": ncpu,
           "raw_render_img_s": round(bench_raw(), 1)}
    res.update(bench_encode_only())
    print(json.dumps(res), flush=True)

    rows = []
    for disable_native in (False, True):
        for workers in sorted({0, 1, ncpu}):
            r = bench_encode(args.images, workers, disable_native)
            rows.append({
                "num_workers": workers,
                "encoder": "python" if disable_native else "native",
                "loader_img_s": round(r["img_s"], 1),
            })
            print(json.dumps(rows[-1]), flush=True)
    res["loader_sweep"] = rows

    for wire in ("float32", "compact"):
        r = bench_prefetch(args.images, wire=wire)
        res[f"prefetch_{wire}"] = r
        print(json.dumps({"wire": wire, **r}), flush=True)

    best = max(r["loader_img_s"] for r in rows)
    best_per_core = best / max(1, min(ncpu, max(
        r["num_workers"] or 1 for r in rows if r["loader_img_s"] == best)))
    chip_train = 57.4  # canonical compute-only train rate (output/PERF.md)
    res["budget"] = {
        "chip_train_img_s": chip_train,
        "host_rate_img_s": best,
        "host_feeds_n_chips": round(best / chip_train, 2),
        "per_core_img_s": round(best_per_core, 1),
        "cores_per_chip_needed": round(chip_train / best_per_core, 1),
        "note": ("production v5e hosts carry ~112 vCPU per 8 chips "
                 "(14 cores/chip); this sandbox host has "
                 f"{ncpu} cores.  The per-core rate x 14 is the "
                 "production-host projection."),
    }
    res["projection_112core_host_img_s"] = round(best_per_core * 112, 0)
    print(json.dumps(res["budget"]), flush=True)

    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
