#!/usr/bin/env python
"""Measure the host<->device transfer budget and decompose the
transfer-bound graded configs (VERDICT r3 item 6; SURVEY.md §3.4/§3.5).

This sandbox reaches its TPU through a tunnel whose H2D/D2H bandwidth is
orders of magnitude below a local PCIe host.  The eval/video throughput
rows are therefore transfer-bound; this tool measures the actual rates and
commits the bytes/frame x rate arithmetic next to the numbers instead of
asserting it.

  python tools/transfer_budget.py [--json output/transfer_budget.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure_bandwidth():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rows = {}

    reps = 4
    for mb in (1, 8, 32, 128):
        h2ds, d2hs = [], []
        for r in range(reps):
            # fresh buffer each rep (avoid any transfer caching)
            a = np.random.default_rng(r).integers(
                0, 255, size=(mb * 1024 * 1024,), dtype=np.uint8)
            # H2D: device_put + a 1-element reduction read back as the
            # fence (block_until_ready returns early on this backend)
            t0 = time.perf_counter()
            d = jax.device_put(a, dev)
            s = jnp.sum(d[:: 1024 * 1024].astype(jnp.int32))
            np.asarray(s)
            h2ds.append(mb / (time.perf_counter() - t0))
            t0 = time.perf_counter()
            np.asarray(d)
            d2hs.append(mb / (time.perf_counter() - t0))
        rows[f"{mb}MB"] = {
            "h2d_MBps_median": round(float(np.median(h2ds)), 1),
            "h2d_MBps_peak": round(max(h2ds), 1),
            "d2h_MBps_median": round(float(np.median(d2hs)), 1),
            "d2h_MBps_peak": round(max(d2hs), 1),
        }

    # PIPELINED H2D: the eval/video paths upload batch after batch with
    # device compute in between — queueing 8 x 8MB puts and fencing once
    # measures that steady-state overlap, which one-shot transfers (fenced
    # per call) understate.  The honest ceiling for the pipelined paths.
    bufs = [np.random.default_rng(100 + r).integers(
        0, 255, size=(8 * 1024 * 1024,), dtype=np.uint8) for r in range(8)]
    t0 = time.perf_counter()
    devs = [jax.device_put(a, dev) for a in bufs]
    s = sum(jnp.sum(d[:: 1024 * 1024].astype(jnp.int32)) for d in devs)
    np.asarray(s)
    rows["pipelined_h2d_MBps"] = round(64 / (time.perf_counter() - t0), 1)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="output/transfer_budget.json")
    args = ap.parse_args()

    out = {"bandwidth": measure_bandwidth()}
    # steady-state rate: the pipelined measurement (the eval/video paths
    # upload batch after batch with compute in between; one-shot fenced
    # transfers understate that — r4's artifact used the 32MB one-shot
    # peak and produced a "ceiling" below the measured eval throughput)
    h2d = max(out["bandwidth"]["pipelined_h2d_MBps"],
              out["bandwidth"]["128MB"]["h2d_MBps_peak"])
    d2h = out["bandwidth"]["128MB"]["d2h_MBps_peak"]

    # --- graded config #5: batched video stream (512^2 uint8 frames) ---
    frame_bytes = 512 * 512 * 3  # uint8, normalized on device
    out["video"] = {
        "bytes_per_frame": frame_bytes,
        "h2d_ceiling_img_per_s": round(h2d * 1e6 / frame_bytes, 1),
        "note": (
            "per decoded frame only [K,40] floats return (16 KB); the "
            "ceiling is H2D of the raw frames"
        ),
        "local_pcie_projection_img_per_s": round(
            16e9 / frame_bytes / 1e0, 0),  # 16 GB/s host link
    }

    # --- graded config #4: hrnet_w32 multi-scale flip eval ---
    # fix_res: every scale warps to 512^2; 3 scales; the FLIPPED halves are
    # built on device (detector.process), so they do not cross H2D
    scales = 3
    eval_bytes = frame_bytes * scales
    out["eval_msflip"] = {
        "bytes_per_image": eval_bytes,
        "h2d_ceiling_img_per_s": round(h2d * 1e6 / eval_bytes, 1),
        "d2h_bytes_per_image": scales * 100 * 40 * 4,
        "local_pcie_projection_img_per_s": round(16e9 / eval_bytes, 0),
    }
    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
