#!/usr/bin/env python
"""Measure the DCN share of the dla_34 train step (VERDICT.md item 4).

Times one 512x512 train step with dcn_impl='xla' (real deformable sampling)
vs dcn_impl='conv' (identical FLOPs through plain 3x3 convs at every DCN
site, no gathers).  The delta bounds what a fused Pallas backward could
recover; if it is small relative to the step, the hand-written backward is
not worth its compile/maintenance cost (the measured-waiver path).

  python tools/profile_dcn_share.py [--batch 8] [--dtype bfloat16] [--json f]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def time_train_step(dcn_impl: str, dtype: str, batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from centerpose_tpu.config import load_config
    from centerpose_tpu.data.encode import encode_example
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset
    from centerpose_tpu.models.factory import create_model
    from centerpose_tpu.train.trainer import create_train_state, make_train_step

    cfg = load_config(opts=[
        "model.name", "dla_34", "model.head_conv", "256",
        "model.dcn_impl", dcn_impl, "model.compute_dtype", dtype,
    ])
    model = create_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 100)
    step = make_train_step(model, cfg, mesh=None)
    ds = SyntheticPoseDataset(batch, seed=0)
    rng = np.random.default_rng(0)
    enc = [encode_example(*ds.get_raw(i), cfg, rng, True) for i in range(batch)]
    bt = {k: jnp.asarray(np.stack([e[k] for e in enc])) for k in enc[0]}
    t0 = time.perf_counter()
    state, stats = step(state, bt)
    np.asarray(stats["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, bt)
    np.asarray(stats["loss"])
    dt = (time.perf_counter() - t0) / iters
    return {"step_ms": round(dt * 1e3, 2), "compile_s": round(compile_s, 1),
            "images_per_s": round(batch / dt, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--json", default="output/dcn_train_share.json")
    ap.add_argument("--impls", default="conv,xla",
                    help="comma list of dcn_impl variants to time")
    args = ap.parse_args()

    out = {}
    for impl in args.impls.split(","):
        out[impl] = time_train_step(impl, args.dtype, args.batch, args.iters)
        print(impl, json.dumps(out[impl]), flush=True)
    if "conv" not in out or "xla" not in out:
        out["batch"] = args.batch
        out["dtype"] = args.dtype
        if args.json:
            os.makedirs(os.path.dirname(args.json), exist_ok=True)
            prev = {}
            if os.path.exists(args.json):
                with open(args.json) as f:
                    prev = json.load(f)
            prev.update(out)
            with open(args.json, "w") as f:
                json.dump(prev, f, indent=1)
            print("wrote", args.json)
        return
    dcn_ms = out["xla"]["step_ms"] - out["conv"]["step_ms"]
    out["dcn_overhead_ms"] = round(dcn_ms, 2)
    out["dcn_share_of_step"] = round(dcn_ms / out["xla"]["step_ms"], 4)
    out["batch"] = args.batch
    out["dtype"] = args.dtype
    print(json.dumps({k: out[k] for k in
                      ("dcn_overhead_ms", "dcn_share_of_step")}), flush=True)
    if args.json:
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
