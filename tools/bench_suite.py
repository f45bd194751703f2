#!/usr/bin/env python
"""Per-backbone benchmark suite on the real chip: forward+decode latency /
throughput (batch 1 and 8) and train-step throughput, per (dcn_impl,
compute_dtype) variant for the flagship.

Writes/merges results into output/bench_table.json and regenerates
output/PERF.md.  Run in chunks (each config is a fresh remote compile):

  python tools/bench_suite.py --archs res_18,res_50 --modes infer
  python tools/bench_suite.py --archs dla_34 --modes infer,train \
      --variants xla/float32,pallas/bfloat16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HEAD_CONV = {"dla_34": 256, "hrnet_w32": 256, "hrnet_w48": 256}  # others 64


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--archs", default="dla_34")
    p.add_argument("--modes", default="infer", help="infer,train")
    p.add_argument("--variants", default="default",
                   help="comma list of dcn_impl/dtype, e.g. xla/float32,"
                        "pallas/bfloat16; 'default' = pallas/bfloat16 for "
                        "dla_34, plain bfloat16 otherwise")
    p.add_argument("--batches", default="1,8")
    p.add_argument("--train-batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--json", default="output/bench_table.json")
    return p.parse_args()


def build(arch, dcn_impl, dtype):
    from centerpose_tpu.config import load_config

    opts = ["model.name", arch,
            "model.head_conv", str(HEAD_CONV.get(arch, 64)),
            "model.compute_dtype", dtype]
    if arch == "dla_34":
        opts += ["model.dcn_impl", dcn_impl]
    return load_config(opts=opts)


def _realistic_dcn_offsets(cfg, variables):
    """dla_34's band-skipping DCN kernels run offset-dependent; zero-init
    offset convs would benchmark the best case.  Use the learned checkpoint
    when its artifact is on disk, else bench.py's noise injection."""
    if cfg.model.name != "dla_34" or cfg.model.dcn_impl == "conv":
        return variables
    import os as _os

    import jax

    ckpt = _os.environ.get(
        "BENCH_CKPT", "output/dla34_learn_artifact_r4/model_best")
    if _os.path.isdir(ckpt):
        from centerpose_tpu.train.checkpoints import load_checkpoint

        payload = load_checkpoint(ckpt)
        return jax.device_put({"params": payload["params"],
                               "batch_stats": payload["batch_stats"]})
    from bench import _perturb_offset_convs

    return jax.device_put(_perturb_offset_convs(variables))


def bench_infer(cfg, batch, iters):
    import jax
    import jax.numpy as jnp

    from centerpose_tpu.losses import sigmoid_clamped
    from centerpose_tpu.models.factory import create_model, init_model
    from centerpose_tpu.ops.decode import multi_pose_decode

    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), cfg.model.input_res)
    variables = _realistic_dcn_offsets(cfg, variables)

    @jax.jit
    def infer(v, x):
        out = model.apply(v, x, train=False)
        return multi_pose_decode(
            sigmoid_clamped(out["hm"]), out["wh"], out["hps"], out["reg"],
            sigmoid_clamped(out["hm_hp"]), out["hp_offset"], k=cfg.test.topk,
        )

    res = cfg.model.input_res
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, res, res, 3)).astype(np.float32))
    np.asarray(infer(variables, x))  # compile + full sync (remote backend)
    t0 = time.perf_counter()
    for _ in range(iters):
        dets = infer(variables, x)
    np.asarray(dets)  # trailing readback serializes the queued executions
    dt = time.perf_counter() - t0
    return {
        "ms_per_batch": round(dt / iters * 1e3, 2),
        "images_per_s": round(batch * iters / dt, 2),
    }


def bench_train(cfg, batch, iters):
    import jax
    import jax.numpy as jnp

    from centerpose_tpu.data.encode import encode_example
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset
    from centerpose_tpu.models.factory import create_model
    from centerpose_tpu.train.trainer import create_train_state, make_train_step

    model = create_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 100)
    v = _realistic_dcn_offsets(
        cfg, {"params": state.params, "batch_stats": state.batch_stats})
    state = state.replace(params=v["params"], batch_stats=v["batch_stats"])
    step = make_train_step(model, cfg, mesh=None)

    ds = SyntheticPoseDataset(batch, seed=0)
    rng = np.random.default_rng(0)
    items = [ds.get_raw(i) for i in range(batch)]
    enc = [encode_example(im, anns, cfg, rng, True) for im, anns in items]
    batch_np = {k: np.stack([e[k] for e in enc]) for k in enc[0]}
    batch_dev = {k: jnp.asarray(v) for k, v in batch_np.items()}

    state, stats = step(state, batch_dev)  # compile
    np.asarray(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, batch_dev)
    np.asarray(stats["loss"])  # trailing sync
    dt = time.perf_counter() - t0
    return {
        "ms_per_step": round(dt / iters * 1e3, 2),
        "images_per_s": round(batch * iters / dt, 2),
    }


def write_perf_md(table, path="output/PERF.md"):
    lines = [
        "# Single-chip performance (TPU v5e, 512x512 input)",
        "",
        "All numbers: steady-state, compile excluded, trailing-readback",
        "sync (the remote backend's only reliable fence).  `infer` =",
        "forward + sigmoid + full on-device decode (K=100) from on-device",
        "inputs.  dla_34 rows run with LEARNED offsets (the band-skipping",
        "DCN kernels are offset-dependent; see bench.py).  `video` /",
        "`eval_msflip` include host pre-process and the H2D frame upload:",
        "on THIS sandbox's tunneled TPU that link swings ~4-60 MB/s",
        "between sessions (measured: output/transfer_budget.json; a local",
        "PCIe host is ~1000x faster), so those two rows are transfer-",
        "bound and carry a `tunnel_h2d_MBps` stamp measured alongside —",
        "compare images/s x bytes/image against the stamp, not across",
        "sessions.  Baseline for context: reference DLA-34 ~23 FPS",
        "batch-1 on a 2019 GPU (BASELINE.md).",
        "",
        "| arch | variant | mode | batch | ms | images/s |",
        "|---|---|---|---|---|---|",
    ]
    for row in table:
        ms = row.get("ms_per_batch", row.get("ms_per_step"))
        lines.append(
            f"| {row['arch']} | {row['variant']} | {row['mode']} | "
            f"{row['batch']} | {ms} | {row['images_per_s']} |"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    args = parse_args()
    os.makedirs("output", exist_ok=True)
    table = []
    if os.path.exists(args.json):
        with open(args.json) as f:
            table = json.load(f)

    def upsert(row):
        key = (row["arch"], row["variant"], row["mode"], row["batch"])
        table[:] = [
            r for r in table
            if (r["arch"], r["variant"], r["mode"], r["batch"]) != key
        ]
        table.append(row)

    for arch in args.archs.split(","):
        if args.variants == "default":
            variants = [("pallas" if arch == "dla_34" else "xla", "bfloat16")]
        else:
            variants = [tuple(v.split("/")) for v in args.variants.split(",")]
        for dcn_impl, dtype in variants:
            vname = (f"{dcn_impl}/{dtype}" if arch == "dla_34" else dtype)
            cfg = build(arch, dcn_impl, dtype)
            if "infer" in args.modes:
                for batch in (int(b) for b in args.batches.split(",")):
                    r = bench_infer(cfg, batch, args.iters)
                    row = dict(arch=arch, variant=vname, mode="infer",
                               batch=batch, **r)
                    upsert(row)
                    print(json.dumps(row), flush=True)
            if "train" in args.modes:
                r = bench_train(cfg, args.train_batch, max(5, args.iters // 2))
                row = dict(arch=arch, variant=vname, mode="train",
                           batch=args.train_batch, **r)
                upsert(row)
                print(json.dumps(row), flush=True)

    table.sort(key=lambda r: (r["arch"], r["mode"], r["variant"], r["batch"]))
    with open(args.json, "w") as f:
        json.dump(table, f, indent=1)
    write_perf_md(table)
    print(f"wrote {args.json} + output/PERF.md")


if __name__ == "__main__":
    main()
