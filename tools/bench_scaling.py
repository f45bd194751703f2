"""Scaling-efficiency benchmark: images/s/chip at 1 -> N devices.

North-star metric (BASELINE.md): >=90% images/s/chip scaling efficiency from
1 chip to a multi-host pod slice, fixed per-chip batch (weak scaling).

Replaces the reference's ad-hoc "launch DDP and eyeball iter time"
methodology (SURVEY.md §5.8) with a deterministic harness: for each mesh
size n in --mesh-sizes, jit the SPMD train step over an n-device 1-D data
mesh with global batch n * per_chip_batch, run --iters steps on synthetic
encoded batches, report images/s/chip and efficiency vs the 1-device run.

On real pods run one process per host (jax.distributed.initialize happens in
tools/train.py; here we use whatever jax.devices() exposes).  Without
multiple real chips, use --force-cpu-devices 8 to validate the code path and
collective overhead structure on a virtual CPU mesh (numbers then measure
the harness, not TPU hardware).

Usage:
  python tools/bench_scaling.py --cfg experiments/dla_34_512x512.yaml \
      --per-chip-batch 8 --mesh-sizes 1,2,4,8 [--force-cpu-devices 8]

Prints one JSON line per mesh size plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=None, help="experiment YAML")
    p.add_argument("--per-chip-batch", type=int, default=8)
    p.add_argument("--mesh-sizes", default="1")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--input-res", type=int, default=None,
                   help="override input res (smaller = faster harness check)")
    p.add_argument("--force-cpu-devices", type=int, default=0,
                   help="run on N virtual CPU devices instead of real chips")
    p.add_argument("opts", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    if args.force_cpu_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        ).strip()
    import jax

    if args.force_cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from centerpose_tpu.config import load_config, update_config
    from centerpose_tpu.data.encode import encode_example, stack_batch
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset
    from centerpose_tpu.models.factory import create_model
    from centerpose_tpu.parallel.mesh import create_mesh, shard_batch
    from centerpose_tpu.train.trainer import create_train_state, make_train_step

    cfg = load_config(args.cfg, opts=args.opts)
    if args.input_res:
        cfg = update_config(
            cfg,
            {"model": {"input_res": args.input_res,
                       "output_res": args.input_res // 4}},
        )

    mesh_sizes = [int(s) for s in args.mesh_sizes.split(",")]
    devices = jax.devices()
    results = {}
    for n in mesh_sizes:
        if n > len(devices):
            print(json.dumps({"mesh_size": n, "skipped": "not enough devices"}))
            continue
        b = n * args.per_chip_batch
        cfg_n = update_config(cfg, {"train": {"batch_size": b}})
        mesh = create_mesh(devices[:n])
        model = create_model(cfg_n)
        state = create_train_state(
            cfg_n, model, jax.random.PRNGKey(0), steps_per_epoch=1000, mesh=mesh
        )
        step = make_train_step(model, cfg_n, mesh)

        ds = SyntheticPoseDataset(
            num_samples=b, img_w=cfg.model.input_res, img_h=cfg.model.input_res
        )
        exs = []
        for i in range(b):
            img, anns = ds.get_raw(i)
            exs.append(encode_example(img, anns, cfg_n, is_train=False))
        batch = stack_batch(exs)
        batch.pop("c", None), batch.pop("s", None)
        batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)

        state, stats = step(state, batch)  # compile + warmup
        np.asarray(stats["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, stats = step(state, batch)
        np.asarray(stats["loss"])  # trailing sync
        dt = (time.perf_counter() - t0) / args.iters
        ips = b / dt
        ips_chip = ips / n
        results[n] = ips_chip
        print(json.dumps({
            "mesh_size": n,
            "global_batch": b,
            "step_ms": round(dt * 1e3, 2),
            "images_per_s": round(ips, 2),
            "images_per_s_per_chip": round(ips_chip, 2),
        }), flush=True)

    if 1 in results and len(results) > 1:
        worst = min(results[n] / results[1] for n in results if n != 1)
        print(json.dumps({
            "metric": "weak-scaling efficiency (worst mesh vs 1 device)",
            "value": round(worst, 4),
            "unit": "ratio",
            "vs_baseline": round(worst / 0.90, 2),
        }))


if __name__ == "__main__":
    main()
