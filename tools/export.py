#!/usr/bin/env python
"""Deployment export CLI (reference: tools/convert* ONNX/TensorRT scripts,
SURVEY.md §2 #29).

The reference ships converters that freeze the torch model into an ONNX graph
and build a TensorRT engine for deployment.  The TPU-native equivalents are:

* ``--format stablehlo`` — serialize the full inference function (forward +
  sigmoid + flip-average + on-device decode) with ``jax.export`` into a
  portable StableHLO artifact (``.shlo``).  This is the ONNX analog: a
  self-contained, version-stable graph any JAX (or PJRT) runtime can reload
  with ``jax.export.deserialize`` and run without the model-building Python.
* ``--format aot`` — ahead-of-time compile the same function with
  ``jax.jit(...).lower(...).compile()`` for the *current* backend and report
  compile time, per-device memory analysis, and FLOP estimate.  This is the
  TensorRT-engine analog: the XLA executable is the engine (persistent on
  disk via the JAX compilation cache, keyed by program + topology).

Usage:
  python tools/export.py --cfg experiments/dla_34_512x512.yaml \
      --format stablehlo --out output/dla_34.shlo [--batch 8] [KEY VALUE ...]
  python tools/export.py --cfg ... --format aot [--batch 8]
  python tools/export.py --load output/dla_34.shlo   # verify an artifact
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="centerpose_tpu deployment export")
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--format", choices=("stablehlo", "aot"), default="stablehlo")
    p.add_argument("--out", type=str, default=None, help="output artifact path")
    p.add_argument("--batch", type=int, default=1, help="serving batch size")
    p.add_argument("--load", type=str, default=None,
                   help="deserialize + run an existing .shlo artifact and exit")
    p.add_argument("opts", nargs="*")
    return p.parse_args()


def _build_serving_fn(cfg):
    """Closed-over-params inference fn: images [B,H,W,3] -> dets [B,K,40]."""
    import jax

    from centerpose_tpu.inference.detector import Detector
    from centerpose_tpu.models.factory import create_model, init_model
    from centerpose_tpu.train.checkpoints import (
        load_checkpoint,
        restore_params_filtered,
    )

    variables = None
    if cfg.test.model_path:
        model = create_model(cfg)
        variables = init_model(model, jax.random.PRNGKey(0), cfg.model.input_res)
        payload = load_checkpoint(cfg.test.model_path)
        variables = {
            "params": restore_params_filtered(variables["params"], payload["params"]),
            "batch_stats": payload.get("batch_stats", variables.get("batch_stats")),
        }
    det = Detector(cfg, variables=variables)

    # Close over the weights so the artifact is self-contained (the ONNX
    # analog freezes weights into the graph the same way).
    def serve(images):
        return det._process_raw(det.variables, images)

    return serve


def _example_input(cfg, batch):
    import jax.numpy as jnp

    n = batch * (2 if cfg.test.flip_test else 1)
    res = cfg.model.input_res
    return jnp.zeros((n, res, res, 3), jnp.float32)


def export_stablehlo(cfg, batch, out_path):
    import jax
    from jax import export as jexport

    serve = _build_serving_fn(cfg)
    x = _example_input(cfg, batch)
    t0 = time.perf_counter()
    exported = jexport.export(jax.jit(serve))(
        jax.ShapeDtypeStruct(x.shape, x.dtype)
    )
    blob = exported.serialize()
    t1 = time.perf_counter()
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"[export] StableHLO artifact: {out_path}")
    print(f"[export]   input  {x.shape} {x.dtype}")
    print(f"[export]   outputs {[str(s) for s in exported.out_avals]}")
    print(f"[export]   size {len(blob) / 1e6:.2f} MB, export {t1 - t0:.2f}s")

    # Round-trip verification: deserialize and run on the current backend.
    rt = jexport.deserialize(blob)
    dets = rt.call(x)
    np.asarray(dets)
    print(f"[export]   round-trip OK: dets {dets.shape}")


def export_aot(cfg, batch):
    import jax

    serve = _build_serving_fn(cfg)
    x = _example_input(cfg, batch)
    t0 = time.perf_counter()
    lowered = jax.jit(serve).lower(x)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"[export] AOT compile for backend={jax.default_backend()}")
    print(f"[export]   lower {t1 - t0:.2f}s, compile {t2 - t1:.2f}s")
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = analysis.get("flops", float("nan"))
        print(f"[export]   estimated flops/step: {flops:.3e}")
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        print(
            f"[export]   device memory: args {mem.argument_size_in_bytes / 1e6:.1f} MB, "
            f"output {mem.output_size_in_bytes / 1e6:.1f} MB, "
            f"temp {mem.temp_size_in_bytes / 1e6:.1f} MB"
        )
    except Exception:
        pass
    dets = compiled(x)
    np.asarray(dets)
    print(f"[export]   executed OK: dets {dets.shape}")


def load_and_run(path):
    import jax
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    rt = jexport.deserialize(blob)
    aval = rt.in_avals[0]
    x = np.zeros(aval.shape, aval.dtype)
    t0 = time.perf_counter()
    dets = rt.call(x)
    dets = np.asarray(dets)
    t1 = time.perf_counter()
    print(f"[export] {path}: ran on {jax.default_backend()}, "
          f"dets {dets.shape} in {t1 - t0:.2f}s (incl. compile)")


def main():
    args = parse_args()

    from centerpose_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    if args.load:
        load_and_run(args.load)
        return

    from centerpose_tpu.config import load_config

    cfg = load_config(args.cfg, args.opts)
    if args.format == "stablehlo":
        out = args.out or os.path.join(
            cfg.output_dir, cfg.exp_id, f"{cfg.model.name}_b{args.batch}.shlo"
        )
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        export_stablehlo(cfg, args.batch, out)
    else:
        export_aot(cfg, args.batch)


if __name__ == "__main__":
    main()
