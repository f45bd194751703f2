"""Benchmark: single-chip inference throughput of the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: images/s for batched 512x512 forward+decode (fully on-device, fixed
K=100) on the flagship backbone.  Baseline: the reference's DLA-34 GPU
inference ≈23 FPS (BASELINE.md; batch-1 on a 1080Ti-class GPU, host decode).
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_FPS = 23.0  # reference DLA-34 batch-1 GPU FPS (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from centerpose_tpu.losses import sigmoid_clamped
    from centerpose_tpu.models.factory import create_model, init_model
    from centerpose_tpu.ops.decode import multi_pose_decode

    cfg = _flagship_cfg()
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), cfg.model.input_res)

    batch = 8  # batched streaming inference (BASELINE config #5 shape)
    res = cfg.model.input_res

    @jax.jit
    def infer(variables, images):
        out = model.apply(variables, images, train=False)
        return multi_pose_decode(
            sigmoid_clamped(out["hm"]),
            out["wh"],
            out["hps"],
            out["reg"],
            sigmoid_clamped(out["hm_hp"]),
            out["hp_offset"],
            k=cfg.test.topk,
        )

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, res, res, 3)).astype(np.float32)
    )
    # warmup / compile.  NOTE: on this sandbox's tunneled TPU backend
    # block_until_ready returns before remote execution finishes; a host
    # readback (np.asarray) is the only reliable sync, and in-order stream
    # semantics make a single trailing readback serialize the whole queue.
    np.asarray(infer(variables, x))

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        dets = infer(variables, x)
    np.asarray(dets)  # trailing sync: waits for all queued executions
    dt = time.perf_counter() - t0
    images_per_s = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": f"{cfg.model.name} 512x512 inference images/s/chip (batch {batch}, on-device decode)",
                "value": round(images_per_s, 2),
                "unit": "images/s",
                "vs_baseline": round(images_per_s / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
