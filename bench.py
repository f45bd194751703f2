"""Benchmark: single-chip throughput of the flagship model (dla_34 @512).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "train_images_per_s": N, ...}

Primary metric: images/s for batched 512x512 forward + full on-device decode
(fixed K=100) on the flagship backbone, using the fast path (fused Pallas
DCN kernels + bfloat16 conv compute).  The same line also carries one
512x512 train-step throughput (compile excluded) per VERDICT.md round-1
item 3.  Baseline: the reference's DLA-34 GPU inference ~23 FPS (BASELINE.md;
batch-1 on a 1080Ti-class GPU, host decode).

The per-backbone table lives in output/bench_table.json / output/PERF.md
(tools/bench_suite.py).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


BASELINE_FPS = 23.0  # reference DLA-34 batch-1 GPU FPS (BASELINE.md)

# Fast path (validated in output/dcn_validation*.json on real hardware);
# override via env for A/B runs.  pallas_full = fused forward + kernel
# backwards; bfloat16 won the HEAD A/B for the training config (+17%
# train vs f32, -4% infer — experiments/dla_34_512x512.yaml).
DCN_IMPL = os.environ.get("BENCH_DCN_IMPL", "pallas_full")
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")


def _perturb_offset_convs(variables, seed: int = 1):
    """Give every conv_offset_mask realistic non-zero offsets (~N(0,2)
    cells per tap via the bias + kernel noise for spatial variation).

    The fused kernels SKIP empty y-bands at runtime, so benchmarking the
    zero-initialized offset convs would measure the best case, not a
    converged model's band population (output/offsets_hist.json: learned
    |dy| p50 0.3-2.8 cells).  This keeps the headline number honest."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def perturb(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "conv_offset_mask" in name and leaf.ndim == 4:
            return leaf + jnp.asarray(
                (rng.normal(size=leaf.shape) * 0.01).astype(np.float32))
        if "conv_offset_mask" in name and leaf.ndim == 1:
            n = leaf.shape[0]
            k2 = n // 3
            b = np.zeros(n, np.float32)
            b[: 2 * k2] = rng.normal(size=2 * k2) * 2.0
            return leaf + jnp.asarray(b)
        return leaf

    return jax.tree_util.tree_map_with_path(perturb, variables)


def main():
    import jax
    import jax.numpy as jnp

    from centerpose_tpu.config import load_config
    from centerpose_tpu.losses import sigmoid_clamped
    from centerpose_tpu.models.factory import create_model, init_model
    from centerpose_tpu.ops.decode import multi_pose_decode

    cfg = load_config(
        opts=[
            "model.name", "dla_34", "model.head_conv", "256",
            "model.dcn_impl", DCN_IMPL, "model.compute_dtype", DTYPE,
        ]
    )
    model = create_model(cfg)
    # The band-skipping kernels' speed depends on the offset distribution,
    # so bench with LEARNED offsets when the training artifact is on disk
    # (the honest, converged-model band population); otherwise fall back to
    # injected noise (slightly pessimistic at the fine sites).
    ckpt = os.environ.get(
        "BENCH_CKPT", "output/dla34_learn_artifact_r4/model_best")
    npz = ckpt.rsplit("/", 1)[0] + "/params_f16.npz"
    if os.path.isdir(ckpt):
        from centerpose_tpu.train.checkpoints import load_checkpoint

        payload = load_checkpoint(ckpt)
        variables = jax.device_put({"params": payload["params"],
                                    "batch_stats": payload["batch_stats"]})
        offsets_src = "learned"
    elif os.path.exists(npz):
        # the COMMITTED float16 weight snapshot: reproducible learned-offset
        # bench from a fresh clone (the orbax dir itself is untracked)
        from centerpose_tpu.train.checkpoints import load_params_npz

        variables = init_model(
            model, jax.random.PRNGKey(0), cfg.model.input_res)
        variables = jax.device_put(load_params_npz(variables, npz))
        offsets_src = "learned(f16-snapshot)"
    else:
        variables = init_model(
            model, jax.random.PRNGKey(0), cfg.model.input_res)
        variables = jax.device_put(_perturb_offset_convs(variables))
        offsets_src = "synthetic"

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

    # ---- train-step throughput (same chip, synthetic encoded batch) ----
    from centerpose_tpu.data.encode import encode_example
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset
    from centerpose_tpu.train.trainer import create_train_state, make_train_step

    train_batch = 8
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 100)
    if offsets_src != "synthetic":
        # any loaded snapshot (orbax dir or the committed f16 npz) carries
        # the learned offsets into the TRAIN timing too — the emitted row
        # stamps one offsets source for both numbers
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
    else:
        state = state.replace(
            params=_perturb_offset_convs({"p": state.params})["p"])
    step = make_train_step(model, cfg, mesh=None)
    ds = SyntheticPoseDataset(train_batch, seed=0)
    rng = np.random.default_rng(0)
    enc = [
        encode_example(*ds.get_raw(i), cfg, rng, True) for i in range(train_batch)
    ]
    bt = {k: jnp.asarray(np.stack([e[k] for e in enc])) for k in enc[0]}
    state, stats = step(state, bt)
    np.asarray(stats["loss"])  # compile + sync
    titers = 15
    t0 = time.perf_counter()
    for _ in range(titers):
        state, stats = step(state, bt)
    np.asarray(stats["loss"])
    tdt = time.perf_counter() - t0
    train_images_per_s = train_batch * titers / tdt

    print(
        json.dumps(
            {
                "metric": (
                    f"dla_34 512x512 inference images/s/chip (batch {batch}, "
                    f"on-device decode, {DCN_IMPL}+{DTYPE})"
                ),
                "value": round(images_per_s, 2),
                "unit": "images/s",
                "vs_baseline": round(images_per_s / BASELINE_FPS, 2),
                "train_images_per_s": round(train_images_per_s, 2),
                "train_batch": train_batch,
                "train_step_ms": round(tdt / titers * 1e3, 1),
                "offsets": offsets_src,
            }
        )
    )


if __name__ == "__main__":
    main()
