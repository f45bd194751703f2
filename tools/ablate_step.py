#!/usr/bin/env python
"""Attribute the flagship step time across components (VERDICT r3 item 2).

The reference's analog is the empirical per-stage timing culture of
``base_detector.run`` (SURVEY.md §5.1).  Here: deletion/substitution
ablations of the jitted batch-8 512^2 dla_34 graph on real hardware —
decode, heads, trunk, aggregation(DCN) — plus a DCN-substitution row
(``dcn_impl='conv'``) that bounds the total DCN cost (kernels + offset
convs + layout prologs), and a profiler-trace attempt.

  python tools/ablate_step.py [--batch 8] [--ckpt <dir>] [--json out.json]

With --ckpt, offset convs carry *learned* offsets, so the band-skip
kernels see the real band population; otherwise offset-conv params get
noise+bias perturbations producing realistic (sigma~2 cell) offsets —
zero-init offsets would let every band skip and overstate speed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def perturb_offset_convs(variables, seed: int = 1):
    """Same offset-population methodology as the headline bench — one
    definition, imported, so the two cannot drift."""
    from bench import _perturb_offset_convs

    return _perturb_offset_convs(variables, seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--ckpt", type=str, default="")
    ap.add_argument("--json", type=str, default="output/step_ablation.json")
    ap.add_argument("--trace-dir", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from centerpose_tpu.config import load_config
    from centerpose_tpu.losses import sigmoid_clamped
    from centerpose_tpu.models.dla import DLATrunk, DLAUp, IDAUp
    from centerpose_tpu.models.factory import create_model, init_model
    from centerpose_tpu.ops.decode import multi_pose_decode
    from centerpose_tpu.data.encode import encode_example
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset
    from centerpose_tpu.train.trainer import create_train_state, make_train_step

    batch, iters = args.batch, args.iters
    rngnp = np.random.default_rng(0)
    x = jnp.asarray(rngnp.normal(size=(batch, 512, 512, 3)).astype(np.float32))

    def timeit(fn, *a, iters=iters):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    def build(impl, dtype="bfloat16"):
        cfg = load_config(opts=[
            "model.name", "dla_34", "model.head_conv", "256",
            "model.dcn_impl", impl, "model.compute_dtype", dtype,
        ])
        return cfg, create_model(cfg)

    cfg, model = build("pallas_full")
    variables = init_model(model, jax.random.PRNGKey(0), 512)
    if args.ckpt:
        from centerpose_tpu.train.checkpoints import load_checkpoint

        payload = load_checkpoint(args.ckpt)
        # device_put NOW: checkpoint leaves are host numpy arrays, and the
        # tunneled H2D (~20 MB/s) would otherwise re-upload ~80 MB of
        # params on every timed call (memory: tpu-sandbox-measurement-traps)
        variables = jax.device_put({"params": payload["params"],
                                    "batch_stats": payload["batch_stats"]})
        offsets_src = f"learned ({args.ckpt})"
    else:
        variables = perturb_offset_convs(variables)
        offsets_src = "synthetic noise+bias (sigma~2 cells)"

    rows = {"batch": batch, "offsets": offsets_src}

    # --- inference decomposition ---
    @jax.jit
    def full_infer(v, x):
        out = model.apply(v, x, train=False)
        return multi_pose_decode(
            sigmoid_clamped(out["hm"]), out["wh"], out["hps"], out["reg"],
            sigmoid_clamped(out["hm_hp"]), out["hp_offset"], k=100)

    @jax.jit
    def fwd_only(v, x):
        out = model.apply(v, x, train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out.values())

    rows["infer_full_ms"] = round(timeit(full_infer, variables, x), 2)
    rows["infer_fwd_only_ms"] = round(timeit(fwd_only, variables, x), 2)
    rows["decode_ms"] = round(rows["infer_full_ms"] - rows["infer_fwd_only_ms"], 2)
    print(json.dumps(rows), flush=True)

    # trunk alone (stride-1..32 pyramid, no DCN anywhere)
    trunk = DLATrunk(dtype=jnp.bfloat16)
    tvars = {"params": variables["params"]["base"],
             "batch_stats": variables["batch_stats"]["base"]}

    @jax.jit
    def trunk_only(v, x):
        feats = trunk.apply(v, x, train=False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    rows["trunk_ms"] = round(timeit(trunk_only, tvars, x), 2)

    # DCN-substitution bound: plain 3x3 convs in place of every DCN
    # (same channel plan, no offset convs, no gather) — the gap to the
    # pallas_full forward is the TOTAL cost of deformability: fused
    # kernels + offset/mask convs + layout prologs.
    _, model_conv = build("conv")

    @jax.jit
    def fwd_conv(v, x):
        out = model_conv.apply(v, x, train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out.values())

    rows["infer_fwd_convsub_ms"] = round(timeit(fwd_conv, variables, x), 2)
    rows["dcn_total_cost_ms"] = round(
        rows["infer_fwd_only_ms"] - rows["infer_fwd_convsub_ms"], 2)
    # heads+aggregation remainder
    rows["agg_heads_ms"] = round(
        rows["infer_fwd_convsub_ms"] - rows["trunk_ms"], 2)

    # --- train decomposition ---
    def train_ms(cfg, model, use_weights=True):
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), 100)
        # the conv-substitution model has no conv_offset_mask params, so
        # the checkpoint tree does not apply (and its weights do not affect
        # timing); only the DCN variants carry the learned offsets
        if use_weights and args.ckpt:
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
        elif use_weights:
            state = state.replace(
                params=perturb_offset_convs({"p": state.params})["p"])
        step = make_train_step(model, cfg, mesh=None)
        ds = SyntheticPoseDataset(batch, seed=0)
        rng = np.random.default_rng(0)
        enc = [encode_example(*ds.get_raw(i), cfg, rng, True)
               for i in range(batch)]
        bt = {k: jnp.asarray(np.stack([e[k] for e in enc])) for k in enc[0]}
        state, stats = step(state, bt)
        np.asarray(stats["loss"])
        t0 = time.perf_counter()
        n = max(10, iters // 2)
        for _ in range(n):
            state, stats = step(state, bt)
        np.asarray(stats["loss"])
        return (time.perf_counter() - t0) / n * 1e3

    rows["train_full_ms"] = round(train_ms(cfg, model), 2)
    print(json.dumps(rows), flush=True)
    cfg_c, model_c = build("conv")
    rows["train_convsub_ms"] = round(
        train_ms(cfg_c, model_c, use_weights=False), 2)
    rows["train_dcn_total_cost_ms"] = round(
        rows["train_full_ms"] - rows["train_convsub_ms"], 2)

    # per-site fused-kernel floor (sum of isolated kernel times, for the
    # prolog/offset-conv residual): fwd kernels only, trained offsets n/a
    try:
        from tools.validate_dcn import DLA34_DCN_SITES  # noqa
        rows["site_table"] = "see output/dcn_validation_r4_bandskip.json"
    except Exception:
        pass

    # --- profiler trace attempt (tunneled backend may refuse) ---
    if args.trace_dir:
        try:
            with jax.profiler.trace(args.trace_dir):
                for _ in range(3):
                    out = full_infer(variables, x)
                np.asarray(out)
            rows["trace"] = args.trace_dir
        except Exception as e:  # record instead of failing the ablation
            rows["trace_error"] = repr(e)

    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
