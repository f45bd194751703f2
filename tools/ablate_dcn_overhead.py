#!/usr/bin/env python
"""Itemize the two named DCN-overhead candidates (VERDICT r4 item 1):

  (a) the standalone 27-channel offset/mask convs (one per DCN instance,
      padding to 128 MXU lanes as ordinary XLA convs), and
  (b) the NHWC<->channel-second layout prologs/epilogs around every fused
      kernel call (x transpose+pad, offset/mask transposes, output
      transpose; plus the group/ungroup reshapes at the narrow sites).

Method: run the flagship (dla_34 @512, pallas_full, bfloat16, LEARNED
checkpoint) forward EAGERLY with ``dcn_v2_pallas`` monkeypatched to record
every instance's real (x, offset, mask, weight, bias) — band population and
tensor dtypes exactly as in-model — then time, per instance, on hardware:

  t_full    jit(dcn_v2_pallas)(NHWC io)          the call as the model runs it
  t_om      jit(offset/mask conv)(x)             what folding (a) removes
  t_prolog  jit(layout transforms only)          what persisting (b) removes

Reference analog: DCNv2's single fused CUDA extension op does the offset
conv + gather + GEMM with no layout round-trips (SURVEY.md §2 #16).

  python tools/ablate_dcn_overhead.py [--json output/dcn_overhead.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def capture_instances(ckpt: str):
    """Eager forward of the flagship with dcn_v2_pallas patched to record
    each call's inputs.  Eager runs op-by-op (slow, once) so the patch sees
    concrete arrays; the XLA fallback stands in for the kernel so this also
    works on CPU-only runs (outputs differ ~1e-3 rel — immaterial for the
    captured band statistics)."""
    import jax
    import jax.numpy as jnp

    from centerpose_tpu.config import load_config
    from centerpose_tpu.models.factory import create_model, init_model
    from centerpose_tpu.ops import dcn_pallas as dp
    from centerpose_tpu.ops.dcn import dcn_v2
    from centerpose_tpu.train.checkpoints import load_checkpoint

    cfg = load_config(opts=[
        "model.name", "dla_34", "model.head_conv", "256",
        "model.dcn_impl", "pallas_full", "model.compute_dtype", "bfloat16",
    ])
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), 512)
    payload = load_checkpoint(ckpt)
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}

    recorded = []
    orig = dp.dcn_v2_pallas

    def recording(x, offset, mask, weight, bias=None, *a, **kw):
        recorded.append(dict(
            x=np.asarray(x), offset=np.asarray(offset),
            mask=np.asarray(mask), weight=np.asarray(weight),
            bias=np.asarray(bias)))
        return dcn_v2(x.astype(jnp.float32), offset, mask,
                      weight.astype(jnp.float32), bias)

    # sites use a real image-statistics input (the synthetic renderer), not
    # gaussian noise: activations after BN/ReLU drive the om convs
    from centerpose_tpu.data.encode import encode_example
    from centerpose_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(8, seed=0)
    rngnp = np.random.default_rng(0)
    enc = [encode_example(*ds.get_raw(i), cfg, rngnp, False) for i in range(8)]
    x = jnp.asarray(np.stack([e["input"] for e in enc]))

    # Eager capture runs on the HOST CPU backend: op-by-op dispatch over the
    # tunneled TPU would take minutes per op batch (memory:
    # tpu-sandbox-measurement-traps), and the capture only needs VALUES.
    cpu = jax.devices("cpu")[0]
    dp.dcn_v2_pallas = recording
    try:
        with jax.default_device(cpu), jax.disable_jit():
            model.apply(jax.device_put(variables, cpu),
                        jax.device_put(x, cpu), train=False)
    finally:
        dp.dcn_v2_pallas = orig
    # also capture each instance's offset-conv weights from the param tree
    om_params = []

    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "conv_offset_mask" in tree:
                om_params.append((path, tree["conv_offset_mask"]))
            for k in sorted(tree):
                walk(tree[k], f"{path}/{k}")

    walk(variables["params"])
    return recorded, om_params


def capture_om_params(ckpt: str):
    """Just the conv_offset_mask param walk (for cached-tensor runs)."""
    import jax

    from centerpose_tpu.train.checkpoints import load_checkpoint

    payload = load_checkpoint(ckpt)
    om_params = []

    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "conv_offset_mask" in tree:
                om_params.append((path, tree["conv_offset_mask"]))
            for k in sorted(tree):
                walk(tree[k], f"{path}/{k}")

    walk(payload["params"])
    return None, om_params


def time_ms(fn, *args, iters=100):
    """Marginal per-call ms via the slope between two queue depths: the
    tunneled backend has a fixed per-run cost AND a per-call dispatch floor
    that shrinks with queue depth, so t(2N)-t(N) over N calls isolates the
    steady-state marginal cost better than a single averaged loop."""
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    t1 = run(iters)
    t2 = run(2 * iters)
    return max(t2 - t1, 0.0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="output/dla34_learn_artifact_r4/model_best")
    ap.add_argument("--json", default="output/dcn_overhead.json")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from centerpose_tpu.ops import dcn_pallas as dp

    cache = os.environ.get("DCN_CAPTURE_CACHE", "")
    if cache and os.path.exists(cache):
        import ml_dtypes

        d = np.load(cache)
        n = max(int(k.rsplit("_", 1)[1]) for k in d.files) + 1
        recorded = [
            {k: (d[f"{k}_{i}"].view(ml_dtypes.bfloat16)
                 if d[f"{k}_{i}"].dtype.kind == "V" else d[f"{k}_{i}"])
             for k in ("x", "offset", "mask", "weight", "bias")}
            for i in range(n)]
        _, om_params = capture_om_params(args.ckpt)
        print(f"loaded {n} captured instances from {cache}", flush=True)
    else:
        print("capturing real per-instance DCN inputs (eager)...", flush=True)
        recorded, om_params = capture_instances(args.ckpt)
        print(f"captured {len(recorded)} DCN instances, "
              f"{len(om_params)} offset convs", flush=True)
        if cache:
            np.savez(cache, **{f"{k}_{i}": rec[k]
                               for i, rec in enumerate(recorded)
                               for k in rec})

    # Per-dispatch floor of the tunneled backend at this queue depth: tiny
    # ops bottom out here, so isolated sub-floor costs are upper bounds.
    floor = time_ms(jax.jit(lambda a: a.sum()), jnp.ones((8, 8)),
                    iters=args.iters)
    print(f"dispatch floor ~{floor:.3f} ms/call at iters={args.iters}",
          flush=True)

    rows = []
    for idx, rec in enumerate(recorded):
        x = jnp.asarray(rec["x"])
        off = jnp.asarray(rec["offset"])
        mask = jnp.asarray(rec["mask"])
        w = jnp.asarray(rec["weight"])
        bias = jnp.asarray(rec["bias"])
        b_, h, wdt, cin = x.shape
        cout = w.shape[-1]
        site = f"{cin}->{cout} @{h}x{wdt}"
        grouped = dp._grouped_ok(h, wdt, cin, cout,
                                 dp.resolve_max_dy(h, wdt, cin, cout))

        # NOTE: every tensor is an explicit jit ARGUMENT.  Closing over
        # device arrays as jit constants re-stages them per call on this
        # tunneled backend (measured: a 73 KB closed-over weight inflated
        # a 4 ms call to 90 ms); args stay device-resident.
        t_full = time_ms(jax.jit(lambda x, o, m, w, b:
                                 dp.dcn_v2_pallas(x, o, m, w, b).sum()),
                         x, off, mask, w, bias, iters=args.iters)

        # (a) the offset/mask conv exactly as nn.Conv runs it in-model.
        # The param-tree walk order differs from call order; the conv's cost
        # is shape-determined, so any instance with matching cin serves.
        om_path, om_p = next(
            (p, v) for p, v in om_params
            if np.asarray(v["kernel"]).shape[2] == cin)
        omw = jnp.asarray(np.asarray(om_p["kernel"])).astype(x.dtype)
        omb = jnp.asarray(np.asarray(om_p["bias"])).astype(x.dtype)

        def om_conv(x, omw, omb):
            y = lax.conv_general_dilated(
                x, omw, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (y + omb).astype(jnp.float32).sum()

        t_om = time_ms(jax.jit(om_conv), x, omw, omb, iters=args.iters)

        # (b) the layout prologs/epilogs the wrapper performs around the
        # kernel: x transpose+pad (+group), off/mask transpose (+group),
        # output un-group/transpose back to NHWC.
        PAD = 8

        def prologs(x, off, mask, grouped=grouped):
            xt = jnp.transpose(x, (0, 1, 3, 2)).astype(jnp.float32)
            offt = jnp.transpose(off, (0, 1, 3, 2)).astype(jnp.float32)
            maskt = jnp.transpose(mask, (0, 1, 3, 2)).astype(jnp.float32)
            if grouped:
                grp = 128 // wdt
                hg = h // grp
                xt = jnp.pad(xt, ((0, 0), (PAD * grp, 8 * grp),
                                  (0, dp._roundup(cin, 8) - cin), (0, 0)))
                xg = dp._group_rows(xt, grp)
                og = dp._group_rows(offt, grp)
                mg = dp._group_rows(maskt, grp)
                # epilog: ungroup + transpose a [B, hg, cout, 128] output
                fake = (xg[:, :hg, :cout, :] if cin >= cout else
                        jnp.concatenate([xg[:, :hg]] * ((cout + cin - 1) // cin),
                                        2)[:, :, :cout, :])
                out = jnp.transpose(
                    fake.reshape(b_, hg, cout, grp, wdt), (0, 1, 3, 4, 2)
                ).reshape(b_, h, wdt, cout)
                return (og.sum() + mg.sum() + out.astype(jnp.float32).sum())
            xt = jnp.pad(xt, ((0, 0), (PAD, PAD),
                              (0, dp._roundup(cin, 8) - cin), (0, 0)))
            fake = (xt[:, PAD:PAD + h, :cout, :] if cin >= cout else
                    jnp.concatenate([xt[:, PAD:PAD + h]] * (cout // cin), 2))
            out = jnp.transpose(fake, (0, 1, 3, 2))
            return (offt.sum() + maskt.sum()
                    + out.astype(jnp.float32).sum())

        t_prolog = time_ms(jax.jit(prologs), x, off, mask, iters=args.iters)

        # offset realism for the record
        dyp = np.abs(np.asarray(off, np.float32)
                     .reshape(b_, h, wdt, 9, 2)[..., 0])
        row = dict(i=idx, site=site, om_path=om_path, grouped=bool(grouped),
                   dtype=str(x.dtype),
                   dy_p50=round(float(np.percentile(dyp, 50)), 2),
                   dy_p99=round(float(np.percentile(dyp, 99)), 2),
                   t_full_ms=round(t_full, 3), t_om_ms=round(t_om, 3),
                   t_prolog_ms=round(t_prolog, 3))
        rows.append(row)
        print(json.dumps(row), flush=True)

    tot = {k: round(sum(r[k] for r in rows), 2)
           for k in ("t_full_ms", "t_om_ms", "t_prolog_ms")}
    out = {"ckpt": args.ckpt, "batch": int(recorded[0]["x"].shape[0]),
           "dispatch_floor_ms": round(floor, 3),
           "instances": rows, "totals": tot,
           "note": ("t_full = isolated fused call (NHWC io, real learned "
                    "tensors); t_om = the standalone offset/mask conv "
                    "(folding candidate a); t_prolog = layout transforms "
                    "only (persistence candidate b).  In-model DCN total "
                    "for the same checkpoint: output/step_ablation.json")}
    print(json.dumps(tot), flush=True)
    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
