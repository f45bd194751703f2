#!/usr/bin/env python
"""Validate the fused-kernel per-site y-clamp against *learned* offsets
(VERDICT r2 item 7; radii per VERDICT r3 item 1).

Loads a trained dla_34 checkpoint, captures every DCN site's offset-conv
output over validation images (flax capture_intermediates), histograms the
learned dy/dx magnitudes, and reports how often the clamp would bind.  Also
evaluates AP with dcn_impl=pallas_full vs the unclamped XLA path on the same
checkpoint to quantify the end-metric delta of the clamp envelope.

  python tools/offsets_hist.py --ckpt output/dla34_learn_artifact/model_best \
      [--images 32] [--json output/offsets_hist.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="output/dla34_learn_artifact/model_best")
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--json", default="output/offsets_hist.json")
    ap.add_argument("--skip-ap", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from centerpose_tpu.config import load_config
    from centerpose_tpu.data.encode import encode_example
    from centerpose_tpu.data.synthetic import SyntheticEvalDataset
    from centerpose_tpu.models.factory import create_model
    from centerpose_tpu.train.checkpoints import load_checkpoint

    cfg = load_config(opts=[
        "model.name", "dla_34", "model.head_conv", "256",
        "model.dcn_impl", "pallas_full", "model.compute_dtype", "bfloat16",
    ])
    payload = load_checkpoint(args.ckpt)
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    model = create_model(cfg)

    ds = SyntheticEvalDataset(args.images, seed=2)
    batch = []
    for i in range(args.images):
        img, anns = ds.get_raw(i)
        ex = encode_example(img, anns, cfg, None, False)
        batch.append(ex["input"])
    x = jnp.asarray(np.stack(batch))

    def keep(mdl, method_name):
        return mdl.name == "conv_offset_mask"

    @jax.jit
    def capture(v, x):
        _, inter = model.apply(
            v, x, train=False, capture_intermediates=keep,
        )
        return inter["intermediates"]

    inter = jax.device_get(capture(variables, x))

    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "__call__" in tree:
                yield path, tree["__call__"][0]
            else:
                for k, v in tree.items():
                    yield from walk(v, f"{path}/{k}" if path else k)

    from centerpose_tpu.ops.dcn_pallas import resolve_max_dy

    def site_channels(path):
        """(cin, cout) of the DCN owning this conv_offset_mask, from its
        sibling `kernel` param — resolution depends on real channel widths
        via the grouped VMEM gate, so proxy channels would mis-report the
        radius for wide variants."""
        node = variables["params"]
        for part in path.split("/")[:-1]:  # drop 'conv_offset_mask'
            node = node[part]
        kshape = np.shape(node["kernel"])  # [3, 3, cin, cout]
        return int(kshape[2]), int(kshape[3])

    sites = []
    worst = 0.0
    for path, om in sorted(walk(inter)):
        om = np.asarray(om, np.float32)
        k2 = om.shape[-1] // 3
        off = om[..., : 2 * k2].reshape(*om.shape[:-1], k2, 2)
        dy = off[..., 0].ravel()
        dx = off[..., 1].ravel()
        ady, adx = np.abs(dy), np.abs(dx)
        hw = om.shape[1]
        cin, cout = site_channels(path)
        md = resolve_max_dy(hw, om.shape[2], cin, cout)
        row = {
            "site": path,
            "shape": list(om.shape[1:3]),
            "max_dy": int(md),
            "dy_p50": round(float(np.percentile(ady, 50)), 4),
            "dy_p99": round(float(np.percentile(ady, 99)), 4),
            "dy_max": round(float(ady.max()), 4),
            "dx_p50": round(float(np.percentile(adx, 50)), 4),
            "dx_p99": round(float(np.percentile(adx, 99)), 4),
            "dx_max": round(float(adx.max()), 4),
            "frac_dy_gt1": round(float((ady > 1.0).mean()), 6),
            "frac_dy_gt4": round(float((ady > 4.0).mean()), 6),
            "frac_dy_clamped": round(float((ady > md).mean()), 6),
        }
        worst = max(worst, row["frac_dy_clamped"])
        sites.append(row)
        print(json.dumps(row), flush=True)
    print(f"worst clamp-binding fraction across sites: {worst:.6f}",
          flush=True)

    out = {"ckpt": args.ckpt, "n_images": args.images, "sites": sites,
           "worst_frac_dy_clamped": worst}

    if not args.skip_ap:
        from centerpose_tpu.eval.harness import evaluate_detector
        from centerpose_tpu.inference.detector import Detector

        out["ap"] = {}
        for impl in ("pallas_full", "xla"):
            cfg_i = load_config(opts=[
                "model.name", "dla_34", "model.head_conv", "256",
                "model.dcn_impl", impl, "model.compute_dtype", "bfloat16",
            ])
            det = Detector(cfg_i)
            det.variables = variables
            results, _, wall = evaluate_detector(det, ds.items(), workers=2)
            stats = ds.run_eval(results)
            out["ap"][impl] = {k: round(float(v), 4)
                               for k, v in stats.items()
                               if not k.startswith("bbox")}
            print(impl, "AP", stats["AP"], f"({wall:.1f}s)", flush=True)
        out["ap_delta_pallas_vs_xla"] = round(
            out["ap"]["pallas_full"]["AP"] - out["ap"]["xla"]["AP"], 4)

    os.makedirs(os.path.dirname(args.json), exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
