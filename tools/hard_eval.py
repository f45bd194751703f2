#!/usr/bin/env python
"""Hard-benchmark evaluation driver (VERDICT r4 task 2).

Re-anchors every accuracy claim on the NON-SATURATING synthetic set
(``data/synthetic.render_scene_hard``: heavy crowding, log-uniform scale down
to ~6% image height, articulated poses, occluder patches, skeleton-like
clutter).  The original easy set saturates at ~0.99 AP where no regression
under ~2 points is detectable; on the hard set a converged flagship lands
mid-range, so cross-impl / dtype / TTA deltas are resolvable again.

Runs tools/evaluate.py once per (checkpoint, mode) row in a declarative plan
and assembles ``output/hard_eval.json``:

  - flagship TTA ladder: single -> flip -> multi-scale+flip+soft-NMS
    (reference test.py --flip_test --test_scales, SURVEY.md §3.4)
  - flagship cross-impl: pallas_full+bf16 (shipping) vs xla+bf16 vs
    xla+f32 — the same checkpoint through independent DCN implementations
  - per-backbone ladder: each trained checkpoint, single-scale

  python tools/hard_eval.py --n 512 --flagship output/dla34_hard_artifact \\
      --backbone res_18=output/res18_hard_artifact [...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP_MODES = {
    "single": [],
    "flip": ["test.flip_test", "true"],
    "ms_flip_nms": ["test.flip_test", "true",
                    "test.test_scales", "[0.75,1.0,1.25]"],
}

CROSS_IMPL = {
    "pallas_full_bf16": ["model.dcn_impl", "pallas_full",
                         "model.compute_dtype", "bfloat16"],
    "xla_bf16": ["model.dcn_impl", "xla", "model.compute_dtype", "bfloat16"],
    "xla_f32": ["model.dcn_impl", "xla", "model.compute_dtype", "float32"],
    "pallas_full_f32": ["model.dcn_impl", "pallas_full",
                        "model.compute_dtype", "float32"],
}


def run_eval(cfg_yaml, ckpt, n, extra_opts, workers=4, timeout=3600):
    """One tools/evaluate.py subprocess on the hard set; returns its stats."""
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_json = tf.name
    cmd = [sys.executable, os.path.join(REPO, "tools", "evaluate.py"),
           "--synthetic", "--hard", "--synthetic-size", str(n),
           "--synthetic-seed", "3",  # pure held-out: train=1, AP-gate val=2
           "--workers", str(workers), "--json", out_json]
    if cfg_yaml:
        cmd += ["--cfg", cfg_yaml]
    cmd += ["test.model_path", ckpt] + list(extra_opts)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                       cwd=REPO)
    if r.returncode != 0:
        raise RuntimeError(f"eval failed: {' '.join(cmd)}\n{r.stderr[-2000:]}")
    with open(out_json) as f:
        payload = json.load(f)
    os.unlink(out_json)
    payload["cmd_opts"] = list(extra_opts)
    return payload


def ckpt_path(artifact_dir: str) -> str:
    """model_best when the (untracked) orbax dir is on disk, else the
    committed reproducible f16 snapshot next to it."""
    best = os.path.join(artifact_dir, "model_best")
    if os.path.isdir(best):
        return best
    npz = os.path.join(artifact_dir, "params_f16.npz")
    if os.path.exists(npz):
        return npz
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512,
                    help="hard eval-set size (seed=2, held out from train "
                         "seed=1)")
    ap.add_argument("--flagship", default="output/dla34_hard_artifact",
                    help="flagship artifact dir (uses <dir>/model_best)")
    ap.add_argument("--flagship-cfg", default="experiments/dla_34_512x512.yaml")
    ap.add_argument("--backbone", action="append", default=[],
                    metavar="NAME=CKPT_DIR[:CFG]",
                    help="additional per-backbone rows")
    ap.add_argument("--skip-cross-impl", action="store_true")
    ap.add_argument("--skip-tta", action="store_true")
    ap.add_argument("--json", default="output/hard_eval.json")
    args = ap.parse_args()

    out = {
        "eval_set": {
            "generator": "data/synthetic.render_scene_hard",
            "n_images": args.n,
            "seed": 3,
            "note": ("pure held-out: train scenes use seed=1, the AP-gating "
                     "val split seed=2, this benchmark seed=3; crowding "
                     "3-10 persons, log-uniform scale to ~6% img height, "
                     "occluders flip covered joints to vis=1"),
        },
    }
    if os.path.exists(args.json):  # accumulate across partial runs
        with open(args.json) as f:
            prev = json.load(f)
        if prev.get("eval_set", {}).get("n_images") == args.n:
            out = prev

    def save():
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)

    ckpt = ckpt_path(args.flagship)
    if not args.skip_tta:
        fl = out.setdefault("flagship", {"arch": "dla_34", "ckpt": ckpt})
        modes = fl.setdefault("modes", {})
        for mode, opts in FLAGSHIP_MODES.items():
            if mode in modes:
                continue
            print(f"== flagship {mode}", flush=True)
            modes[mode] = run_eval(args.flagship_cfg, ckpt, args.n, opts)
            save()
            print(json.dumps(modes[mode]["stats"]), flush=True)

    if not args.skip_cross_impl:
        fl = out.setdefault("flagship", {"arch": "dla_34", "ckpt": ckpt})
        ci = fl.setdefault("cross_impl", {})
        for name, opts in CROSS_IMPL.items():
            if name in ci:
                continue
            print(f"== cross-impl {name}", flush=True)
            ci[name] = run_eval(args.flagship_cfg, ckpt, args.n, opts)
            save()
            print(json.dumps(ci[name]["stats"]), flush=True)

    bb = out.setdefault("backbones", {})
    for spec in args.backbone:
        name, _, rest = spec.partition("=")
        ckpt_dir, _, cfg = rest.partition(":")
        if name in bb:
            continue
        print(f"== backbone {name}", flush=True)
        # per-backbone rows are SINGLE-scale (comparable across archs even
        # when a yaml ships a TTA eval mode, e.g. hrnet's ms-flip config)
        opts = ["test.flip_test", "false", "test.test_scales", "[1.0]"]
        if not cfg:
            opts += ["model.name", name]
        bb[name] = run_eval(cfg or None, ckpt_path(ckpt_dir), args.n, opts)
        save()
        print(json.dumps(bb[name]["stats"]), flush=True)

    save()
    print("wrote", args.json)


if __name__ == "__main__":
    main()
