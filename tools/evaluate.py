#!/usr/bin/env python
"""Evaluation CLI (reference: tools/evaluate.py / test.py, SURVEY.md §3.4).

Runs the detector over the val split with host/device pipelining (the
reference's PrefetchDataset analog — see centerpose_tpu/eval/harness.py) and
reports OKS keypoint AP + bbox AP.

  python tools/evaluate.py --cfg experiments/dla_34_512x512.yaml \
      test.model_path output/default/model_best [KEY VALUE ...]
  python tools/evaluate.py --cfg ... --synthetic   # no-COCO smoke eval
  python tools/evaluate.py --cfg ... --workers 0   # serial baseline
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="centerpose_tpu evaluation")
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-size", type=int, default=64)
    p.add_argument("--synthetic-seed", type=int, default=2,
                   help="scene seed (train CLI uses 1 for train / 2 for the "
                        "AP-gating val split; use a fresh seed, e.g. 3, for "
                        "a benchmark no selection decision ever saw)")
    p.add_argument("--hard", action="store_true",
                   help="hard synthetic distribution (non-saturating)")
    p.add_argument("--limit", type=int, default=0, help="evaluate first N images")
    p.add_argument("--workers", type=int, default=4,
                   help="pre-process threads (0 = serial detector.run loop)")
    p.add_argument("--json", type=str, default="",
                   help="also dump {stats, timing} to this path")
    p.add_argument("opts", nargs="*")
    return p.parse_args()


def load_detector(cfg):
    import jax

    from centerpose_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from centerpose_tpu.inference.detector import Detector
    from centerpose_tpu.models.factory import create_model, init_model
    from centerpose_tpu.train.checkpoints import (
        load_checkpoint,
        restore_params_filtered,
        warn_impl_mismatch,
    )

    variables = None
    if cfg.test.model_path:
        model = create_model(cfg)
        variables = init_model(model, jax.random.PRNGKey(0), cfg.model.input_res)
        if cfg.test.model_path.endswith(".npz"):
            # committed float16 weight snapshot (fresh-clone reproducibility;
            # the orbax checkpoint dirs themselves are untracked)
            from centerpose_tpu.train.checkpoints import load_params_npz

            variables = load_params_npz(variables, cfg.test.model_path)
        else:
            warn_impl_mismatch(cfg, cfg.test.model_path)
            payload = load_checkpoint(cfg.test.model_path)
            variables = {
                "params": restore_params_filtered(
                    variables["params"], payload["params"]),
                "batch_stats": payload.get(
                    "batch_stats", variables.get("batch_stats")),
            }
    return Detector(cfg, variables)


def main():
    args = parse_args()
    from centerpose_tpu.config import load_config
    from centerpose_tpu.eval.harness import evaluate_detector

    cfg = load_config(args.cfg, args.opts)

    if args.synthetic:
        from centerpose_tpu.data.synthetic import SyntheticEvalDataset

        dataset = SyntheticEvalDataset(args.synthetic_size,
                                       seed=args.synthetic_seed,
                                       hard=args.hard)

        def items():
            for i, img in dataset.items():
                yield i, img

    else:
        from centerpose_tpu.data.coco import COCOHP

        dataset = COCOHP(cfg, "val")

        def items():
            for i in range(len(dataset)):
                yield dataset.img_ids[i], dataset.image_path(i)

    detector = load_detector(cfg)
    n = len(dataset)
    if args.limit:
        n = min(n, args.limit)

    def limited():
        for k, item in enumerate(items()):
            if k >= n:
                return
            yield item

    def progress(done):
        if done % 50 == 0:
            print(f"[{done}/{n}]", flush=True)

    results, times, wall = evaluate_detector(
        detector, limited(), workers=args.workers, progress=progress
    )

    stats = dataset.run_eval(results, save_dir=os.path.join(cfg.output_dir, cfg.exp_id))
    print(f"\nimages: {n}  wall: {wall:.1f}s  ({n / wall:.2f} img/s, "
          f"workers={args.workers})")
    for k in ("tot", "pre", "net", "post", "merge"):
        print(f"  {k}: {1000 * times[k] / n:.1f} ms/img")
    print("\nCOCO-protocol AP:")
    for k, v in stats.items():
        print(f"  {k:10s} {v:.4f}")

    if args.json:
        import json

        payload = {
            "stats": {k: round(float(v), 4) for k, v in stats.items()},
            "n_images": n,
            "wall_s": round(wall, 1),
            "img_per_s": round(n / wall, 2),
            "ms_per_img": {k: round(1000 * times[k] / n, 1) for k in times},
            "hard": bool(args.hard),
            "model_path": cfg.test.model_path,
        }
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
