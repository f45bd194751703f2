#!/usr/bin/env python
"""Evaluation CLI (reference: tools/evaluate.py / test.py, SURVEY.md §3.4).

Runs the detector over the val split and reports OKS keypoint AP.

  python tools/evaluate.py --cfg experiments/dla_34_512x512.yaml \
      test.model_path output/default/model_best [KEY VALUE ...]
  python tools/evaluate.py --cfg ... --synthetic   # no-COCO smoke eval
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="centerpose_tpu evaluation")
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-size", type=int, default=64)
    p.add_argument("--limit", type=int, default=0, help="evaluate first N images")
    p.add_argument("opts", nargs="*")
    return p.parse_args()


def load_detector(cfg):
    import jax

    from centerpose_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from centerpose_tpu.inference.detector import Detector
    from centerpose_tpu.models.factory import create_model, init_model
    from centerpose_tpu.train.checkpoints import load_checkpoint, restore_params_filtered

    variables = None
    if cfg.test.model_path:
        model = create_model(cfg)
        variables = init_model(model, jax.random.PRNGKey(0), cfg.model.input_res)
        payload = load_checkpoint(cfg.test.model_path)
        variables = {
            "params": restore_params_filtered(variables["params"], payload["params"]),
            "batch_stats": payload.get("batch_stats", variables.get("batch_stats")),
        }
    return Detector(cfg, variables)


def main():
    args = parse_args()
    from centerpose_tpu.config import load_config

    cfg = load_config(args.cfg, args.opts)

    if args.synthetic:
        from centerpose_tpu.data.synthetic import SyntheticPoseDataset

        ds = SyntheticPoseDataset(args.synthetic_size, seed=2)

        # adapt to the COCO eval protocol: fabricate image ids / gt anns
        class _Wrap:
            def __len__(self):
                return len(ds)

            def get_raw(self, i):
                return ds.get_raw(i)

            def gt_annotations(self):
                gts = []
                for i in range(len(ds)):
                    _, anns = ds.get_raw(i)
                    for k, a in enumerate(anns):
                        gts.append(
                            dict(a, id=i * 100 + k, image_id=i, iscrowd=0)
                        )
                return gts

        dataset = _Wrap()
        from centerpose_tpu.data.coco import COCOHP

        convert = COCOHP.convert_eval_format.__get__(dataset)
        from centerpose_tpu.eval.coco_eval import evaluate_keypoints

        def run_eval(results, save_dir=None):
            return evaluate_keypoints(dataset.gt_annotations(), convert(results))

    else:
        from centerpose_tpu.data.coco import COCOHP

        dataset = COCOHP(cfg, "val")
        run_eval = dataset.run_eval

    detector = load_detector(cfg)
    n = len(dataset)
    if args.limit:
        n = min(n, args.limit)

    results = {}
    times = {"tot": 0.0, "pre": 0.0, "net": 0.0, "post": 0.0, "merge": 0.0}
    t_start = time.time()
    for i in range(n):
        img, _ = dataset.get_raw(i) if args.synthetic else (None, None)
        if not args.synthetic:
            ret = detector.run(dataset.image_path(i))
        else:
            ret = detector.run(img)
        img_id = i if args.synthetic else dataset.img_ids[i]
        results[img_id] = ret["results"]
        for k in times:
            times[k] += ret[k]
        if (i + 1) % 50 == 0:
            print(f"[{i + 1}/{n}] avg {1000 * times['tot'] / (i + 1):.1f} ms/img", flush=True)
    wall = time.time() - t_start

    stats = run_eval(results, save_dir=os.path.join(cfg.output_dir, cfg.exp_id))
    print(f"\nimages: {n}  wall: {wall:.1f}s  ({n / wall:.2f} img/s)")
    for k in ("tot", "pre", "net", "post", "merge"):
        print(f"  {k}: {1000 * times[k] / n:.1f} ms/img")
    print("\nOKS keypoint AP:")
    for k, v in stats.items():
        print(f"  {k:5s} {v:.4f}")


if __name__ == "__main__":
    main()
