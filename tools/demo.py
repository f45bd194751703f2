#!/usr/bin/env python
"""Demo CLI (reference: tools/demo.py, SURVEY.md §3.5).

  python tools/demo.py --cfg experiments/res_18_512x512.yaml --demo img.jpg
  python tools/demo.py --cfg ... --demo images_dir/ --out vis/
  python tools/demo.py --cfg ... --demo video.mp4 --batch 8
  python tools/demo.py --cfg ... --demo synthetic      # rendered scenes

Per-frame pipeline with the per-stage time breakdown; video mode batches
frames through one device call (BASELINE config #5).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


def parse_args():
    p = argparse.ArgumentParser(description="centerpose_tpu demo")
    p.add_argument("--cfg", type=str, default=None)
    p.add_argument("--demo", type=str, required=True,
                   help="image / image dir / video file / 'synthetic'")
    p.add_argument("--out", type=str, default="demo_out")
    p.add_argument("--batch", type=int, default=8, help="video batch size")
    p.add_argument("opts", nargs="*")
    return p.parse_args()


def main():
    args = parse_args()
    import cv2

    from centerpose_tpu.config import load_config
    from centerpose_tpu.utils.debugger import Debugger

    sys.path.insert(0, os.path.dirname(__file__))
    from evaluate import load_detector

    cfg = load_config(args.cfg, args.opts)
    detector = load_detector(cfg)
    os.makedirs(args.out, exist_ok=True)

    if args.demo == "synthetic":
        from centerpose_tpu.data.synthetic import render_scene

        frames = []
        for i in range(4):
            img, _ = render_scene(np.random.default_rng(i), 640, 480, 2)
            frames.append((f"synthetic_{i}", img))
    elif os.path.isdir(args.demo):
        frames = [
            (os.path.splitext(f)[0], None, os.path.join(args.demo, f))
            for f in sorted(os.listdir(args.demo))
            if f.lower().endswith(IMG_EXTS)
        ]
        frames = [(n, cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)) for n, _, p in frames]
    elif args.demo.lower().endswith(IMG_EXTS):
        img = cv2.cvtColor(cv2.imread(args.demo), cv2.COLOR_BGR2RGB)
        frames = [(os.path.splitext(os.path.basename(args.demo))[0], img)]
    else:
        return run_video(args, cfg, detector)

    for name, img in frames:
        ret = detector.run(img)
        dbg = Debugger()
        dbg.add_img(cv2.cvtColor(img, cv2.COLOR_RGB2BGR), name)
        dbg.add_multi_pose(ret["results"][1], cfg.test.vis_thresh, name)
        dbg.save_all_imgs(args.out)
        print(
            f"{name}: tot {1000 * ret['tot']:.1f}ms | pre {1000 * ret['pre']:.1f} "
            f"net {1000 * ret['net']:.1f} post {1000 * ret['post']:.1f} "
            f"merge {1000 * ret['merge']:.1f}"
        )
    print(f"saved visualizations to {args.out}/")


def run_video(args, cfg, detector):
    """Batched video-stream inference: decode N frames -> one device call."""
    import time

    import cv2

    from centerpose_tpu.inference.post_process import multi_pose_post_process
    from centerpose_tpu.utils.debugger import Debugger

    cap = cv2.VideoCapture(0 if args.demo == "webcam" else args.demo)
    assert cap.isOpened(), f"cannot open {args.demo}"
    writer = None
    n_frames = 0
    t0 = time.time()
    while True:
        batch_frames = []
        for _ in range(args.batch):
            ok, frame = cap.read()
            if not ok:
                break
            batch_frames.append(frame)
        if not batch_frames:
            break
        pre = [detector.pre_process(cv2.cvtColor(f, cv2.COLOR_BGR2RGB)) for f in batch_frames]
        images = np.concatenate([p[0] for p in pre], axis=0)
        dets = detector.run_batch(images)  # [N, K, 40], one device call
        for bi, (frame, (_, meta)) in enumerate(zip(batch_frames, pre)):
            res = multi_pose_post_process(
                dets[bi : bi + 1], [meta["c"]], [meta["s"]],
                meta["out_height"], meta["out_width"],
            )[0][1]
            dbg = Debugger()
            dbg.add_img(frame, "f")
            dbg.add_multi_pose(res, cfg.test.vis_thresh, "f")
            vis = dbg.imgs["f"]
            if writer is None:
                writer = cv2.VideoWriter(
                    os.path.join(args.out, "out.mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"), 24,
                    (vis.shape[1], vis.shape[0]),
                )
            writer.write(vis)
            n_frames += 1
    wall = time.time() - t0
    if writer is not None:
        writer.release()
    print(f"{n_frames} frames in {wall:.1f}s -> {n_frames / wall:.1f} FPS; saved {args.out}/out.mp4")


if __name__ == "__main__":
    main()
