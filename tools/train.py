#!/usr/bin/env python
"""Training CLI (reference: tools/train.py, SURVEY.md §3.1).

Usage:
  python tools/train.py --cfg experiments/res_18_512x512.yaml [KEY VALUE ...]
  python tools/train.py --cfg ... --synthetic        # no-COCO smoke training
  python tools/train.py --cfg ... --multihost        # jax.distributed init

One process per host; the device mesh spans all chips.  Epoch loop with
step-decay LR, periodic validation (loss + keypoint AP via the detector),
model_last / model_best checkpoints, resume.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))



def parse_args():
    p = argparse.ArgumentParser(description="centerpose_tpu training")
    p.add_argument("--cfg", type=str, default=None, help="experiment yaml")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (no COCO required)")
    p.add_argument("--synthetic-size", type=int, default=256)
    p.add_argument("--hard", action="store_true",
                   help="hard synthetic distribution (crowding/occlusion/"
                        "small persons; the non-saturating benchmark)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() before device use")
    p.add_argument("--max-steps", type=int, default=0,
                   help="optional hard cap on total steps (smoke tests)")
    p.add_argument("--profile-dir", type=str, default="",
                   help="capture a jax.profiler trace into this directory")
    p.add_argument("--profile-steps", type=str, default="10:15",
                   help="start:stop step window for --profile-dir traces")
    p.add_argument("opts", nargs="*", help="KEY VALUE config override pairs")
    return p.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        from centerpose_tpu.parallel.mesh import init_distributed

        init_distributed()

    import jax

    from centerpose_tpu.utils.platform import apply_platform_env

    apply_platform_env()

    from centerpose_tpu.config import load_config
    from centerpose_tpu.data.loader import DataLoader, prefetch_to_device
    from centerpose_tpu.models.factory import create_model
    from centerpose_tpu.parallel.mesh import create_mesh
    from centerpose_tpu.train.checkpoints import (
        ckpt_meta,
        load_checkpoint,
        restore_state,
        save_checkpoint,
    )
    from centerpose_tpu.train.trainer import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from centerpose_tpu.utils.logger import AverageMeter, Logger

    cfg = load_config(args.cfg, args.opts)
    logger = Logger(cfg)
    logger.write(
        f"devices: {jax.device_count()} ({jax.local_device_count()} local), "
        f"process {jax.process_index()}/{jax.process_count()}"
    )

    # dataset
    if args.synthetic:
        from centerpose_tpu.data.synthetic import (
            SyntheticEvalDataset,
            SyntheticPoseDataset,
        )

        # --hard: the non-saturating benchmark distribution (crowded /
        # occluded / small persons; data/synthetic.render_scene_hard)
        train_ds = SyntheticPoseDataset(args.synthetic_size, seed=1,
                                        hard=args.hard)
        val_n = max(32, args.synthetic_size // 8)
        val_ds = SyntheticPoseDataset(val_n, seed=2, hard=args.hard)
        ap_dataset = SyntheticEvalDataset(val_n, seed=2, hard=args.hard)

        def ap_items():
            return ap_dataset.items()

    else:
        from centerpose_tpu.data.coco import COCOHP

        train_ds = COCOHP(cfg, "train")
        val_ds = COCOHP(cfg, "val")
        ap_dataset = val_ds

        def ap_items():
            for i in range(len(val_ds)):
                yield val_ds.img_ids[i], val_ds.image_path(i)
    logger.write(f"train {len(train_ds)} images, val {len(val_ds)} images")

    mesh = create_mesh()
    n_dev = mesh.devices.size
    global_batch = cfg.train.batch_size
    assert global_batch % n_dev == 0, (global_batch, n_dev)

    train_loader = DataLoader(
        train_ds, cfg, batch_size=global_batch // jax.process_count(),
        is_train=True, num_workers=cfg.train.num_workers, seed=cfg.train.seed,
        shard_id=jax.process_index(), num_shards=jax.process_count(),
    )
    steps_per_epoch = max(1, train_loader.steps_per_epoch())

    model = create_model(cfg)
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(cfg.train.seed), steps_per_epoch, mesh
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.write(f"model {cfg.model.name}: {n_params / 1e6:.2f}M params")

    start_epoch = 0
    last_path = os.path.join(logger.log_dir, "model_last")
    if cfg.train.resume and os.path.exists(last_path):
        payload = load_checkpoint(last_path)
        state = restore_state(state, payload)
        start_epoch = int(payload["epoch"])
        logger.write(f"resumed from {last_path} at epoch {start_epoch}")

    train_step = make_train_step(model, cfg, mesh)
    eval_step = make_eval_step(model, cfg, mesh)

    # Detector for the val-interval AP pass (built once: its jitted
    # forward+decode compiles on first use and is reused every interval).
    # model_best is gated on this AP, matching the reference's best-AP
    # checkpointing (SURVEY.md §3.1).
    from centerpose_tpu.eval.harness import evaluate_detector
    from centerpose_tpu.inference.detector import Detector

    ap_detector = Detector(cfg) if jax.process_index() == 0 else None

    def run_ap_eval(state):
        ap_detector.variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        limit = cfg.train.val_ap_limit

        def limited():
            for k, item in enumerate(ap_items()):
                if limit and k >= limit:
                    return
                yield item

        results, _, wall = evaluate_detector(ap_detector, limited(), workers=2)
        # score ONLY the evaluated images: under val_ap_limit the gate AP is
        # the true AP of that subset, not deflated by the unevaluated rest
        stats = ap_dataset.run_eval(results, img_ids=list(results.keys()))
        stats["eval_wall_s"] = wall
        return stats

    from centerpose_tpu.utils.profiling import step_trace_window

    prof_start, prof_stop = (int(v) for v in args.profile_steps.split(":"))
    best_metric = -float("inf")
    total_steps = 0
    with step_trace_window(args.profile_dir, prof_start, prof_stop) as tick:
      for epoch in range(start_epoch + 1, cfg.train.epochs + 1):
        meters = {}
        t0 = time.time()
        n_seen = 0
        data_wait = 0.0  # host-starvation time: blocked on the prefetch
        batch_iter = prefetch_to_device(train_loader.epoch(epoch), mesh)
        while True:
            t_w = time.time()
            batch = next(batch_iter, None)
            data_wait += time.time() - t_w
            if batch is None:
                break
            tick(total_steps)
            state, stats = train_step(state, batch)
            total_steps += 1
            n_seen += global_batch
            if total_steps % 20 == 0 or total_steps == 1:
                host_stats = {k: float(v) for k, v in stats.items()}
                for k, v in host_stats.items():
                    meters.setdefault(k, AverageMeter()).update(v)
            if args.max_steps and total_steps >= args.max_steps:
                break
        dt = time.time() - t0
        epoch_stats = {k: m.avg for k, m in meters.items()}
        epoch_stats["img_per_s"] = n_seen / max(dt, 1e-9)
        # the reference trainer's data-time / batch-time split
        # (SURVEY.md §2 #21): time blocked on the input pipeline vs total
        epoch_stats["data_wait_s"] = round(data_wait, 2)
        epoch_stats["data_wait_frac"] = round(data_wait / max(dt, 1e-9), 3)
        logger.log_stats("train", epoch, total_steps, epoch_stats)

        if jax.process_index() == 0:
            save_checkpoint(last_path, state, epoch, meta=ckpt_meta(cfg))
            if cfg.train.save_all:
                save_checkpoint(
                    os.path.join(logger.log_dir, f"model_{epoch}"), state,
                    epoch, meta=ckpt_meta(cfg),
                )

        if cfg.train.val_intervals > 0 and epoch % cfg.train.val_intervals == 0:
            val_loader = DataLoader(
                val_ds, cfg, batch_size=global_batch // jax.process_count(),
                is_train=False, num_workers=0, seed=0,
                shard_id=jax.process_index(), num_shards=jax.process_count(),
            )
            vmeters = {}
            debug_batch = None
            for batch in prefetch_to_device(val_loader.epoch(0), mesh):
                stats = eval_step(state, batch)
                if debug_batch is None:
                    debug_batch = batch
                for k, v in stats.items():
                    vmeters.setdefault(k, AverageMeter()).update(float(v))
            if cfg.debug > 0 and debug_batch is not None and jax.process_index() == 0:
                from centerpose_tpu.utils.debugger import render_train_debug

                render_train_debug(
                    model,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    debug_batch, cfg,
                    os.path.join(logger.log_dir, "debug", f"epoch_{epoch}"),
                )
            val_stats = {k: m.avg for k, m in vmeters.items()}
            logger.log_stats("val", epoch, total_steps, val_stats)
            if jax.process_index() == 0:
                ap_stats = run_ap_eval(state)
                logger.log_stats("val_ap", epoch, total_steps, ap_stats)
                metric = ap_stats.get("AP", -1.0)
                if metric > best_metric:
                    best_metric = metric
                    save_checkpoint(
                        os.path.join(logger.log_dir, "model_best"), state,
                        epoch, meta=ckpt_meta(cfg),
                    )
                    logger.write(f"new best (val AP {metric:.4f}) at epoch {epoch}")

        if args.max_steps and total_steps >= args.max_steps:
            logger.write(f"hit --max-steps={args.max_steps}, stopping")
            break

    train_loader.close()
    from centerpose_tpu.train.checkpoints import wait_for_saves

    wait_for_saves()  # finalize the last async checkpoint before exiting
    logger.write("done")


if __name__ == "__main__":
    main()
