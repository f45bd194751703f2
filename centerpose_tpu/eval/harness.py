"""Pipelined detector evaluation harness.

The reference overlaps host preprocessing with device inference via a
``PrefetchDataset`` + DataLoader workers (reference tools/evaluate.py,
SURVEY.md §3.4).  The TPU-native version overlaps THREE stages:

1. **host pre-process** (cv2 affine warp + normalize) on a thread pool —
   cv2 releases the GIL, so threads give real parallelism;
2. **device forward+decode** via JAX's async dispatch — the jitted call
   returns immediately, so the device executes image *i* while the host
   pre-processes *i+n*;
3. **host post-process** (inverse affine + merge) on the main thread,
   draining a small in-flight queue so only completed device work is read
   back (the D2H sync point).

Used by tools/evaluate.py (the PrefetchDataset analog) and by the in-training
validation AP pass in tools/train.py (reference gates model_best on val AP —
SURVEY.md §3.1).
"""

from __future__ import annotations

import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, Optional, Tuple

import numpy as np

import jax.numpy as jnp


def evaluate_detector(
    detector,
    items: Iterable[Tuple[int, object]],
    workers: int = 4,
    inflight: int = 4,
    progress: Optional[Callable[[int], None]] = None,
) -> Tuple[Dict[int, Dict[int, np.ndarray]], Dict[str, float], float]:
    """Run ``detector`` over ``items`` = iterable of (img_id, image-or-path).

    Returns (results keyed by img_id, cumulative per-stage times, wall time).
    ``workers=0`` falls back to the serial ``detector.run`` path (useful as
    the baseline in speedup measurements).
    """
    times = {"tot": 0.0, "pre": 0.0, "net": 0.0, "post": 0.0, "merge": 0.0}
    results: Dict[int, Dict[int, np.ndarray]] = {}
    t_start = time.time()

    if workers <= 0:
        for n, (img_id, im) in enumerate(items):
            ret = detector.run(im)
            results[img_id] = ret["results"]
            for k in times:
                times[k] += ret[k]
            if progress:
                progress(n + 1)
        return results, times, time.time() - t_start

    scales = detector.cfg.test.test_scales

    def preproc(task):
        img_id, im = task
        t0 = time.time()
        if isinstance(im, str):
            import cv2

            im = cv2.cvtColor(cv2.imread(im), cv2.COLOR_BGR2RGB)
        per_scale = [detector.pre_process(im, s) for s in scales]
        return img_id, per_scale, time.time() - t0

    def drain(entry):
        img_id, dets_devs, metas, t_disp = entry
        net_dt = post_dt = 0.0
        detections = []
        for dets_dev, meta, scale in zip(dets_devs, metas, scales):
            t0 = time.time()
            dets = np.asarray(dets_dev)  # D2H sync for this image
            t1 = time.time()
            detections.append(detector.post_process(dets, meta, scale))
            net_dt += t1 - t0
            post_dt += time.time() - t1
        t2 = time.time()
        results[img_id] = detector.merge_outputs(detections)
        t3 = time.time()
        times["net"] += net_dt  # device wait + readback
        times["post"] += post_dt
        times["merge"] += t3 - t2
        times["tot"] += t3 - t_disp

    # (image, scale) slots accumulate into SHAPE BUCKETS across images and
    # dispatch as one batched device call per bucket, so eval never pays
    # batch-1 dispatches (r4 weak #4).  Originally for keep_res (per-image
    # pad-to-stride shapes), but equally load-bearing for single-scale
    # fix_res: every image shares one shape, so images ride the device in
    # batches of ``bucket_cap`` — on the tunneled backend the per-dispatch
    # floor dominates batch-1 eval.  Multi-scale fix_res keeps its own
    # all-scales-in-one-call branch below.
    bucketed = True
    bucket_cap = 8

    n_done = 0
    with ThreadPoolExecutor(max_workers=workers) as ex:
        pre_futs = deque()
        device_q = deque()
        pending = {}           # img_id -> dict(dets, metas, remaining, t)
        submit_order = deque()  # img_ids awaiting completion, FIFO
        buckets = {}           # input shape -> [(img_id, scale_idx, imgs)]
        items_it = iter(items)

        def submit_more():
            # keep up to 2*workers pre-process tasks in flight
            while len(pre_futs) < 2 * workers:
                try:
                    task = next(items_it)
                except StopIteration:
                    return False
                pre_futs.append(ex.submit(preproc, task))
            return True

        def flush_bucket(shape=None):
            for key in ([shape] if shape is not None else list(buckets)):
                entries = buckets.pop(key, None)
                if not entries:
                    continue
                imgs = np.concatenate([e[2] for e in entries], 0)
                # pad partial buckets up to the cap so every flush of this
                # shape reuses ONE compiled batch shape (a trailing partial
                # bucket must not trigger a fresh 20-40s XLA compile)
                n_real = imgs.shape[0]
                if n_real < bucket_cap:
                    pad = np.zeros((bucket_cap - n_real,) + imgs.shape[1:],
                                   imgs.dtype)
                    imgs = np.concatenate([imgs, pad], 0)
                dets_all = detector._process_fn(detector.variables,
                                                jnp.asarray(imgs))
                ofs = 0
                for img_id, si, arr in entries:
                    k = arr.shape[0]
                    pending[img_id]["dets"][si] = dets_all[ofs:ofs + k]
                    ofs += k
                    pending[img_id]["remaining"] -= 1

        def harvest_completed():
            while submit_order and pending[submit_order[0]]["remaining"] == 0:
                img_id = submit_order.popleft()
                ent = pending.pop(img_id)
                device_q.append((img_id, ent["dets"], ent["metas"],
                                 ent["t"]))

        more = submit_more()
        while pre_futs or device_q or submit_order:
            if pre_futs:
                # block for the oldest pre-processed image; the device keeps
                # executing previously dispatched work meanwhile
                img_id, per_scale, pre_dt = pre_futs.popleft().result()
                times["pre"] += pre_dt
                t_disp = time.time()
                shapes = {im.shape for im, _ in per_scale}
                metas = [meta for _, meta in per_scale]
                if len(per_scale) > 1 and len(shapes) == 1:
                    # fix_res warps EVERY scale to the same input size, so
                    # all scales ride ONE device call (flip halves are
                    # built on device by process(), so the upload is just
                    # the originals).  3x fewer dispatches and a bigger
                    # conv batch for the MXU than the serial loop.
                    batched = [im[0] for im, _ in per_scale]
                    dets_all = detector._process_fn(
                        detector.variables, jnp.asarray(np.stack(batched)))
                    dets_devs = [dets_all[i:i + 1]
                                 for i in range(len(per_scale))]
                    device_q.append((img_id, dets_devs, metas, t_disp))
                elif bucketed:
                    pending[img_id] = {"dets": [None] * len(per_scale),
                                       "metas": metas,
                                       "remaining": len(per_scale),
                                       "t": t_disp}
                    submit_order.append(img_id)
                    for si, (images, _) in enumerate(per_scale):
                        key = tuple(images.shape)
                        buckets.setdefault(key, []).append(
                            (img_id, si, images))
                        if len(buckets[key]) >= bucket_cap:
                            flush_bucket(key)
                    # bound host memory: don't let partial buckets starve
                    if len(submit_order) > max(inflight, bucket_cap) * 2:
                        flush_bucket()
                    harvest_completed()
                else:
                    dets_devs = [
                        detector._process_fn(detector.variables,
                                             jnp.asarray(images))
                        for images, _ in per_scale
                    ]
                    device_q.append((img_id, dets_devs, metas, t_disp))
                if more:
                    more = submit_more()
            if not pre_futs:
                flush_bucket()
                harvest_completed()
            # drain device work beyond the in-flight window (fully at the end)
            while len(device_q) > inflight or (not pre_futs and device_q):
                drain(device_q.popleft())
                n_done += 1
                if progress:
                    progress(n_done)
    return results, times, time.time() - t_start
