"""Inference pipeline: pre-process -> jitted forward+decode -> post-process.

Behavioral spec: reference lib/detectors/base_detector.py +
lib/detectors/multi_pose.py (SURVEY.md §2 #22, §3.2): per-scale affine
pre-process (fix_res 512x512 warp or keep_res pad-to-stride), sigmoid +
optional flip-test averaging (with the L/R joint remaps ``flip_lr`` /
``flip_lr_off``), on-device decode at K=100, host inverse-affine
post-process, multi-scale merge with soft-NMS, per-stage wall times.

TPU-native deltas:
- the whole process() stage — forward, sigmoid, flip-average, decode — is ONE
  jit-compiled function, so only the final [K, 40] rows cross the D2H
  boundary (the round-trip BASELINE.json mandates eliminating);
- flip-test runs as batch=2 through the same compiled fn (the MXU sees one
  batched conv, not two launches);
- ``run_batch`` decodes a whole frame batch in one device call for video
  streams (BASELINE config #5).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from centerpose_tpu.config import Config
from centerpose_tpu.inference.post_process import multi_pose_post_process
from centerpose_tpu.losses import sigmoid_clamped
from centerpose_tpu.models.factory import create_model, init_model
from centerpose_tpu.ops.decode import multi_pose_decode
from centerpose_tpu.ops.image import FLIP_IDX, get_affine_transform
from centerpose_tpu.ops.soft_nms import soft_nms_39


def flip_lr(x: jnp.ndarray) -> jnp.ndarray:
    """Flip a joint-channel map horizontally and swap L/R joint channels.

    x: [B, H, W, 17] (reference: flip_lr on hm_hp).
    """
    x = x[:, :, ::-1, :]
    perm = list(range(x.shape[-1]))
    for a, b in FLIP_IDX:
        perm[a], perm[b] = perm[b], perm[a]
    return x[..., jnp.array(perm)]


def flip_lr_off(x: jnp.ndarray) -> jnp.ndarray:
    """Flip a joint-offset map: flip W, negate x-offsets, swap L/R joints.

    x: [B, H, W, 34] interleaved (x, y) per joint (reference: flip_lr_off on
    the hps regression map).
    """
    b, h, w, c = x.shape
    j = c // 2
    x = x[:, :, ::-1, :].reshape(b, h, w, j, 2)
    x = x.at[..., 0].multiply(-1.0)
    perm = list(range(j))
    for a, bb in FLIP_IDX:
        perm[a], perm[bb] = perm[bb], perm[a]
    x = x[:, :, :, jnp.array(perm), :]
    return x.reshape(b, h, w, c)


class Detector:
    """Single-image / batched inference engine (reference: MultiPoseDetector)."""

    def __init__(self, cfg: Config, variables: Optional[dict] = None):
        self.cfg = cfg
        self.model = create_model(cfg)
        if variables is None:
            variables = init_model(
                self.model, jax.random.PRNGKey(0), cfg.model.input_res
            )
        self.variables = variables
        self.mean = np.asarray(cfg.dataset.mean, np.float32)
        self.std = np.asarray(cfg.dataset.std, np.float32)
        self.flip_test = cfg.test.flip_test
        self.k = cfg.test.topk
        self._process_fn = self._build_process_fn()

    # ------------------------------------------------------------------
    # device stage
    # ------------------------------------------------------------------
    def _build_process_fn(self):
        model, cfg, flip_test, k = self.model, self.cfg, self.flip_test, self.k
        mean = jnp.asarray(self.mean)
        std = jnp.asarray(self.std)

        def process(variables, images):
            if images.dtype == jnp.uint8:
                # device-side normalization: the host hands raw warped uint8
                # pixels, so H2D moves 4x fewer bytes (and the divide/sub
                # fuses into the first conv).  float inputs are assumed
                # already normalized (back-compat path).
                images = (images.astype(jnp.float32) / 255.0 - mean) / std
            if flip_test:
                # the flipped half is BUILT ON DEVICE (a W-reverse costs
                # nothing vs halving the H2D upload through the ~15 MB/s
                # tunnel; output/transfer_budget.json)
                images = jnp.concatenate(
                    [images, images[:, :, ::-1, :]], axis=0)
            out = model.apply(variables, images, train=False)
            hm = sigmoid_clamped(out["hm"])
            hm_hp = sigmoid_clamped(out["hm_hp"]) if cfg.loss.hm_hp else None
            wh, hps = out["wh"], out["hps"]
            reg = out["reg"] if cfg.loss.reg_offset else None
            hp_offset = out["hp_offset"] if cfg.loss.reg_hp_offset else None
            if flip_test:
                # images was [orig; flipped]: average aligned maps, take
                # reg/hp_offset from the unflipped half (reference §3.2).
                n = images.shape[0] // 2
                hm = (hm[:n] + hm[n:, :, ::-1, :]) / 2.0
                wh = (wh[:n] + wh[n:, :, ::-1, :]) / 2.0
                hps = (hps[:n] + flip_lr_off(hps[n:])) / 2.0
                if hm_hp is not None:
                    hm_hp = (hm_hp[:n] + flip_lr(hm_hp[n:])) / 2.0
                if reg is not None:
                    reg = reg[:n]
                if hp_offset is not None:
                    hp_offset = hp_offset[:n]
            return multi_pose_decode(hm, wh, hps, reg, hm_hp, hp_offset, k=k)

        self._process_raw = process  # unjitted; used by tools/export.py
        return jax.jit(process)

    # ------------------------------------------------------------------
    # host stages
    # ------------------------------------------------------------------
    def pre_process(self, image: np.ndarray, scale: float = 1.0):
        """Affine-resize + normalize one image; returns (batch, meta)."""
        import cv2

        height, width = image.shape[0:2]
        new_height, new_width = int(height * scale), int(width * scale)
        if self.cfg.test.keep_res:
            # pad up to a multiple of test.pad_bucket (reference pads to x32;
            # bucketing bounds XLA recompiles over mixed-size inputs — the
            # image keeps its native pixel scale either way, only the zero
            # border grows)
            bucket = max(32, self.cfg.test.pad_bucket)
            inp_height = (new_height + bucket - 1) // bucket * bucket
            inp_width = (new_width + bucket - 1) // bucket * bucket
            c = np.array([new_width // 2, new_height // 2], dtype=np.float32)
            s = np.array([inp_width, inp_height], dtype=np.float32)
        else:
            inp_height = inp_width = self.cfg.model.input_res
            c = np.array([new_width / 2.0, new_height / 2.0], dtype=np.float32)
            s = max(height, width) * 1.0

        resized = cv2.resize(image, (new_width, new_height))
        trans = get_affine_transform(c, s, 0.0, (inp_width, inp_height))
        inp = cv2.warpAffine(resized, trans, (inp_width, inp_height), flags=cv2.INTER_LINEAR)
        if inp.dtype != np.uint8:
            # float frames (0-255 pixel values) must not skip the device-side
            # uint8 normalization in process(): normalize them on host here.
            inp = ((inp.astype(np.float32) / 255.0 - self.mean) / self.std)
        # uint8 stays uint8: normalization happens on device (process()), so
        # the H2D upload is 4x smaller and the host skips a float pass.
        # Under flip_test the flipped half is built ON DEVICE by process()
        # — only the original crosses H2D.
        images = inp[None]  # [1, H, W, 3]
        down = self.cfg.model.input_res // self.cfg.model.output_res
        meta = {
            "c": c,
            "s": s,
            "out_height": inp_height // down,
            "out_width": inp_width // down,
        }
        return images, meta

    def post_process(self, dets: np.ndarray, meta: dict, scale: float = 1.0):
        """[1, K, 40] grid coords -> {1: [K, 39]} original-image pixels."""
        out = multi_pose_post_process(
            dets, [meta["c"]], [meta["s"]], meta["out_height"], meta["out_width"]
        )
        res = out[0][1]
        if scale != 1.0:
            res[:, :4] /= scale
            res[:, 5:] /= scale
        return {1: res}

    def merge_outputs(self, detections: List[Dict[int, np.ndarray]]):
        """Concat per-scale results; soft-NMS when multi-scale or TEST.NMS."""
        results = {
            1: np.concatenate([d[1] for d in detections], axis=0).astype(np.float32)
        }
        if self.cfg.test.nms or len(self.cfg.test.test_scales) > 1:
            results[1] = soft_nms_39(results[1], nt=0.5, method=2)
        scores = results[1][:, 4]
        keep = np.argsort(-scores)[: self.k]
        results[1] = results[1][keep]
        return results

    # ------------------------------------------------------------------
    # entry points
    # ------------------------------------------------------------------
    def run(self, image_or_path) -> Dict:
        """Full pipeline on one image; returns results + per-stage times."""
        import cv2

        t_start = time.time()
        if isinstance(image_or_path, str):
            image = cv2.imread(image_or_path)
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        else:
            image = image_or_path
        t_load = time.time()

        detections = []
        pre_t = net_t = post_t = 0.0
        for scale in self.cfg.test.test_scales:
            t0 = time.time()
            images, meta = self.pre_process(image, scale)
            images_dev = jnp.asarray(images)
            t1 = time.time()
            dets_dev = self._process_fn(self.variables, images_dev)
            dets = np.asarray(dets_dev)  # the single D2H copy: [1, K, 40]
            t2 = time.time()
            detections.append(self.post_process(dets, meta, scale))
            t3 = time.time()
            pre_t += t1 - t0
            net_t += t2 - t1
            post_t += t3 - t2

        t4 = time.time()
        results = self.merge_outputs(detections)
        t_end = time.time()
        return {
            "results": results,
            "tot": t_end - t_start,
            "load": t_load - t_start,
            "pre": pre_t,
            "net": net_t,
            "post": post_t,
            "merge": t_end - t4,
        }

    def run_batch(self, images: np.ndarray) -> np.ndarray:
        """Batched video-stream inference: [N, H, W, 3] frames -> [N, K, 40]
        decoded detections in one device call (BASELINE config #5).  uint8
        frames are normalized on device (the fast path: 4x smaller H2D);
        float32 inputs are assumed pre-normalized.  Caller handles any
        per-frame inverse transforms."""
        return np.asarray(self._process_fn(self.variables, jnp.asarray(images)))
