"""Soft-NMS over 39-dim pose detections.

TPU-native equivalent of the reference's Cython ``soft_nms_39``
(lib/external/nms.pyx, SURVEY.md §2 #17).  Two implementations:

- ``soft_nms_39``: host numpy, exact sequential semantics (greedy pick-max,
  Gaussian/linear score decay).  It only ever runs on <= K * n_scales rows at
  *merge* time of multi-scale offline eval, so the host is the right place
  (SURVEY.md §2 native-inventory item 2) — it never sits in the frame loop.
- ``soft_nms_39_jit``: fixed-K jittable variant (fori_loop over a KxK IoU
  matrix) for when merging must stay on device (batched video pipelines with
  TEST.NMS=True).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _iou_1_to_many(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """IoU of one [4] box vs [N, 4] boxes (x1 y1 x2 y2)."""
    area1 = max(0.0, box[2] - box[0]) * max(0.0, box[3] - box[1])
    areas = np.maximum(0, boxes[:, 2] - boxes[:, 0]) * np.maximum(
        0, boxes[:, 3] - boxes[:, 1]
    )
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    iw = np.maximum(0.0, ix2 - ix1)
    ih = np.maximum(0.0, iy2 - iy1)
    inter = iw * ih
    union = area1 + areas - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(union > 0, inter / union, 0.0)


def soft_nms_39(
    dets: np.ndarray,
    sigma: float = 0.5,
    nt: float = 0.5,
    thresh: float = 0.001,
    method: int = 2,
) -> np.ndarray:
    """Greedy soft-NMS on [N, 39] rows (bbox4 + score + 34 kps), in place.

    method: 0 = hard NMS, 1 = linear decay, 2 = gaussian decay (reference
    default for pose merging).  Returns the surviving rows (score > thresh),
    ordered by pick sequence — matching the Cython contract.

    Dispatches to the C++ core (centerpose_tpu/native/soft_nms.cpp) when
    built; this numpy body is the behavioral reference and fallback.
    """
    from centerpose_tpu.native import soft_nms_39_native

    native_out = soft_nms_39_native(dets, sigma, nt, thresh, method)
    if native_out is not None:
        return native_out
    return soft_nms_39_numpy(dets, sigma, nt, thresh, method)


def soft_nms_39_numpy(
    dets: np.ndarray,
    sigma: float = 0.5,
    nt: float = 0.5,
    thresh: float = 0.001,
    method: int = 2,
) -> np.ndarray:
    """Pure-numpy soft-NMS body (behavioral reference for the C++ core)."""
    dets = dets.copy()
    n = dets.shape[0]
    keep = []
    alive = np.ones(n, bool)
    while alive.any():
        idx = np.flatnonzero(alive)
        best = idx[np.argmax(dets[idx, 4])]
        if dets[best, 4] <= thresh:
            break
        keep.append(best)
        alive[best] = False
        rest = np.flatnonzero(alive)
        if rest.size == 0:
            break
        ious = _iou_1_to_many(dets[best, :4], dets[rest, :4])
        if method == 1:  # linear
            decay = np.where(ious > nt, 1.0 - ious, 1.0)
        elif method == 2:  # gaussian
            decay = np.exp(-(ious * ious) / sigma)
        else:  # hard
            decay = (ious <= nt).astype(np.float64)
        dets[rest, 4] *= decay
        dead = rest[dets[rest, 4] <= thresh]
        alive[dead] = False
    return dets[keep]


def soft_nms_39_jit(
    dets: jnp.ndarray, sigma: float = 0.5, thresh: float = 0.001
) -> jnp.ndarray:
    """Fixed-K on-device gaussian soft-NMS: [K, 39] -> [K, 39] (scores decayed,
    suppressed rows score<=thresh; no reordering — downstream thresholding
    handles selection).  Jit/vmap-safe: static shapes, fori_loop."""
    k = dets.shape[0]
    boxes = dets[:, :4]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.maximum(0.0, x2 - x1) * jnp.maximum(0.0, y2 - y1)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(0.0, ix2 - ix1) * jnp.maximum(0.0, iy2 - iy1)
    union = areas[:, None] + areas[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)  # [K, K]
    decay_mat = jnp.exp(-(iou * iou) / sigma)

    def body(_, carry):
        scores, processed = carry
        # pick the best not-yet-processed detection
        masked = jnp.where(processed, -jnp.inf, scores)
        best = jnp.argmax(masked)
        best_score = masked[best]
        do = best_score > thresh
        decay = jnp.where(
            (jnp.arange(k) == best) | processed | ~do, 1.0, decay_mat[best]
        )
        scores = scores * decay
        processed = processed | (jnp.arange(k) == best)
        return scores, processed

    scores0 = dets[:, 4]
    scores, _ = lax.fori_loop(0, k, body, (scores0, jnp.zeros(k, bool)))
    return dets.at[:, 4].set(scores)
