"""On-device peak extraction primitives (jittable, fixed-shape XLA).

TPU-native equivalents of the reference's tensor utils
(lib/models/utils.py — ``_nms``, ``_topk``, ``_topk_channel``,
``_gather_feat``, ``_transpose_and_gather_feat``; SURVEY.md §2 #18).
Layout is NHWC throughout (TPU conv layout), so "transpose and gather"
collapses to a plain flat gather.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def heat_nms(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """3x3 max-pool non-maximum suppression: keep only local maxima.

    heat: [B, H, W, C] -> same shape, non-peaks zeroed.
    (reference: _nms — max_pool2d(k=3, s=1, p=1); keep where pooled == heat.)
    """
    pad = (kernel - 1) // 2
    hmax = lax.reduce_window(
        heat,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    keep = (hmax == heat).astype(heat.dtype)
    return heat * keep


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of a flattened spatial feature at sparse indices.

    feat: [B, H*W, C]; ind: [B, K] int -> [B, K, C].
    (reference: _gather_feat.)
    """
    return jnp.take_along_axis(feat, ind[:, :, None], axis=1)


def gather_feat_hw(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather from an NHWC map at flat (y*W + x) indices.

    feat: [B, H, W, C]; ind: [B, K] -> [B, K, C].
    (reference: _transpose_and_gather_feat — the NCHW->N(HW)C permute is a
    no-op in NHWC, leaving a single contiguous gather.)
    """
    b, h, w, c = feat.shape
    return gather_feat(feat.reshape(b, h * w, c), ind)


def topk(
    scores: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Global top-k over classes x space.

    scores: [B, H, W, C] (post-NMS heatmap).
    Returns (scores [B,K], inds [B,K] flat y*W+x, classes [B,K],
    ys [B,K], xs [B,K]).  (reference: _topk.)
    """
    b, h, w, c = scores.shape
    # Per-class top-k over space.
    flat = jnp.transpose(scores, (0, 3, 1, 2)).reshape(b, c, h * w)
    cls_scores, cls_inds = lax.top_k(flat, k)  # [B, C, K]
    # Global top-k over class*k candidates.
    top_scores, top_ind = lax.top_k(cls_scores.reshape(b, c * k), k)  # [B, K]
    top_clses = top_ind // k
    inds = jnp.take_along_axis(cls_inds.reshape(b, c * k), top_ind, axis=1)
    ys = (inds // w).astype(jnp.float32)
    xs = (inds % w).astype(jnp.float32)
    return top_scores, inds, top_clses, ys, xs


def topk_channel(
    scores: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-channel top-k over space (no cross-class reduce).

    scores: [B, H, W, C] -> (scores [B,C,K], inds [B,C,K], ys, xs).
    (reference: _topk_channel — used for the 17 joint heatmaps.)
    """
    b, h, w, c = scores.shape
    flat = jnp.transpose(scores, (0, 3, 1, 2)).reshape(b, c, h * w)
    top_scores, top_inds = lax.top_k(flat, k)
    ys = (top_inds // w).astype(jnp.float32)
    xs = (top_inds % w).astype(jnp.float32)
    return top_scores, top_inds, ys, xs
