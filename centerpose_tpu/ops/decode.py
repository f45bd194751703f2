"""Fully on-device multi-pose decode (jittable, fixed-K, batch-parallel).

Behavioral spec: reference lib/models/decode.py ``multi_pose_decode``
(SURVEY.md §3.3): 3x3 max-pool NMS -> top-K centers -> gather regressed
joints / sub-pixel offsets / box sizes -> snap each regressed joint to the
nearest confident keypoint-heatmap peak inside the person box.  Every step is
fixed-shape XLA (reduce_window, top_k, take_along_axis, argmin, where) so the
whole decode fuses into the inference jit with no host round-trip
(BASELINE.json: "decode/NMS fused on-device").

Output: [B, K, 40] = bbox(4) + score(1) + joints(2*J) + class(1), coords in
output-grid units; the host-side inverse-affine lives in
centerpose_tpu/inference/post_process.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from centerpose_tpu.ops.nms import gather_feat_hw, heat_nms, topk, topk_channel


def multi_pose_decode(
    heat: jnp.ndarray,
    wh: jnp.ndarray,
    kps: jnp.ndarray,
    reg: Optional[jnp.ndarray] = None,
    hm_hp: Optional[jnp.ndarray] = None,
    hp_offset: Optional[jnp.ndarray] = None,
    k: int = 100,
    hm_hp_thresh: float = 0.1,
) -> jnp.ndarray:
    """Decode center/keypoint heatmaps into K pose detections per image.

    All inputs NHWC: heat [B,H,W,1] (sigmoid-ed), wh [B,H,W,2],
    kps [B,H,W,2J] (interleaved x,y per joint), reg [B,H,W,2],
    hm_hp [B,H,W,J] (sigmoid-ed), hp_offset [B,H,W,2].
    """
    b, h, w, _ = heat.shape
    num_joints = kps.shape[-1] // 2

    # 1-2. peak NMS + top-K centers.
    heat = heat_nms(heat)
    scores, inds, clses, ys, xs = topk(heat, k)

    # 3. regressed joints, center-relative -> absolute grid coords.
    kps = gather_feat_hw(kps, inds)  # [B, K, 2J]
    kps = kps.at[..., 0::2].add(xs[:, :, None])
    kps = kps.at[..., 1::2].add(ys[:, :, None])

    # 4. sub-pixel center offsets.
    if reg is not None:
        r = gather_feat_hw(reg, inds)  # [B, K, 2]
        xs = xs + r[..., 0]
        ys = ys + r[..., 1]
    else:
        xs = xs + 0.5
        ys = ys + 0.5

    # 5. boxes.
    whk = gather_feat_hw(wh, inds)  # [B, K, 2]
    bboxes = jnp.stack(
        [
            xs - whk[..., 0] / 2,
            ys - whk[..., 1] / 2,
            xs + whk[..., 0] / 2,
            ys + whk[..., 1] / 2,
        ],
        axis=2,
    )  # [B, K, 4]

    # 6. snap regressed joints to confident heatmap peaks.
    if hm_hp is not None:
        kps = _snap_to_peaks(
            kps, bboxes, hm_hp, hp_offset, k, num_joints, hm_hp_thresh
        )

    scores_e = scores[:, :, None]
    clses_e = clses.astype(jnp.float32)[:, :, None]
    return jnp.concatenate([bboxes, scores_e, kps, clses_e], axis=2)  # [B,K,40]


def _snap_to_peaks(kps, bboxes, hm_hp, hp_offset, k, num_joints, thresh):
    """Replace regressed joints by nearby confident hm_hp peaks (spec §3.3 6a-f)."""
    b = kps.shape[0]
    # [B, K, J, 2] -> [B, J, K, 2]
    kps_j = jnp.transpose(kps.reshape(b, k, num_joints, 2), (0, 2, 1, 3))

    hm_hp = heat_nms(hm_hp)
    hm_score, hm_inds, hm_ys, hm_xs = topk_channel(hm_hp, k)  # [B, J, K]

    if hp_offset is not None:
        # Gather joint sub-pixel offsets at the peak indices of every joint
        # channel at once: flatten (J, K) into one gather of J*K indices.
        off = gather_feat_hw(hp_offset, hm_inds.reshape(b, num_joints * k))
        off = off.reshape(b, num_joints, k, 2)
        hm_xs = hm_xs + off[..., 0]
        hm_ys = hm_ys + off[..., 1]
    else:
        hm_xs = hm_xs + 0.5
        hm_ys = hm_ys + 0.5

    # Low-score peaks become unmatchable (-10000 sentinel, spec 6d).
    conf = (hm_score > thresh).astype(jnp.float32)
    hm_score = (1.0 - conf) * -1.0 + conf * hm_score
    hm_xs = (1.0 - conf) * -10000.0 + conf * hm_xs
    hm_ys = (1.0 - conf) * -10000.0 + conf * hm_ys
    hm_kps = jnp.stack([hm_xs, hm_ys], axis=-1)  # [B, J, K, 2]

    # Pairwise distances regressed-joint x detected-peak: [B, J, K, K].
    diff = kps_j[:, :, :, None, :] - hm_kps[:, :, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    min_dist = jnp.min(dist, axis=3)  # [B, J, K]
    min_ind = jnp.argmin(dist, axis=3)  # [B, J, K]

    sel_score = jnp.take_along_axis(hm_score, min_ind, axis=2)[..., None]  # [B,J,K,1]
    sel_kps = jnp.take_along_axis(
        hm_kps, min_ind[..., None].repeat(2, axis=-1), axis=2
    )  # [B, J, K, 2]
    min_dist_e = min_dist[..., None]

    # Person-box bounds broadcast over joints: [B, 1, K, 1].
    l = bboxes[:, None, :, 0:1]
    t = bboxes[:, None, :, 1:2]
    r = bboxes[:, None, :, 2:3]
    d = bboxes[:, None, :, 3:4]

    reject = (
        (sel_kps[..., 0:1] < l)
        | (sel_kps[..., 0:1] > r)
        | (sel_kps[..., 1:2] < t)
        | (sel_kps[..., 1:2] > d)
        | (sel_score < thresh)
        | (min_dist_e > 0.3 * jnp.maximum(d - t, r - l))
    )
    snapped = jnp.where(reject, kps_j, sel_kps)  # [B, J, K, 2]
    return jnp.transpose(snapped, (0, 2, 1, 3)).reshape(b, k, num_joints * 2)
