"""Training losses for multi-person pose (pure functions over pytrees).

Behavioral spec: reference lib/models/losses.py + lib/trains/multi_pose.py
(SURVEY.md §2 #19-20).  Exact normalizations are preserved because they gate
numeric parity: focal divides by the number of gaussian peaks (num_pos, min
1); masked L1 divides by (mask.sum + 1e-4); the weighted joint-regression L1
uses the per-coordinate ``hps_mask``.  Sigmoid outputs are clamped to
[1e-4, 1 - 1e-4] before the focal log terms.

All reductions run in float32 regardless of the model compute dtype.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from centerpose_tpu.config import Config
from centerpose_tpu.ops.nms import gather_feat_hw


def sigmoid_clamped(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Sigmoid clamped away from {0, 1} so focal-loss logs stay finite."""
    return jnp.clip(jax.nn.sigmoid(x).astype(jnp.float32), eps, 1.0 - eps)


def focal_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Penalty-reduced pixelwise focal loss on gaussian-splatted heatmaps.

    pred: [B, H, W, C] probabilities (already sigmoid-clamped);
    gt: same shape, gaussian targets with exact 1.0 at peaks.
    pos: (1-p)^2 log p at gt == 1; neg: (1-gt)^4 p^2 log(1-p) elsewhere;
    total divided by num_pos (reference _neg_loss).
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    pos_mask = (gt == 1.0).astype(jnp.float32)
    neg_mask = 1.0 - pos_mask
    neg_weights = jnp.power(1.0 - gt, 4.0)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2.0) * pos_mask
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2.0) * neg_weights * neg_mask

    num_pos = jnp.sum(pos_mask)
    pos_sum = jnp.sum(pos_loss)
    neg_sum = jnp.sum(neg_loss)
    # Reference: if num_pos == 0, loss = -neg_sum; else -(pos+neg)/num_pos.
    return jnp.where(
        num_pos > 0, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0), -neg_sum
    )


def reg_l1_loss(
    output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """Masked L1 on values gathered at sparse object indices.

    output: [B, H, W, C]; mask: [B, K]; ind: [B, K]; target: [B, K, C].
    (reference RegL1Loss: sum |pred - gt| * mask / (mask.sum + 1e-4),
    mask broadcast over channels.)
    """
    pred = gather_feat_hw(output, ind).astype(jnp.float32)  # [B, K, C]
    m = mask.astype(jnp.float32)[:, :, None]
    m = jnp.broadcast_to(m, pred.shape)
    loss = jnp.sum(jnp.abs(pred - target.astype(jnp.float32)) * m)
    return loss / (jnp.sum(m) + 1e-4)


def reg_weighted_l1_loss(
    output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """Per-coordinate weighted L1 for the 2J-channel joint regression.

    mask: [B, K, C] (hps_mask — per coordinate, not per object).
    (reference RegWeightedL1Loss.)
    """
    pred = gather_feat_hw(output, ind).astype(jnp.float32)
    m = mask.astype(jnp.float32)
    loss = jnp.sum(jnp.abs(pred - target.astype(jnp.float32)) * m)
    return loss / (jnp.sum(m) + 1e-4)


def dense_reg_l1_loss(
    output: jnp.ndarray, mask: jnp.ndarray, target: jnp.ndarray
) -> jnp.ndarray:
    """Dense variant of the joint regression loss (LOSS.DENSE_HP)."""
    m = mask.astype(jnp.float32)
    loss = jnp.sum(jnp.abs(output.astype(jnp.float32) - target) * m)
    return loss / (jnp.sum(m) + 1e-4)


def multi_pose_loss(
    outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], cfg: Config
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total weighted task loss + per-head loss stats.

    outputs: raw head outputs (logits for hm/hm_hp), NHWC.
    batch: supervision dict from data/encode.py.
    (reference MultiPoseLoss.forward — SURVEY.md §2 #20.)
    """
    lc = cfg.loss
    hm = sigmoid_clamped(outputs["hm"])
    hm_loss = focal_loss(hm, batch["hm"])
    if lc.dense_hp:
        hp_loss = dense_reg_l1_loss(
            outputs["hps"], batch["dense_hps_mask"], batch["dense_hps"]
        )
    else:
        hp_loss = reg_weighted_l1_loss(
            outputs["hps"], batch["hps_mask"], batch["ind"], batch["hps"]
        )
    wh_loss = reg_l1_loss(outputs["wh"], batch["reg_mask"], batch["ind"], batch["wh"])

    zero = jnp.float32(0.0)
    off_loss = zero
    if lc.reg_offset:
        off_loss = reg_l1_loss(
            outputs["reg"], batch["reg_mask"], batch["ind"], batch["reg"]
        )
    hm_hp_loss = zero
    if lc.hm_hp:
        hm_hp = sigmoid_clamped(outputs["hm_hp"])
        hm_hp_loss = focal_loss(hm_hp, batch["hm_hp"])
    hp_offset_loss = zero
    if lc.reg_hp_offset:
        hp_offset_loss = reg_l1_loss(
            outputs["hp_offset"], batch["hp_mask"], batch["hp_ind"], batch["hp_offset"]
        )

    total = (
        lc.hm_weight * hm_loss
        + lc.wh_weight * wh_loss
        + lc.off_weight * off_loss
        + lc.hp_weight * hp_loss
        + lc.hm_hp_weight * hm_hp_loss
        + lc.off_weight * hp_offset_loss
    )
    stats = {
        "loss": total,
        "hm_loss": hm_loss,
        "hp_loss": hp_loss,
        "hm_hp_loss": hm_hp_loss,
        "wh_loss": wh_loss,
        "off_loss": off_loss,
        "hp_offset_loss": hp_offset_loss,
    }
    return total, stats
