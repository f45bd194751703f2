"""Visualization: skeleton / heatmap overlays (reference: lib/utils/debugger.py,
SURVEY.md §2 #25).  cv2 drawing on host; used by demo and DEBUG>=1 training."""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from centerpose_tpu.ops.image import COCO_EDGES

# Per-edge BGR colors (stable palette across frames).
_EDGE_COLORS = [
    (255, 0, 0), (0, 0, 255), (255, 0, 0), (0, 0, 255),
    (255, 0, 0), (0, 0, 255), (255, 0, 255),
    (255, 0, 0), (255, 0, 0), (0, 0, 255), (0, 0, 255),
    (255, 0, 0), (0, 0, 255), (255, 0, 255),
    (255, 0, 0), (255, 0, 0), (0, 0, 255), (0, 0, 255),
]


class Debugger:
    def __init__(self, theme: str = "white", down_ratio: int = 4):
        self.imgs: Dict[str, np.ndarray] = {}
        self.down_ratio = down_ratio

    def add_img(self, img: np.ndarray, img_id: str = "default"):
        self.imgs[img_id] = img.copy()

    def add_coco_bbox(self, bbox, conf, img_id: str = "default"):
        import cv2

        x1, y1, x2, y2 = [int(v) for v in bbox[:4]]
        cv2.rectangle(self.imgs[img_id], (x1, y1), (x2, y2), (0, 255, 0), 2)
        cv2.putText(
            self.imgs[img_id], f"person {conf:.2f}", (x1, max(0, y1 - 4)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1, cv2.LINE_AA,
        )

    def add_coco_hp(self, points, img_id: str = "default"):
        """Draw a 17-joint skeleton; points: [34] or [17, 2]."""
        import cv2

        pts = np.asarray(points, np.float32).reshape(17, 2).astype(np.int32)
        for j in range(17):
            cv2.circle(self.imgs[img_id], tuple(pts[j]), 3, (0, 0, 255), -1)
        for e_idx, (a, b) in enumerate(COCO_EDGES):
            if np.all(pts[a] >= 0) and np.all(pts[b] >= 0):
                cv2.line(
                    self.imgs[img_id], tuple(pts[a]), tuple(pts[b]),
                    _EDGE_COLORS[e_idx % len(_EDGE_COLORS)], 2, cv2.LINE_AA,
                )

    def add_blend_heatmap(self, img: np.ndarray, hm: np.ndarray, img_id: str = "hm"):
        """Overlay a (possibly multi-channel) heatmap on the image."""
        import cv2

        h = np.max(np.asarray(hm, np.float32), axis=-1) if hm.ndim == 3 else hm
        h = cv2.resize(h, (img.shape[1], img.shape[0]))
        h = np.clip(h * 255, 0, 255).astype(np.uint8)
        color = cv2.applyColorMap(h, cv2.COLORMAP_JET)
        self.imgs[img_id] = cv2.addWeighted(img, 0.6, color, 0.4, 0)

    def add_multi_pose(self, results: np.ndarray, vis_thresh: float = 0.3,
                       img_id: str = "default"):
        """Draw all detections [N, 39] above the score threshold."""
        for row in np.asarray(results):
            if row[4] >= vis_thresh:
                self.add_coco_bbox(row[:4], row[4], img_id)
                self.add_coco_hp(row[5:39], img_id)

    def save_all_imgs(self, path: str, prefix: str = ""):
        import cv2

        os.makedirs(path, exist_ok=True)
        for name, img in self.imgs.items():
            cv2.imwrite(os.path.join(path, f"{prefix}{name}.png"), img)

    def show_all_imgs(self, pause: bool = False):
        import cv2

        for name, img in self.imgs.items():
            cv2.imshow(name, img)
        cv2.waitKey(0 if pause else 1)


def render_train_debug(
    model, variables, batch, cfg, out_dir: str, max_images: int = 4
) -> None:
    """Render predicted-vs-GT center/joint heatmaps for a training batch.

    The reference's base_trainer debug() renders model output overlays when
    DEBUG > 0 (SURVEY.md §2 #21); called from tools/train.py at val
    intervals when cfg.debug > 0.
    """
    import jax
    import numpy as np

    mean = np.asarray(cfg.dataset.mean, np.float32)
    std = np.asarray(cfg.dataset.std, np.float32)
    inputs = np.asarray(batch["input"])[:max_images]
    out = jax.device_get(
        model.apply(variables, inputs, train=False)
    )
    pred_hm = 1.0 / (1.0 + np.exp(-np.asarray(out["hm"], np.float32)))
    pred_hm_hp = 1.0 / (1.0 + np.exp(-np.asarray(out["hm_hp"], np.float32)))
    gt_hm = np.asarray(batch["hm"])[:max_images]
    gt_hm_hp = np.asarray(batch["hm_hp"])[:max_images]
    for i in range(inputs.shape[0]):
        img = np.clip((inputs[i] * std + mean) * 255.0, 0, 255).astype(np.uint8)
        img = img[..., ::-1].copy()  # RGB -> BGR for cv2 writes
        dbg = Debugger()
        dbg.add_blend_heatmap(img, pred_hm[i], "pred_hm")
        dbg.add_blend_heatmap(img, gt_hm[i], "gt_hm")
        dbg.add_blend_heatmap(img, pred_hm_hp[i], "pred_hm_hp")
        dbg.add_blend_heatmap(img, gt_hm_hp[i], "gt_hm_hp")
        dbg.save_all_imgs(out_dir, prefix=f"img{i}_")
