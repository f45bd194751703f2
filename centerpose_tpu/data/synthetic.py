"""Synthetic multi-person scenes with exact keypoint annotations.

No COCO images ship in this sandbox, so tests / overfit checks / input-
pipeline benchmarks use procedurally rendered scenes: simple "stick figures"
with a deterministic 17-joint skeleton, returned in COCO annotation format so
they flow through the exact same encode/eval path as real data.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from centerpose_tpu.ops.image import COCO_EDGES

# Canonical upright skeleton in a unit box (x, y in [0, 1]), COCO joint order.
_CANON = np.array(
    [
        [0.50, 0.08],  # nose
        [0.46, 0.05], [0.54, 0.05],  # eyes
        [0.42, 0.08], [0.58, 0.08],  # ears
        [0.35, 0.22], [0.65, 0.22],  # shoulders
        [0.28, 0.40], [0.72, 0.40],  # elbows
        [0.22, 0.55], [0.78, 0.55],  # wrists
        [0.40, 0.55], [0.60, 0.55],  # hips
        [0.38, 0.75], [0.62, 0.75],  # knees
        [0.36, 0.95], [0.64, 0.95],  # ankles
    ],
    dtype=np.float32,
)


def make_person(
    rng: np.random.Generator, img_w: int, img_h: int
) -> Tuple[Dict, np.ndarray]:
    """Random placed/scaled/jittered person; returns (coco_ann, joints [17,2])."""
    ph = rng.uniform(0.25, 0.7) * img_h
    pw = ph * rng.uniform(0.35, 0.5)
    x0 = rng.uniform(0, max(1.0, img_w - pw))
    y0 = rng.uniform(0, max(1.0, img_h - ph))
    joints = _CANON.copy()
    joints[:, 0] = x0 + joints[:, 0] * pw + rng.normal(0, 0.01 * pw, 17)
    joints[:, 1] = y0 + joints[:, 1] * ph + rng.normal(0, 0.01 * ph, 17)
    kp = []
    for j in range(17):
        kp += [float(joints[j, 0]), float(joints[j, 1]), 2]
    ann = {
        "bbox": [x0, y0, pw, ph],
        "keypoints": kp,
        "area": pw * ph,
        "iscrowd": 0,
        "category_id": 1,
    }
    return ann, joints


def render_scene(
    rng: np.random.Generator,
    img_w: int = 640,
    img_h: int = 480,
    n_people: int = 2,
) -> Tuple[np.ndarray, List[Dict]]:
    """Render an RGB scene of stick figures; returns (HWC uint8, coco anns)."""
    import cv2

    img = np.full((img_h, img_w, 3), 32, np.uint8)
    # textured background so the net can't cheat on constant inputs
    noise = rng.integers(0, 40, (img_h // 8, img_w // 8, 3), dtype=np.uint8)
    img += cv2.resize(noise, (img_w, img_h), interpolation=cv2.INTER_NEAREST)
    anns = []
    for i in range(n_people):
        ann, joints = make_person(rng, img_w, img_h)
        color = tuple(int(c) for c in rng.integers(120, 255, 3))
        for a, b in COCO_EDGES:
            cv2.line(
                img,
                tuple(joints[a].astype(int)),
                tuple(joints[b].astype(int)),
                color,
                thickness=max(2, int(ann["bbox"][3] / 40)),
            )
        # head disc
        cv2.circle(img, tuple(joints[0].astype(int)), max(3, int(ann["bbox"][3] / 16)), color, -1)
        for j in range(17):
            cv2.circle(img, tuple(joints[j].astype(int)), 2, (255, 255, 255), -1)
        anns.append(ann)
    return img, anns


class SyntheticEvalDataset:
    """Synthetic val split exposing the COCOHP evaluation interface.

    Fabricates stable image ids / gt annotation dicts over a
    ``SyntheticPoseDataset`` so the detector -> convert_eval_format ->
    OKS-AP chain (reference run_eval, SURVEY.md §3.4) runs without COCO data.
    Used by tools/evaluate.py --synthetic and the in-training AP validation.
    """

    def __init__(self, num_samples: int = 64, seed: int = 2, **kw):
        self.ds = SyntheticPoseDataset(num_samples, seed=seed, **kw)
        self.img_ids = list(range(num_samples))

    def __len__(self):
        return len(self.ds)

    def get_raw(self, i: int):
        return self.ds.get_raw(i)

    def items(self):
        """Yield (image_id, image) pairs for the eval harness."""
        for i in range(len(self.ds)):
            img, _ = self.ds.get_raw(i)
            yield i, img

    def gt_annotations(self) -> List[Dict]:
        gts = []
        for i in range(len(self.ds)):
            _, anns = self.ds.get_raw(i)
            for k, a in enumerate(anns):
                gts.append(dict(a, id=i * 100 + k + 1, image_id=i, iscrowd=0))
        return gts

    def convert_eval_format(self, results):
        from centerpose_tpu.data.coco import COCOHP

        return COCOHP.convert_eval_format(self, results)

    def run_eval(self, results, save_dir=None) -> Dict[str, float]:
        import json
        import os

        from centerpose_tpu.eval.coco_eval import evaluate_keypoints

        dets = self.convert_eval_format(results)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            with open(os.path.join(save_dir, "results.json"), "w") as f:
                json.dump(dets, f)
        return evaluate_keypoints(self.gt_annotations(), dets)


class SyntheticPoseDataset:
    """Dataset-like object over procedurally generated scenes.

    Deterministic per (seed, index) so an "epoch" is a stable set of scenes —
    required for overfit tests.  Mirrors the COCOHP interface used by the
    loader: ``__len__``, ``get_raw(i) -> (img, anns)``.
    """

    def __init__(self, num_samples: int = 64, img_w: int = 640, img_h: int = 480,
                 max_people: int = 3, seed: int = 0):
        self.num_samples = num_samples
        self.img_w, self.img_h = img_w, img_h
        self.max_people = max_people
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def get_raw(self, i: int):
        rng = np.random.default_rng((self.seed, i))
        n = int(rng.integers(1, self.max_people + 1))
        return render_scene(rng, self.img_w, self.img_h, n)
