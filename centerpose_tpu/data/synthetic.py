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


_LIMB_CHAINS = (
    # (parent, child) chains articulated by the hard renderer
    (5, 7), (7, 9),      # left arm: shoulder->elbow->wrist
    (6, 8), (8, 10),     # right arm
    (11, 13), (13, 15),  # left leg: hip->knee->ankle
    (12, 14), (14, 16),  # right leg
)


def _articulate(joints: np.ndarray, rng: np.random.Generator,
                max_deg: float = 45.0) -> np.ndarray:
    """Rotate each limb segment about its parent joint by a random angle,
    propagating down the chain — articulated poses instead of the rigid
    canonical stick figure."""
    j = joints.copy()
    for parent, child in _LIMB_CHAINS:
        ang = np.deg2rad(rng.uniform(-max_deg, max_deg))
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, -s], [s, c]], np.float32)
        # rotate the child and everything downstream of it
        downstream = [child] + [cc for pp, cc in _LIMB_CHAINS if pp == child]
        pivot = j[parent]
        for d in downstream:
            j[d] = pivot + rot @ (j[d] - pivot)
    return j


def make_person_hard(
    rng: np.random.Generator, img_w: int, img_h: int
) -> Tuple[Dict, np.ndarray]:
    """Hard-mode person: log-uniform scale down to ~6% of image height
    (≈8 output-grid cells at 512->128), articulated limbs, global tilt."""
    ph = np.exp(rng.uniform(np.log(0.06), np.log(0.62))) * img_h
    pw = ph * rng.uniform(0.3, 0.55)
    x0 = rng.uniform(-0.2 * pw, img_w - 0.8 * pw)
    y0 = rng.uniform(-0.2 * ph, img_h - 0.8 * ph)
    joints = _CANON.copy()
    joints[:, 0] = joints[:, 0] * pw
    joints[:, 1] = joints[:, 1] * ph
    joints = _articulate(joints, rng)
    ang = np.deg2rad(rng.uniform(-25, 25))
    c, s = np.cos(ang), np.sin(ang)
    ctr = joints.mean(0)
    joints = (joints - ctr) @ np.array([[c, s], [-s, c]], np.float32) + ctr
    joints[:, 0] += x0 + rng.normal(0, 0.015 * pw, 17)
    joints[:, 1] += y0 + rng.normal(0, 0.015 * ph, 17)
    xs, ys = joints[:, 0], joints[:, 1]
    bx0, by0 = float(xs.min()), float(ys.min())
    bw, bh = float(xs.max() - bx0), float(ys.max() - by0)
    vis = np.full(17, 2, np.int32)
    inside = ((xs >= 0) & (xs < img_w) & (ys >= 0) & (ys < img_h))
    vis[~inside] = 1  # labeled, outside the frame
    kp = []
    for j in range(17):
        kp += [float(joints[j, 0]), float(joints[j, 1]), int(vis[j])]
    ann = {
        "bbox": [bx0, by0, bw, bh],
        "keypoints": kp,
        "area": bw * bh,
        "iscrowd": 0,
        "category_id": 1,
    }
    return ann, joints


def render_scene_hard(
    rng: np.random.Generator,
    img_w: int = 640,
    img_h: int = 480,
    n_people: int = 6,
) -> Tuple[np.ndarray, List[Dict]]:
    """Hard benchmark scene (VERDICT r4 item 2): heavy crowding (overlap
    allowed), log-uniform scale down to tiny persons, articulated poses,
    low-contrast colors, skeleton-like background clutter (false-positive
    bait), and occluder patches that flip covered joints to vis=1.

    Purpose: an eval set where a converged flagship lands MID-RANGE AP
    (0.4-0.7) so accuracy claims are falsifiable — the original easy set
    saturates at ~0.99 where no regression under ~2 points is detectable."""
    import cv2

    img = np.full((img_h, img_w, 3), 40, np.uint8)
    noise = rng.integers(0, 70, (img_h // 4, img_w // 4, 3), dtype=np.uint8)
    img += cv2.resize(noise, (img_w, img_h), interpolation=cv2.INTER_NEAREST)

    # skeleton-like clutter: limb-colored segments and small discs
    for _ in range(int(rng.integers(6, 16))):
        p = rng.uniform([0, 0], [img_w, img_h]).astype(int)
        q = (p + rng.normal(0, 40, 2)).astype(int)
        color = tuple(int(c) for c in rng.integers(70, 255, 3))
        cv2.line(img, tuple(p), tuple(q), color, thickness=int(rng.integers(1, 4)))
    for _ in range(int(rng.integers(3, 9))):
        p = rng.uniform([0, 0], [img_w, img_h]).astype(int)
        cv2.circle(img, tuple(p), int(rng.integers(2, 7)),
                   tuple(int(c) for c in rng.integers(120, 255, 3)), -1)

    anns: List[Dict] = []
    all_joints: List[np.ndarray] = []
    order = []
    for i in range(n_people):
        ann, joints = make_person_hard(rng, img_w, img_h)
        order.append((ann["bbox"][3], ann, joints))  # draw big->small
    order.sort(key=lambda t: -t[0])
    for _, ann, joints in order:
        color = tuple(int(c) for c in rng.integers(70, 255, 3))
        th = max(1, int(ann["bbox"][3] / 45))
        for a, b in COCO_EDGES:
            cv2.line(img, tuple(joints[a].astype(int)),
                     tuple(joints[b].astype(int)), color, thickness=th)
        cv2.circle(img, tuple(joints[0].astype(int)),
                   max(2, int(ann["bbox"][3] / 18)), color, -1)
        for j in range(17):
            cv2.circle(img, tuple(joints[j].astype(int)),
                       max(1, th // 2), (255, 255, 255), -1)
        anns.append(ann)
        all_joints.append(joints)

    # occluder patches over the rendered people; covered joints -> vis=1
    for _ in range(int(rng.integers(1, 5))):
        ow = int(rng.uniform(0.05, 0.22) * img_w)
        oh = int(rng.uniform(0.05, 0.22) * img_h)
        ox = int(rng.uniform(0, img_w - ow))
        oy = int(rng.uniform(0, img_h - oh))
        color = tuple(int(c) for c in rng.integers(20, 110, 3))
        cv2.rectangle(img, (ox, oy), (ox + ow, oy + oh), color, -1)
        for ann, joints in zip(anns, all_joints):
            kp = ann["keypoints"]
            for j in range(17):
                jx, jy = joints[j]
                if ox <= jx < ox + ow and oy <= jy < oy + oh and kp[3 * j + 2] == 2:
                    kp[3 * j + 2] = 1
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

    def run_eval(self, results, save_dir=None, img_ids=None) -> Dict[str, float]:
        import json
        import os

        from centerpose_tpu.eval.coco_eval import evaluate_keypoints

        dets = self.convert_eval_format(results)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            with open(os.path.join(save_dir, "results.json"), "w") as f:
                json.dump(dets, f)
        gts = self.gt_annotations()
        if img_ids is not None:
            # score only the evaluated subset (see COCOHP.run_eval docstring:
            # partial results vs full-split gt deflates AP by limit/len)
            ids = set(int(i) for i in img_ids)
            gts = [g for g in gts if int(g["image_id"]) in ids]
        return evaluate_keypoints(gts, dets)


class SyntheticPoseDataset:
    """Dataset-like object over procedurally generated scenes.

    Deterministic per (seed, index) so an "epoch" is a stable set of scenes —
    required for overfit tests.  Mirrors the COCOHP interface used by the
    loader: ``__len__``, ``get_raw(i) -> (img, anns)``.
    """

    def __init__(self, num_samples: int = 64, img_w: int = 640, img_h: int = 480,
                 max_people: int = 3, seed: int = 0, hard: bool = False):
        self.num_samples = num_samples
        self.img_w, self.img_h = img_w, img_h
        self.max_people = 10 if (hard and max_people == 3) else max_people
        self.seed = seed
        self.hard = hard

    def __len__(self):
        return self.num_samples

    def get_raw(self, i: int):
        rng = np.random.default_rng((self.seed, i, int(self.hard)))
        if self.hard:
            n = int(rng.integers(3, self.max_people + 1))
            return render_scene_hard(rng, self.img_w, self.img_h, n)
        n = int(rng.integers(1, self.max_people + 1))
        return render_scene(rng, self.img_w, self.img_h, n)
