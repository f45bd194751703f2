"""COCO person-keypoints dataset (self-contained JSON reader, no pycocotools).

Behavioral spec: reference lib/datasets/coco_hp.py (SURVEY.md §2 #4):
indexes COCO 2017 keypoint annotations (num_joints=17, L/R flip table,
pixel mean/std live in the config here), hands (image, anns) pairs to the
GT encoder, and drives evaluation (``convert_eval_format`` + ``run_eval``).
pycocotools is unavailable in this environment, so JSON parsing and OKS AP
both run through our own implementations (centerpose_tpu/eval/coco_eval.py).

Expected layout (standard COCO):
  {root}/annotations/person_keypoints_{split}2017.json
  {root}/{split}2017/*.jpg
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from centerpose_tpu.config import Config
from centerpose_tpu.data.encode import encode_example


class COCOHP:
    """COCO keypoints dataset: image-level index over person annotations."""

    num_joints = 17

    def __init__(self, cfg: Config, split: str = "train"):
        self.cfg = cfg
        self.split = split
        root = cfg.dataset.root
        ann_path = os.path.join(
            root, "annotations", f"person_keypoints_{split}2017.json"
        )
        self.img_dir = os.path.join(root, f"{split}2017")
        with open(ann_path) as f:
            data = json.load(f)
        self.images_info: Dict[int, dict] = {im["id"]: im for im in data["images"]}
        anns_by_img: Dict[int, List[dict]] = {}
        for ann in data.get("annotations", []):
            if ann.get("category_id") != 1:
                continue
            anns_by_img.setdefault(ann["image_id"], []).append(ann)
        self.anns_by_img = anns_by_img
        if split == "train":
            # train: only images that contain at least one non-crowd person
            self.img_ids = [
                i
                for i in sorted(anns_by_img)
                if any(not a.get("iscrowd", 0) for a in anns_by_img[i])
            ]
        else:
            # val: every image (detections on empty images must count as FPs)
            self.img_ids = sorted(self.images_info)

    def __len__(self) -> int:
        return len(self.img_ids)

    def image_path(self, i: int) -> str:
        info = self.images_info[self.img_ids[i]]
        return os.path.join(self.img_dir, info["file_name"])

    def get_raw(self, i: int) -> Tuple[np.ndarray, List[dict]]:
        import cv2

        img = cv2.imread(self.image_path(i))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        anns = [
            a
            for a in self.anns_by_img.get(self.img_ids[i], [])
            if not a.get("iscrowd", 0)
        ]
        return img, anns

    def get_item(
        self, i: int, rng: Optional[np.random.Generator] = None, is_train: bool = True
    ) -> Dict[str, np.ndarray]:
        img, anns = self.get_raw(i)
        return encode_example(img, anns, self.cfg, rng, is_train)

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def gt_annotations(self) -> List[dict]:
        """All person gt anns (crowd included — the evaluator ignores them)."""
        out = []
        for img_id in self.img_ids:
            out.extend(self.anns_by_img.get(img_id, []))
        return out

    def convert_eval_format(self, results: Dict[int, Dict[int, np.ndarray]]) -> List[dict]:
        """{image_id: {1: [N, 39]}} -> COCO detection dicts.

        Row layout: bbox(xyxy 4) + score(1) + joints(34).
        (reference: COCOHP.convert_eval_format — keypoints flattened as
        17 x [x, y, 1].)
        """
        dets = []
        for img_id, by_cat in results.items():
            arr = by_cat[1]
            for row in np.asarray(arr):
                x1, y1, x2, y2, score = [float(v) for v in row[:5]]
                kps = np.asarray(row[5:39], np.float64).reshape(17, 2)
                kp_out = np.concatenate(
                    [kps, np.ones((17, 1))], axis=1
                ).reshape(-1)
                dets.append(
                    {
                        "image_id": int(img_id),
                        "category_id": 1,
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "score": score,
                        "keypoints": [round(float(v), 2) for v in kp_out],
                    }
                )
        return dets

    def run_eval(
        self,
        results: Dict[int, Dict[int, np.ndarray]],
        save_dir: Optional[str] = None,
        img_ids=None,
    ) -> Dict[str, float]:
        """Keypoint OKS AP summary, plus the reference's second bbox COCOeval
        pass (reference run_eval evaluates both; SURVEY.md §2 #4) reported
        under ``bbox_*`` keys.

        ``img_ids``: optional subset of image ids to score.  Required when
        ``results`` deliberately covers only part of the split (the
        in-training val_ap_limit gate): scoring partial detections against
        the FULL split's gt counts every unevaluated image as all-misses and
        deflates AP by ~limit/len(split)."""
        from centerpose_tpu.eval.coco_eval import evaluate_bboxes, evaluate_keypoints

        dets = self.convert_eval_format(results)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            with open(os.path.join(save_dir, "results.json"), "w") as f:
                json.dump(dets, f)
        gts = self.gt_annotations()
        if img_ids is not None:
            ids = set(int(i) for i in img_ids)
            gts = [g for g in gts if int(g["image_id"]) in ids]
        stats = evaluate_keypoints(gts, dets)
        bbox_stats = evaluate_bboxes(gts, dets)
        stats.update({f"bbox_{k}": v for k, v in bbox_stats.items()})
        return stats
