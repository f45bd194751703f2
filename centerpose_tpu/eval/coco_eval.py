"""COCO-protocol OKS keypoint AP evaluation (pure numpy, no pycocotools).

The reference delegates to ``pycocotools.COCOeval(iouType='keypoints')``
(lib/datasets/coco_hp.py run_eval; SURVEY.md §3.4).  pycocotools is not
available in this environment, so this module reimplements the keypoint
evaluation protocol from its public specification:

- OKS(det, gt) = mean over labeled joints of exp(-d_i^2 / (2 s^2 k_i^2)),
  k_i = 2*sigma_i (COCO per-joint constants), s^2 = gt area;
- per-image greedy matching of score-sorted detections to ground truths at
  each OKS threshold (crowd/ignore semantics included);
- 101-point interpolated AP averaged over thresholds .5:.05:.95 and area
  ranges all / medium (32^2..96^2) / large (96^2..1e5^2), maxDets = 20;
- the standard 10-number keypoint summary (AP, AP50, AP75, APm, APl,
  AR, AR50, AR75, ARm, ARl).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from centerpose_tpu.ops.image import OKS_SIGMAS

OKS_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "medium": (32 ** 2, 96 ** 2),
    "large": (96 ** 2, 1e10),
}
MAX_DETS = 20
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def compute_oks(det_kps: np.ndarray, gt_kps: np.ndarray, gt_area: float) -> float:
    """OKS of one detection vs one gt.

    det_kps: [17, 2+] predicted (x, y); gt_kps: [17, 3] with visibility.
    """
    v = gt_kps[:, 2]
    labeled = v > 0
    k = 2 * OKS_SIGMAS
    denom = 2.0 * (gt_area + np.spacing(1)) * k ** 2
    d2 = (det_kps[:, 0] - gt_kps[:, 0]) ** 2 + (det_kps[:, 1] - gt_kps[:, 1]) ** 2
    e = d2 / denom
    if labeled.sum() > 0:
        return float(np.mean(np.exp(-e[labeled])))
    return 0.0


def oks_matrix(dets: List[dict], gts: List[dict]) -> np.ndarray:
    """[n_det, n_gt] OKS matrix for one image."""
    m = np.zeros((len(dets), len(gts)), np.float64)
    for j, g in enumerate(gts):
        gk = np.asarray(g["keypoints"], np.float64).reshape(17, 3)
        area = float(g.get("area", 1.0))
        for i, d in enumerate(dets):
            dk = np.asarray(d["keypoints"], np.float64).reshape(17, -1)
            m[i, j] = compute_oks(dk, gk, area)
    return m


class KeypointEval:
    """Greedy-match + accumulate evaluator following the COCOeval protocol.

    gts: list of gt ann dicts (image_id, keypoints[51], area, iscrowd,
    num_keypoints optional); dts: list of det dicts (image_id,
    keypoints[51 or 17x2 flattened with confidences], score).
    """

    def __init__(self, gts: List[dict], dts: List[dict]):
        self.img_ids = sorted(
            {g["image_id"] for g in gts} | {d["image_id"] for d in dts}
        )
        self.gts_by_img: Dict[int, List[dict]] = {i: [] for i in self.img_ids}
        self.dts_by_img: Dict[int, List[dict]] = {i: [] for i in self.img_ids}
        for g in gts:
            self.gts_by_img[g["image_id"]].append(g)
        for d in dts:
            self.dts_by_img[d["image_id"]].append(d)

    def _evaluate_img(self, img_id, area_rng) -> dict | None:
        gts = self.gts_by_img[img_id]
        dts = sorted(self.dts_by_img[img_id], key=lambda d: -d["score"])[:MAX_DETS]
        if not gts and not dts:
            return None
        # gt ignore: crowd, no labeled joints, or area outside range
        gt_ig = np.array(
            [
                bool(g.get("iscrowd", 0))
                or (np.asarray(g["keypoints"]).reshape(17, 3)[:, 2] > 0).sum() == 0
                or not (area_rng[0] <= g.get("area", 0.0) < area_rng[1])
                for g in gts
            ],
            bool,
        )
        # sort gts: unignored first (COCOeval convention)
        order = np.argsort(gt_ig, kind="stable")
        gts = [gts[i] for i in order]
        gt_ig = gt_ig[order]

        ious = oks_matrix(dts, gts)
        t_count = len(OKS_THRESHOLDS)
        gt_m = np.zeros((t_count, len(gts)), np.int64) - 1
        dt_m = np.zeros((t_count, len(dts)), np.int64) - 1
        dt_ig = np.zeros((t_count, len(dts)), bool)
        for ti, t in enumerate(OKS_THRESHOLDS):
            for di in range(len(dts)):
                best_iou = min(t, 1 - 1e-10)
                best_g = -1
                for gi in range(len(gts)):
                    # already matched to a non-crowd gt
                    if gt_m[ti, gi] >= 0 and not gts[gi].get("iscrowd", 0):
                        continue
                    # dets sorted by ignore: once we hit ignored gts with a
                    # real match in hand, stop (COCOeval break rule)
                    if best_g > -1 and not gt_ig[best_g] and gt_ig[gi]:
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    best_g = gi
                if best_g == -1:
                    continue
                dt_ig[ti, di] = gt_ig[best_g]
                dt_m[ti, di] = best_g
                gt_m[ti, best_g] = di
        # unmatched detections: no area-based det ignore for keypoints
        # (COCOeval uses the det bbox area; detections carry none here, so
        # only match-to-ignored-gt marks a det ignored)
        return {
            "scores": np.array([d["score"] for d in dts]),
            "dt_m": dt_m,
            "dt_ig": dt_ig,
            "gt_ig": gt_ig,
            "n_gt": int((~gt_ig).sum()),
        }

    def accumulate(self) -> Dict[str, np.ndarray]:
        """Returns precision[T, R, A] and recall[T, A] arrays."""
        t_count = len(OKS_THRESHOLDS)
        a_names = list(AREA_RANGES)
        precision = -np.ones((t_count, len(RECALL_POINTS), len(a_names)))
        recall = -np.ones((t_count, len(a_names)))
        for ai, a_name in enumerate(a_names):
            rng = AREA_RANGES[a_name]
            evals = [self._evaluate_img(i, rng) for i in self.img_ids]
            evals = [e for e in evals if e is not None]
            if not evals:
                continue
            scores = np.concatenate([e["scores"] for e in evals])
            order = np.argsort(-scores, kind="mergesort")
            dt_m = np.concatenate([e["dt_m"] for e in evals], axis=1)[:, order]
            dt_ig = np.concatenate([e["dt_ig"] for e in evals], axis=1)[:, order]
            n_gt = sum(e["n_gt"] for e in evals)
            if n_gt == 0:
                continue
            tps = (dt_m >= 0) & ~dt_ig
            fps = (dt_m < 0) & ~dt_ig
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            for ti in range(t_count):
                tp, fp = tp_sum[ti], fp_sum[ti]
                rc = tp / n_gt
                pr = tp / (tp + fp + np.spacing(1))
                recall[ti, ai] = rc[-1] if len(rc) else 0.0
                # monotone precision envelope
                pr = pr.tolist()
                for i in range(len(pr) - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds = np.searchsorted(rc, RECALL_POINTS, side="left")
                q = np.zeros(len(RECALL_POINTS))
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                precision[ti, :, ai] = q
        return {"precision": precision, "recall": recall}


def summarize_keypoints(acc: Dict[str, np.ndarray]) -> Dict[str, float]:
    """The standard 10-number COCO keypoint summary."""
    precision, recall = acc["precision"], acc["recall"]
    a_names = list(AREA_RANGES)

    def ap(thr=None, area="all"):
        ai = a_names.index(area)
        p = precision[:, :, ai] if thr is None else precision[
            [list(OKS_THRESHOLDS).index(thr)], :, ai
        ]
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    def ar(thr=None, area="all"):
        ai = a_names.index(area)
        r = recall[:, ai] if thr is None else recall[
            [list(OKS_THRESHOLDS).index(thr)], ai
        ]
        r = r[r > -1]
        return float(r.mean()) if r.size else -1.0

    return {
        "AP": ap(),
        "AP50": ap(0.5),
        "AP75": ap(0.75),
        "APm": ap(area="medium"),
        "APl": ap(area="large"),
        "AR": ar(),
        "AR50": ar(0.5),
        "AR75": ar(0.75),
        "ARm": ar(area="medium"),
        "ARl": ar(area="large"),
    }


def evaluate_keypoints(gts: List[dict], dts: List[dict]) -> Dict[str, float]:
    """One-call evaluation: annotations + detections -> 10-stat summary."""
    ev = KeypointEval(gts, dts)
    return summarize_keypoints(ev.accumulate())
