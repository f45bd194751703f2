"""Cross-validation of centerpose_tpu.eval.coco_eval against an independently
transcribed oracle of the pycocotools COCOeval algorithm.

The reference evaluates with ``pycocotools.COCOeval`` (lib/datasets/coco_hp.py
run_eval; SURVEY.md §3.4).  pycocotools is not installed in this sandbox, so
``PycocoOracle`` below is a deliberately literal, line-by-line transcription of
the published cocoeval.py algorithm (computeOks / maskUtils-style bbox IoU /
evaluateImg / accumulate / summarize), written WITHOUT looking at our
implementation's structure — matching loops, id-based match bookkeeping, the
``gtm > 0`` convention, the per-maxDet slicing, everything.  Randomized
fixtures with crowds, ignore flags, zero-keypoint gts, area-range edge cases,
score ties and det-only / gt-only images must then produce identical
precision/recall tensors and summary stats from both implementations.
"""

import numpy as np
import pytest

from centerpose_tpu.eval.coco_eval import (
    COCOProtocolEval,
    evaluate_bboxes,
    evaluate_keypoints,
)
from centerpose_tpu.ops.image import OKS_SIGMAS


# ---------------------------------------------------------------------------
# The oracle: literal transcription of pycocotools cocoeval.py (keypoints+bbox,
# single category), using the original's id-based bookkeeping and data layout.
# ---------------------------------------------------------------------------
class _Params:
    def __init__(self, iou_type):
        self.iouThrs = np.linspace(0.5, 0.95, 10)
        self.recThrs = np.linspace(0.0, 1.00, 101)
        if iou_type == "keypoints":
            self.maxDets = [20]
            self.areaRng = [[0, 1e5 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2]]
            self.areaRngLbl = ["all", "medium", "large"]
        else:
            self.maxDets = [1, 10, 100]
            self.areaRng = [
                [0, 1e5 ** 2],
                [0, 32 ** 2],
                [32 ** 2, 96 ** 2],
                [96 ** 2, 1e5 ** 2],
            ]
            self.areaRngLbl = ["all", "small", "medium", "large"]
        self.kpt_oks_sigmas = np.asarray(OKS_SIGMAS, np.float64)


def _bb_iou(d, g, iscrowd):
    # maskUtils.iou for xywh boxes; crowd => intersection over det area
    m = np.zeros((len(d), len(g)))
    for j, gb in enumerate(g):
        gx1, gy1, gw, gh = gb
        ga = gw * gh
        for i, db in enumerate(d):
            dx1, dy1, dw, dh = db
            da = dw * dh
            w = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            h = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if w <= 0 or h <= 0:
                continue
            inter = w * h
            union = da if iscrowd[j] else da + ga - inter
            m[i, j] = inter / union if union > 0 else 0.0
    return m


class PycocoOracle:
    """cocoeval.COCOeval transcription, one category, list-of-dict inputs."""

    def __init__(self, gts, dts, iou_type):
        self.p = _Params(iou_type)
        self.iou_type = iou_type
        # _prepare: assign ids, set ignore flags
        self.gts, self.dts = {}, {}
        self.img_ids = sorted({g["image_id"] for g in gts} | {d["image_id"] for d in dts})
        for i in self.img_ids:
            self.gts[i], self.dts[i] = [], []
        next_id = 1
        for g in gts:
            g = dict(g)
            g["id"] = next_id
            next_id += 1
            ig = g.get("ignore", 0)
            ig = ("iscrowd" in g and g["iscrowd"]) or ig
            if iou_type == "keypoints":
                nk = g.get(
                    "num_keypoints",
                    int((np.asarray(g["keypoints"]).reshape(-1, 3)[:, 2] > 0).sum()),
                )
                ig = (nk == 0) or ig
            g["ignore"] = int(bool(ig))
            self.gts[g["image_id"]].append(g)
        for d in dts:
            d = dict(d)
            d["id"] = next_id
            next_id += 1
            # loadRes area derivation
            if iou_type == "keypoints":
                kp = np.asarray(d["keypoints"], np.float64)
                x, y = kp[0::3], kp[1::3]
                d["area"] = (x.max() - x.min()) * (y.max() - y.min())
            else:
                d["area"] = d["bbox"][2] * d["bbox"][3]
            self.dts[d["image_id"]].append(d)
        self.ious = {
            imgId: self.computeIoU(imgId) for imgId in self.img_ids
        }

    def computeIoU(self, imgId):
        p = self.p
        gt = self.gts[imgId]
        dt = self.dts[imgId]
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[0 : p.maxDets[-1]]
        if self.iou_type == "bbox":
            g = [gg["bbox"] for gg in gt]
            d = [dd["bbox"] for dd in dt]
            iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
            return _bb_iou(d, g, iscrowd)
        return self.computeOks(gt, dt)

    def computeOks(self, gts, dts):
        p = self.p
        ious = np.zeros((len(dts), len(gts)))
        sigmas = p.kpt_oks_sigmas
        vars = (sigmas * 2) ** 2
        k = len(sigmas)
        for j, gt in enumerate(gts):
            g = np.array(gt["keypoints"], np.float64)
            xg, yg, vg = g[0::3], g[1::3], g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt["bbox"]
            x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
            y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt["keypoints"], np.float64)
                xd, yd = d[0::3], d[1::3]
                if k1 > 0:
                    dx = xd - xg
                    dy = yd - yg
                else:
                    z = np.zeros(k)
                    dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                    dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
                e = (dx ** 2 + dy ** 2) / vars / (gt["area"] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    def evaluateImg(self, imgId, aRng, maxDet):
        p = self.p
        gt = self.gts[imgId]
        dt = self.dts[imgId]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g["ignore"] or (g["area"] < aRng[0] or g["area"] > aRng[1]):
                g["_ignore"] = 1
            else:
                g["_ignore"] = 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        ious = (
            self.ious[imgId][:, gtind]
            if len(self.ious[imgId]) > 0
            else self.ious[imgId]
        )
        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if not len(ious) == 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array(
            [d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]
        ).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtIds": [d["id"] for d in dt],
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def accumulate(self):
        p = self.p
        T = len(p.iouThrs)
        R = len(p.recThrs)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, A, M))
        recall = -np.ones((T, A, M))
        self.evalImgs = [
            [self.evaluateImg(imgId, aRng, p.maxDets[-1]) for imgId in self.img_ids]
            for aRng in p.areaRng
        ]
        for a in range(A):
            E = [e for e in self.evalImgs[a] if e is not None]
            if len(E) == 0:
                continue
            for m, maxDet in enumerate(p.maxDets):
                dtScores = np.concatenate([e["dtScores"][0:maxDet] for e in E])
                inds = np.argsort(-dtScores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"][:, 0:maxDet] for e in E], axis=1
                )[:, inds]
                dtIg = np.concatenate(
                    [e["dtIgnore"][:, 0:maxDet] for e in E], axis=1
                )[:, inds]
                gtIg = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gtIg == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dtIg))
                fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    tp = np.array(tp)
                    fp = np.array(fp)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    if nd:
                        recall[t, a, m] = rc[-1]
                    else:
                        recall[t, a, m] = 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds2 = np.searchsorted(rc, p.recThrs, side="left")
                    try:
                        for ri, pi in enumerate(inds2):
                            q[ri] = pr[pi]
                    except Exception:
                        pass
                    precision[t, :, a, m] = np.array(q)
        return {"precision": precision, "recall": recall}

    def summarize(self, acc):
        p = self.p

        def _summarize(ap, iouThr=None, areaRng="all", maxDets=None):
            if maxDets is None:
                maxDets = p.maxDets[-1]
            aind = [i for i, l in enumerate(p.areaRngLbl) if l == areaRng]
            mind = [i for i, mDet in enumerate(p.maxDets) if mDet == maxDets]
            if ap == 1:
                s = acc["precision"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            else:
                s = acc["recall"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, aind, mind]
            if len(s[s > -1]) == 0:
                return -1.0
            return float(np.mean(s[s > -1]))

        if self.iou_type == "keypoints":
            return {
                "AP": _summarize(1),
                "AP50": _summarize(1, iouThr=0.5),
                "AP75": _summarize(1, iouThr=0.75),
                "APm": _summarize(1, areaRng="medium"),
                "APl": _summarize(1, areaRng="large"),
                "AR": _summarize(0),
                "AR50": _summarize(0, iouThr=0.5),
                "AR75": _summarize(0, iouThr=0.75),
                "ARm": _summarize(0, areaRng="medium"),
                "ARl": _summarize(0, areaRng="large"),
            }
        return {
            "AP": _summarize(1),
            "AP50": _summarize(1, iouThr=0.5),
            "AP75": _summarize(1, iouThr=0.75),
            "APs": _summarize(1, areaRng="small"),
            "APm": _summarize(1, areaRng="medium"),
            "APl": _summarize(1, areaRng="large"),
            "AR1": _summarize(0, maxDets=p.maxDets[0]),
            "AR10": _summarize(0, maxDets=p.maxDets[1]),
            "AR100": _summarize(0, maxDets=p.maxDets[2]),
            "ARs": _summarize(0, areaRng="small"),
            "ARm": _summarize(0, areaRng="medium"),
            "ARl": _summarize(0, areaRng="large"),
        }


# ---------------------------------------------------------------------------
# Fixture generation: adversarial synthetic datasets
# ---------------------------------------------------------------------------
def _random_gt(rng, image_id):
    # areas spanning small/medium/large boundaries (32^2, 96^2) on purpose
    w = float(rng.choice([10, 31, 32, 33, 95, 96, 97, 200, 400]))
    h = float(rng.uniform(0.5, 2.0) * w)
    x = float(rng.uniform(0, 500))
    y = float(rng.uniform(0, 500))
    n_vis = int(rng.integers(0, 18))  # 0 => unlabeled gt (ignore path)
    kps = []
    vis_slots = rng.permutation(17)[:n_vis]
    for j in range(17):
        if j in vis_slots:
            kps += [float(rng.uniform(x, x + w)), float(rng.uniform(y, y + h)),
                    int(rng.choice([1, 2]))]
        else:
            kps += [0.0, 0.0, 0]
    g = {
        "image_id": image_id,
        "bbox": [x, y, w, h],
        "area": w * h * float(rng.uniform(0.4, 1.0)),
        "iscrowd": int(rng.random() < 0.15),
        "keypoints": kps,
        "num_keypoints": n_vis,
    }
    if rng.random() < 0.1:
        g["ignore"] = 1
    return g


def _random_det_from_gt(rng, g, noise):
    kp = np.asarray(g["keypoints"], np.float64).reshape(17, 3).copy()
    kp[:, :2] += rng.normal(0, noise, (17, 2))
    kp[:, 2] = 1.0
    x, y, w, h = g["bbox"]
    bb = [
        x + float(rng.normal(0, noise)),
        y + float(rng.normal(0, noise)),
        max(1.0, w + float(rng.normal(0, noise))),
        max(1.0, h + float(rng.normal(0, noise))),
    ]
    return {
        "image_id": g["image_id"],
        "keypoints": [float(v) for v in kp.reshape(-1)],
        "bbox": bb,
        # quantized scores to force ties
        "score": round(float(rng.uniform(0.05, 1.0)), 1),
    }


def _random_fp(rng, image_id):
    kps = []
    cx, cy = rng.uniform(0, 600, 2)
    for _ in range(17):
        kps += [float(cx + rng.normal(0, 30)), float(cy + rng.normal(0, 30)), 1.0]
    return {
        "image_id": image_id,
        "keypoints": kps,
        "bbox": [float(cx), float(cy), float(rng.uniform(5, 300)),
                 float(rng.uniform(5, 300))],
        "score": round(float(rng.uniform(0.05, 1.0)), 1),
    }


def make_fixture(seed, n_images=6, dets_per_gt=2, n_fp=4):
    rng = np.random.default_rng(seed)
    gts, dts = [], []
    for img in range(1, n_images + 1):
        if img == n_images:  # one det-only image
            n_gt = 0
        else:
            n_gt = int(rng.integers(1, 5))
        for _ in range(n_gt):
            g = _random_gt(rng, img)
            gts.append(g)
            for _ in range(int(rng.integers(0, dets_per_gt + 1))):
                dts.append(_random_det_from_gt(rng, g, noise=rng.uniform(1, 40)))
        if img != 2:  # image 2 is gt-only
            for _ in range(int(rng.integers(0, n_fp + 1))):
                dts.append(_random_fp(rng, img))
    return gts, dts


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("iou_type", ["keypoints", "bbox"])
def test_matches_pycoco_oracle(seed, iou_type):
    gts, dts = make_fixture(seed)
    ours = COCOProtocolEval(gts, dts, iou_type=iou_type)
    acc = ours.accumulate()
    oracle = PycocoOracle(gts, dts, iou_type)
    oacc = oracle.accumulate()
    np.testing.assert_allclose(acc["precision"], oacc["precision"], atol=1e-9)
    np.testing.assert_allclose(acc["recall"], oacc["recall"], atol=1e-9)
    ostats = oracle.summarize(oacc)
    stats = ours.summarize(acc)
    assert set(stats) == set(ostats)
    for k in ostats:
        assert abs(stats[k] - ostats[k]) < 1e-9, (k, stats[k], ostats[k])


def test_many_dets_cap_and_ties():
    # > maxDets detections on one image, heavy score ties
    rng = np.random.default_rng(99)
    gts, dts = [], []
    for _ in range(3):
        g = _random_gt(rng, 1)
        g["iscrowd"] = 0
        gts.append(g)
    for _ in range(40):  # beyond keypoints maxDets=20
        dts.append(_random_det_from_gt(rng, gts[0], noise=5.0))
    for d in dts:
        d["score"] = 0.5  # all tied
    for iou_type in ("keypoints", "bbox"):
        ours = COCOProtocolEval(gts, dts, iou_type=iou_type).summarize()
        oracle = PycocoOracle(gts, dts, iou_type)
        ostats = oracle.summarize(oracle.accumulate())
        for k in ostats:
            assert abs(ours[k] - ostats[k]) < 1e-9, (iou_type, k)


def test_perfect_detections_ap1():
    rng = np.random.default_rng(7)
    gts, dts = [], []
    for img in (1, 2):
        for _ in range(3):
            g = _random_gt(rng, img)
            g["iscrowd"] = 0
            g.pop("ignore", None)
            if g["num_keypoints"] == 0:
                # give it one visible joint so it isn't auto-ignored
                kp = np.asarray(g["keypoints"], np.float64).reshape(17, 3)
                kp[0] = [g["bbox"][0] + 1, g["bbox"][1] + 1, 2]
                g["keypoints"] = [float(v) for v in kp.reshape(-1)]
                g["num_keypoints"] = 1
            gts.append(g)
            dts.append(
                {
                    "image_id": img,
                    "keypoints": list(g["keypoints"]),
                    "bbox": list(g["bbox"]),
                    "score": 0.9,
                }
            )
    kp_stats = evaluate_keypoints(gts, dts)
    bb_stats = evaluate_bboxes(gts, dts)
    assert kp_stats["AP"] == pytest.approx(1.0)
    assert bb_stats["AP"] == pytest.approx(1.0)


def test_crowd_match_is_ignored_not_fp():
    # a det overlapping only a crowd gt must be ignored, not a false positive
    crowd = {
        "image_id": 1,
        "bbox": [0.0, 0.0, 100.0, 100.0],
        "area": 10000.0,
        "iscrowd": 1,
        "keypoints": [0.0] * 51,
        "num_keypoints": 0,
    }
    real = {
        "image_id": 1,
        "bbox": [300.0, 300.0, 50.0, 100.0],
        "area": 5000.0,
        "iscrowd": 0,
        "keypoints": [310.0, 310.0, 2] + [0.0, 0.0, 0] * 16,
        "num_keypoints": 1,
    }
    good = {
        "image_id": 1,
        "bbox": [300.0, 300.0, 50.0, 100.0],
        "keypoints": [310.0, 310.0, 1] + [0.0, 0.0, 0] * 16,
        "score": 0.9,
    }
    in_crowd = {
        "image_id": 1,
        "bbox": [10.0, 10.0, 50.0, 50.0],
        "keypoints": [float(v) for xy in [(20 + i, 20 + i) for i in range(17)]
                      for v in (*xy, 1)],
        "score": 0.8,
    }
    for evaluate, iou_type in ((evaluate_keypoints, "keypoints"),
                               (evaluate_bboxes, "bbox")):
        with_crowd = evaluate([crowd, real], [good, in_crowd])
        oracle = PycocoOracle([crowd, real], [good, in_crowd], iou_type)
        ostats = oracle.summarize(oracle.accumulate())
        for k in ostats:
            assert abs(with_crowd[k] - ostats[k]) < 1e-9, (iou_type, k)
        # and the crowd-overlapping det must not hurt AP
        assert with_crowd["AP"] == pytest.approx(1.0), iou_type
