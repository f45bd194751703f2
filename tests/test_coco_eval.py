"""OKS keypoint evaluator tests: perfect/noisy/missing detection scenarios."""

import numpy as np

from centerpose_tpu.eval.coco_eval import (
    KeypointEval,
    compute_oks,
    evaluate_keypoints,
)


def make_gt(image_id, joints, area=5000.0, ann_id=0, vis=2):
    kp = []
    for x, y in joints:
        kp += [x, y, vis]
    return {
        "id": ann_id,
        "image_id": image_id,
        "keypoints": kp,
        "area": area,
        "iscrowd": 0,
    }


def make_dt(image_id, joints, score):
    kp = []
    for x, y in joints:
        kp += [x, y, 1.0]
    return {"image_id": image_id, "keypoints": kp, "score": score}


def grid_joints(cx, cy, spread=30):
    rng = np.random.default_rng(0)
    return [(cx + rng.uniform(-spread, spread), cy + rng.uniform(-spread, spread))
            for _ in range(17)]


def test_oks_perfect_match_is_one():
    j = grid_joints(100, 100)
    gt = make_gt(1, j)
    dk = np.asarray([[x, y] for x, y in j])
    gk = np.asarray(gt["keypoints"], np.float64).reshape(17, 3)
    assert compute_oks(dk, gk, gt["area"]) == 1.0


def test_oks_decreases_with_distance():
    j = grid_joints(100, 100)
    gt = make_gt(1, j)
    gk = np.asarray(gt["keypoints"], np.float64).reshape(17, 3)
    near = np.asarray([[x + 2, y + 2] for x, y in j])
    far = np.asarray([[x + 30, y + 30] for x, y in j])
    o_near = compute_oks(near, gk, gt["area"])
    o_far = compute_oks(far, gk, gt["area"])
    assert 1.0 > o_near > o_far > 0.0


def test_perfect_detections_give_ap_1():
    gts, dts = [], []
    for img in range(4):
        for p in range(2):
            j = grid_joints(80 + 120 * p, 100 + 17 * img)
            gts.append(make_gt(img, j, ann_id=img * 10 + p))
            dts.append(make_dt(img, j, score=0.9 - 0.1 * p))
    stats = evaluate_keypoints(gts, dts)
    assert stats["AP"] == 1.0
    assert stats["AR"] == 1.0
    assert stats["AP50"] == 1.0


def test_missing_detection_halves_recall():
    gts, dts = [], []
    for img in range(2):
        j1 = grid_joints(80, 100)
        j2 = grid_joints(250, 100)
        gts.append(make_gt(img, j1, ann_id=img * 10))
        gts.append(make_gt(img, j2, ann_id=img * 10 + 1))
        dts.append(make_dt(img, j1, score=0.9))  # only one of two found
    stats = evaluate_keypoints(gts, dts)
    assert abs(stats["AR"] - 0.5) < 1e-6
    # AP: precision 1.0 up to recall 0.5 then 0 -> ~0.5 (101-pt interp)
    assert 0.45 < stats["AP"] < 0.55


def test_false_positive_lowers_ap_not_recall():
    j = grid_joints(80, 100)
    gts = [make_gt(0, j, ann_id=1)]
    dts = [
        make_dt(0, j, score=0.9),
        make_dt(0, grid_joints(300, 300), score=0.95),  # confident FP
    ]
    stats = evaluate_keypoints(gts, dts)
    assert abs(stats["AR"] - 1.0) < 1e-6
    assert stats["AP"] < 1.0


def test_crowd_gt_is_ignored():
    j = grid_joints(80, 100)
    crowd = make_gt(0, grid_joints(200, 200), ann_id=2)
    crowd["iscrowd"] = 1
    gts = [make_gt(0, j, ann_id=1), crowd]
    dts = [make_dt(0, j, score=0.9)]
    stats = evaluate_keypoints(gts, dts)
    # the crowd gt must not count as a miss
    assert stats["AR"] == 1.0 and stats["AP"] > 0.999


def test_area_ranges_partition():
    # small person (area < 32^2) is excluded from medium+large buckets
    j_small = [(10 + dx, 10 + dy) for dx, dy in zip(range(17), range(17))]
    j_large = grid_joints(300, 300, spread=60)
    gts = [
        make_gt(0, j_small, area=500.0, ann_id=1),
        make_gt(0, j_large, area=20000.0, ann_id=2),
    ]
    dts = [make_dt(0, j_large, score=0.9)]
    stats = evaluate_keypoints(gts, dts)
    assert stats["APl"] > 0.999  # large bucket: the one large gt is found
    assert stats["AP"] < 1.0  # overall: small gt missed (counted in 'all')


def test_jittered_detections_ap_between_0_and_1():
    rng = np.random.default_rng(1)
    gts, dts = [], []
    for img in range(6):
        j = grid_joints(100 + img, 120)
        gts.append(make_gt(img, j, ann_id=img))
        jd = [(x + rng.normal(0, 8), y + rng.normal(0, 8)) for x, y in j]
        dts.append(make_dt(img, jd, score=rng.uniform(0.5, 1.0)))
    stats = evaluate_keypoints(gts, dts)
    assert 0.0 < stats["AP"] < 1.0
    assert stats["AP50"] >= stats["AP75"]


def test_run_eval_img_ids_subset_not_deflated():
    """Partial-coverage results + img_ids score as the true AP of that
    subset; without img_ids the unevaluated images count as all-misses
    (the in-training val_ap_limit gate bug, round 5)."""
    import numpy as np

    from centerpose_tpu.data.synthetic import SyntheticEvalDataset

    ds = SyntheticEvalDataset(8, seed=11, hard=False)
    # perfect detections for the first 4 images only, straight from gt
    results = {}
    for i in range(4):
        _, anns = ds.get_raw(i)
        rows = []
        for a in anns:
            x, y, w, h = a["bbox"]
            kp = np.asarray(a["keypoints"], np.float32).reshape(17, 3)[:, :2]
            rows.append(np.concatenate(
                [[x, y, x + w, y + h, 0.9], kp.reshape(-1)]))
        results[i] = {1: np.asarray(rows, np.float32)}
    full = ds.run_eval(results)
    subset = ds.run_eval(results, img_ids=list(results))
    assert subset["AP"] > 0.99  # perfect dets on the scored subset
    assert full["AP"] < 0.7  # 4/8 images missing -> deflated
