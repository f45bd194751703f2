"""COCO reader exercised against a fabricated on-disk dataset.

VERDICT r2 item 5: ``data/coco.py`` (JSON reader, ``convert_eval_format``,
``run_eval``) had never executed — no COCO data exists in the sandbox.  This
fixture writes a tiny but protocol-complete ``person_keypoints_*2017.json``
plus generated JPEGs and drives the whole path: index construction and crowd
filtering, image loading, GT encoding, eval-format conversion layout (xywh
boxes, 17x[x,y,1] keypoints), and ``run_eval`` end-to-end through the real
evaluator with a known-AP outcome.  (reference: lib/datasets/coco_hp.py,
SURVEY.md §2 #4.)
"""

import json
import os

import numpy as np
import pytest

from centerpose_tpu.config import load_config
from centerpose_tpu.data.coco import COCOHP


def _kps(cx, cy, spread=20.0, vis=2):
    """17 visible joints in a ring around (cx, cy); COCO flat [x,y,v]*17."""
    out = []
    for j in range(17):
        a = 2 * np.pi * j / 17
        out += [cx + spread * np.cos(a), cy + spread * np.sin(a), vis]
    return [float(round(v, 2)) for v in out]


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco")
    (root / "annotations").mkdir()
    rng = np.random.default_rng(7)
    sizes = {1: (320, 240), 2: (256, 256), 3: (200, 300)}  # id: (W, H)

    for split in ("train", "val"):
        img_dir = root / f"{split}2017"
        img_dir.mkdir()
        images = []
        for img_id, (w, h) in sizes.items():
            fname = f"{split}_{img_id:012d}.jpg"
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            assert cv2.imwrite(str(img_dir / fname), img)
            images.append({"id": img_id, "file_name": fname,
                           "width": w, "height": h})

        annotations = []

        def add(img_id, bbox, kps, iscrowd=0, num_keypoints=17, cat=1):
            annotations.append({
                "id": len(annotations) + 1, "image_id": img_id,
                "category_id": cat, "bbox": [float(v) for v in bbox],
                "iscrowd": iscrowd, "area": float(bbox[2] * bbox[3]),
                "keypoints": kps, "num_keypoints": num_keypoints,
            })

        # image 1: two people
        add(1, [40, 30, 80, 120], _kps(80, 90))
        add(1, [160, 60, 70, 130], _kps(195, 125))
        # image 2: one crowd region (no labeled joints) + one person
        add(2, [10, 10, 100, 100], [0.0] * 51, iscrowd=1, num_keypoints=0)
        add(2, [120, 120, 90, 110], _kps(165, 175))
        # image 2 also has a non-person annotation that must be dropped
        add(2, [0, 0, 50, 50], [0.0] * 51, cat=18, num_keypoints=0)
        # image 3: empty (no annotations) — stays in val, leaves train
        payload = {"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person",
                                   "keypoints": ["nose"] * 17}]}
        with open(root / "annotations" /
                  f"person_keypoints_{split}2017.json", "w") as f:
            json.dump(payload, f)
    return str(root)


def _cfg(root):
    return load_config(opts=["dataset.root", root,
                             "model.input_res", "128",
                             "model.output_res", "32"])


def test_index_and_crowd_filtering(coco_root):
    cfg = _cfg(coco_root)
    train = COCOHP(cfg, "train")
    val = COCOHP(cfg, "val")
    # train keeps only images with >=1 non-crowd person: image 3 is empty,
    # images 1 and 2 qualify (2's crowd alone would not)
    assert train.img_ids == [1, 2]
    # val keeps every image, including the empty one
    assert val.img_ids == [1, 2, 3]
    assert len(train) == 2 and len(val) == 3


def test_get_raw_loads_images_and_filters_anns(coco_root):
    cfg = _cfg(coco_root)
    val = COCOHP(cfg, "val")
    img, anns = val.get_raw(0)  # image 1: 240x320
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    assert len(anns) == 2  # both people, no crowd on this image
    img2, anns2 = val.get_raw(1)  # image 2: crowd + cat-18 ann dropped
    assert img2.shape == (256, 256, 3)
    assert len(anns2) == 1
    assert anns2[0]["bbox"] == [120.0, 120.0, 90.0, 110.0]
    img3, anns3 = val.get_raw(2)  # empty image
    assert img3.shape == (300, 200, 3) and anns3 == []


def test_get_item_encodes(coco_root, rng):
    cfg = _cfg(coco_root)
    train = COCOHP(cfg, "train")
    ex = train.get_item(0, rng, is_train=True)
    assert ex["input"].shape == (128, 128, 3)
    assert ex["hm"].shape == (32, 32, 1)
    assert ex["hm_hp"].shape == (32, 32, 17)
    assert ex["hm"].max() == 1.0  # two objects drawn
    assert ex["reg_mask"].sum() == 2.0


def test_convert_eval_format_layout(coco_root):
    cfg = _cfg(coco_root)
    val = COCOHP(cfg, "val")
    row = np.zeros((1, 40), np.float32)
    row[0, :5] = [10.0, 20.0, 110.0, 160.0, 0.9]  # xyxy + score
    row[0, 5:39] = np.arange(34, dtype=np.float32)
    dets = val.convert_eval_format({1: {1: row}})
    assert len(dets) == 1
    d = dets[0]
    assert d["image_id"] == 1 and d["category_id"] == 1
    assert d["bbox"] == [10.0, 20.0, 100.0, 140.0]  # xywh
    assert d["score"] == pytest.approx(0.9, abs=1e-6)
    assert len(d["keypoints"]) == 51
    kp = np.asarray(d["keypoints"]).reshape(17, 3)
    np.testing.assert_allclose(kp[:, 0], np.arange(0, 34, 2))
    np.testing.assert_allclose(kp[:, 1], np.arange(1, 34, 2))
    np.testing.assert_allclose(kp[:, 2], 1.0)  # visibility flag always 1


def test_run_eval_perfect_detections(coco_root, tmp_path):
    cfg = _cfg(coco_root)
    val = COCOHP(cfg, "val")
    # perfect detections: gt keypoints + gt boxes for every non-crowd person
    results = {}
    for i, img_id in enumerate(val.img_ids):
        _, anns = val.get_raw(i)
        rows = []
        for a in anns:
            x, y, w, h = a["bbox"]
            kps = np.asarray(a["keypoints"], np.float32).reshape(17, 3)
            rows.append(np.concatenate(
                [[x, y, x + w, y + h, 0.95], kps[:, :2].reshape(-1)]
            ))
        results[img_id] = {
            1: np.stack(rows) if rows else np.zeros((0, 39), np.float32)
        }
    stats = val.run_eval(results, save_dir=str(tmp_path))
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["bbox_AP"] == pytest.approx(1.0)
    # results.json written and loadable
    with open(tmp_path / "results.json") as f:
        dumped = json.load(f)
    assert len(dumped) == 3


def test_run_eval_misses_lower_ap(coco_root):
    cfg = _cfg(coco_root)
    val = COCOHP(cfg, "val")
    # detect only the person in image 2; miss both in image 1 -> recall 1/3
    _, anns = val.get_raw(1)
    a = anns[0]
    x, y, w, h = a["bbox"]
    kps = np.asarray(a["keypoints"], np.float32).reshape(17, 3)
    row = np.concatenate([[x, y, x + w, y + h, 0.9], kps[:, :2].reshape(-1)])
    results = {2: {1: row[None, :]}, 1: {1: np.zeros((0, 39), np.float32)},
               3: {1: np.zeros((0, 39), np.float32)}}
    stats = val.run_eval(results)
    assert 0.0 < stats["AP"] < 0.5
