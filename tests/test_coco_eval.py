"""Vendored COCOeval protocol (ref: detect/val.py coco_evaluate:433) —
hand-computed cases covering matching, crowds, IoU sweep, and area ranges."""

import numpy as np

from yolo_tpu.utils.coco_eval import coco_evaluate


def _gt(anns, n_imgs=1, cats=(1,)):
    return {
        "images": [{"id": i} for i in range(n_imgs)],
        "categories": [{"id": c} for c in cats],
        "annotations": [{"id": j, **a} for j, a in enumerate(anns)],
    }


def test_perfect_detections():
    gt = _gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "iscrowd": 0},
        {"image_id": 0, "category_id": 1, "bbox": [100, 100, 50, 50], "iscrowd": 0},
    ])
    dt = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [100, 100, 50, 50], "score": 0.8},
    ]
    r = coco_evaluate(gt, dt)
    assert abs(r["mAP50-95"] - 1.0) < 1e-9 and abs(r["mAP50"] - 1.0) < 1e-9


def test_trailing_fp_does_not_hurt_interpolated_ap():
    gt = _gt([{"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "iscrowd": 0}])
    dt = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [300, 300, 40, 40], "score": 0.8},
    ]
    r = coco_evaluate(gt, dt)
    assert abs(r["mAP50"] - 1.0) < 1e-9


def test_missed_gt_halves_recall():
    gt = _gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "iscrowd": 0},
        {"image_id": 0, "category_id": 1, "bbox": [200, 200, 40, 40], "iscrowd": 0},
    ])
    dt = [{"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "score": 0.9}]
    r = coco_evaluate(gt, dt)
    # precision 1 up to recall 0.5 → AP = 51/101 (recall grid points ≤ 0.5)
    assert abs(r["mAP50"] - 51 / 101) < 1e-9


def test_crowd_matches_are_neutral():
    gt = _gt([
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40], "iscrowd": 1},
        {"image_id": 0, "category_id": 1, "bbox": [200, 200, 40, 40], "iscrowd": 0},
    ])
    # det inside the crowd: ignored (not a FP); the real gt is found by det 2
    dt = [
        {"image_id": 0, "category_id": 1, "bbox": [12, 12, 20, 20], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [200, 200, 40, 40], "score": 0.8},
    ]
    r = coco_evaluate(gt, dt)
    assert abs(r["mAP50"] - 1.0) < 1e-9


def test_iou_threshold_sweep():
    # IoU(det, gt) = 0.6 exactly: counts for thresholds 0.50/0.55/0.60 only
    gt = _gt([{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 60], "iscrowd": 0}])
    dt = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 100], "score": 0.9}]
    r = coco_evaluate(gt, dt)
    assert abs(r["mAP50"] - 1.0) < 1e-9
    assert abs(r["mAP50-95"] - 3 / 10) < 1e-9


def test_area_ranges():
    gt = _gt([
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10], "iscrowd": 0},      # small (100 px²)
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 200, 200], "iscrowd": 0},  # large
    ])
    dt = [
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 200, 200], "score": 0.8},
    ]
    r = coco_evaluate(gt, dt)
    assert abs(r["mAP50-95_small"] - 1.0) < 1e-9
    assert abs(r["mAP50-95_large"] - 1.0) < 1e-9


def test_multi_image_score_interleaving():
    """Global mergesort by score across images (pycocotools accumulate)."""
    gt = _gt(
        [
            {"image_id": 0, "category_id": 1, "bbox": [0, 0, 40, 40], "iscrowd": 0},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 40, 40], "iscrowd": 0},
        ],
        n_imgs=2,
    )
    dt = [
        {"image_id": 0, "category_id": 1, "bbox": [500, 500, 40, 40], "score": 0.95},  # FP, highest score
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 40, 40], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 40, 40], "score": 0.8},
    ]
    r = coco_evaluate(gt, dt)
    # ranks: FP, TP, TP → precision at recall .5 = 1/2, at 1.0 = 2/3; envelope → 2/3 everywhere
    expect = (51 * (2 / 3) + 50 * (2 / 3)) / 101
    assert abs(r["mAP50"] - 2 / 3) < 1e-9, r["mAP50"]


def test_false_positive_on_empty_category():
    """Review finding: a detection on an (image, category) with no gts used to
    crash on `~g_ignore` over an empty float64 array."""
    from yolo_tpu.utils.coco_eval import coco_evaluate

    gt = {
        "images": [{"id": 1}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "iscrowd": 0, "area": 400}
        ],
        "categories": [{"id": 1}, {"id": 2}],
    }
    dt = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 10, 10], "score": 0.8},  # FP on empty cat
    ]
    out = coco_evaluate(gt, dt)
    assert out["mAP50"] == 1.0  # cat 1 perfect; cat 2 has no gts → not averaged


def test_coco91_category_mapping():
    from yolo_tpu.utils.coco_eval import coco80_to_coco91_class

    m = coco80_to_coco91_class()
    assert len(m) == 80 and m[0] == 1 and m[11] == 13 and m[-1] == 90
