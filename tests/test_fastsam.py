"""FastSAM: everything-mode segmentation + bbox/point prompt filtering."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fastsam():
    from yolo_tpu.models import FastSAM

    return FastSAM("FastSAM-s.yaml")


def test_fastsam_everything_mode(fastsam):
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
    res = fastsam.predict(img, conf=1e-4, imgsz=64, verbose=False)
    r = res[0]
    assert fastsam.task == "segment" and fastsam.model.nc == 1
    assert r.masks is not None and len(r.boxes) == len(r.masks)


def test_fastsam_bbox_and_point_prompts(fastsam):
    img = np.random.default_rng(1).integers(0, 255, (96, 128, 3), np.uint8)
    # bbox prompt: keeps exactly one mask per prompt box (argmax IoU rule)
    res = fastsam.predict(img, bboxes=[[10, 10, 60, 60]], conf=1e-4, imgsz=64, verbose=False)
    assert len(res[0]) >= 1
    assert res[0].masks is not None and len(res[0].masks) == len(res[0])
    # point prompt with a foreground label
    res_p = fastsam.predict(img, points=[[40, 40]], labels=[1], conf=1e-4, imgsz=64, verbose=False)
    assert res_p[0].masks is None or len(res_p[0]) <= len(res[0]) + 300  # filtered subset, never crashes


def test_adjust_bboxes_to_border():
    from yolo_tpu.models.fastsam import adjust_bboxes_to_image_border

    b = np.array([[5, 5, 100, 100], [30, 30, 118, 90]], np.float32)
    out = adjust_bboxes_to_image_border(b, (96, 128), threshold=20)
    assert out[0, 0] == 0 and out[0, 1] == 0
    assert out[1, 2] == 128  # x2 within 20px of right border snaps
    assert out[1, 3] == 96


@pytest.mark.heavy
def test_fastsam_text_prompt_selects_best_crop():
    """Text prompts route through the native CLIP towers (ref:
    fastsam/predict.py _clip_inference:152) — one mask per text selected."""
    from yolo_tpu.models.fastsam import FastSAM

    m = FastSAM("yolov8n-seg.yaml")
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    res = m.predict(img, conf=1e-5, max_det=4, imgsz=64, texts="a bright object", verbose=False)
    r = res[0]
    # at most one mask kept per text (argmax over crops)
    assert len(r) <= 1
