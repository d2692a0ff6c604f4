"""Unit tests for box ops, anchors, letterbox, and fixed-shape NMS."""

import numpy as np
import pytest

from yolo_tpu.ops.boxes import bbox_iou, box_iou, clip_boxes, scale_boxes, xywh2xyxy, xyxy2xywh
from yolo_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from yolo_tpu.ops.letterbox import LetterBox, letterbox_params
from yolo_tpu.ops.nms import nms_fixed, nms_numpy, non_max_suppression


def test_xyxy_xywh_roundtrip():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 500, (32, 2)).astype(np.float32)
    wh = rng.uniform(1, 100, (32, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    assert np.allclose(xywh2xyxy(xyxy2xywh(boxes)), boxes, atol=1e-4)


def test_box_iou_known_values():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = box_iou(a, b)[0]
    assert iou[0] == pytest.approx(1.0, abs=1e-5)
    assert iou[1] == pytest.approx(25 / 175, abs=1e-5)
    assert iou[2] == pytest.approx(0.0, abs=1e-7)


def test_bbox_iou_ciou_leq_iou():
    rng = np.random.default_rng(1)
    b1 = np.abs(rng.normal(100, 20, (64, 4))).astype(np.float32)
    b2 = np.abs(rng.normal(100, 20, (64, 4))).astype(np.float32)
    b1[:, 2:] = np.abs(b1[:, 2:]) + 5
    b2[:, 2:] = np.abs(b2[:, 2:]) + 5
    iou = bbox_iou(b1, b2, xywh=True)
    ciou = bbox_iou(b1, b2, xywh=True, CIoU=True)
    assert np.all(ciou <= iou + 1e-6)


def test_make_anchors_order():
    anchors, strides = make_anchors([(2, 3)], [8])
    # x varies fastest (reference row order, ref: utils/tal.py:367)
    assert np.allclose(anchors[:3, 0], [0.5, 1.5, 2.5])
    assert np.allclose(anchors[:3, 1], [0.5, 0.5, 0.5])
    assert strides.shape == (6, 1) and np.all(strides == 8)


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = np.array([[10.0, 10.0], [5.0, 7.0]], np.float32)
    dist = np.array([[1.0, 2.0, 3.0, 4.0], [2.0, 2.0, 2.0, 2.0]], np.float32)
    box = dist2bbox(dist, anchors, xywh=False)
    back = bbox2dist(anchors, box, reg_max=16)
    assert np.allclose(back, dist, atol=1e-5)


def test_letterbox_matches_expected_geometry():
    img = np.full((512, 640, 3), 7, np.uint8)
    out, (ratio, pad) = LetterBox((640, 640))(img, return_meta=True)
    assert out.shape == (640, 640, 3)
    assert ratio[0] == 1.0 and pad == (0.0, 64.0)
    assert np.all(out[0] == 114) and np.all(out[64] == 7)  # top pad then image

    # auto (stride) mode: 640x512 needs no padding at stride 32
    out2 = LetterBox((640, 640), auto=True, stride=32)(img)
    assert out2.shape == (512, 640, 3)


def test_scale_boxes_inverts_letterbox():
    img_shape = (512, 640)
    (r, _), (dw, dh), _ = letterbox_params(img_shape, (640, 640))
    boxes_lb = np.array([[100 * r + dw, 100 * r + dh, 200 * r + dw, 220 * r + dh]], np.float32)
    back = scale_boxes((640, 640), boxes_lb, img_shape)
    assert np.allclose(back, [[100, 100, 200, 220]], atol=1.0)


def test_clip_boxes():
    b = np.array([[-5, -5, 700, 600]], np.float32)
    c = clip_boxes(b, (512, 640))
    assert np.allclose(c, [[0, 0, 640, 512]])


def test_nms_fixed_matches_numpy_oracle():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    n = 64
    centers = rng.uniform(50, 450, (n, 2))
    sizes = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)

    keep_np = nms_numpy(boxes, scores, 0.45)
    keep_idx, keep_valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.45, max_det=n)
    keep_jax = np.asarray(keep_idx)[np.asarray(keep_valid)]
    assert list(keep_jax) == list(keep_np)


def test_non_max_suppression_shapes_and_filtering():
    import jax.numpy as jnp

    A, nc = 128, 3
    rng = np.random.default_rng(3)
    pred = np.zeros((2, 4 + nc, A), np.float32)
    pred[:, 0] = rng.uniform(100, 500, (2, A))
    pred[:, 1] = rng.uniform(100, 400, (2, A))
    pred[:, 2:4] = rng.uniform(5, 50, (2, 2, A))
    pred[:, 4:] = rng.uniform(0, 0.2, (2, nc, A))
    # plant two strong, separated detections in image 0
    pred[0, :4, 0] = [100, 100, 20, 20]
    pred[0, 4, 0] = 0.9
    pred[0, :4, 1] = [300, 300, 30, 30]
    pred[0, 5, 1] = 0.8

    out = non_max_suppression(jnp.asarray(pred), conf_thres=0.5, iou_thres=0.45, max_det=16)
    assert out["boxes"].shape == (2, 16, 4)
    v0 = np.asarray(out["valid"][0])
    assert v0.sum() == 2
    scores0 = np.asarray(out["scores"][0])[v0]
    assert scores0[0] == pytest.approx(0.9, abs=1e-5)
    cls0 = np.asarray(out["cls"][0])[v0]
    assert list(cls0) == [0, 1]
    assert np.asarray(out["valid"][1]).sum() == 0
