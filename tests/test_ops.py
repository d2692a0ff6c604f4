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


def test_mosaic9_layout_and_labels():
    import numpy as np

    from yolo_tpu.data.augment import mosaic9

    rng = np.random.default_rng(0)
    items = []
    for i in range(9):
        img = np.full((60 + i, 80 + i, 3), 30 + i * 10, np.uint8)
        items.append({
            "img": img,
            "bboxes": np.array([[10, 10, 40, 40]], np.float32),
            "cls": np.array([float(i % 2)], np.float32),
            "segments": [np.array([[10, 10], [40, 10], [40, 40]], np.float32)],
        })
    import random

    out = mosaic9(items, imgsz=96, rng=random.Random(0))
    assert out["img"].shape == (192, 192, 3)
    assert len(out["bboxes"]) == len(out["cls"]) == len(out["segments"])
    assert (out["bboxes"][:, 2:] >= out["bboxes"][:, :2]).all()
    assert (out["bboxes"] >= 0).all() and (out["bboxes"] <= 192).all()


def test_cutmix_adopts_donor_labels():
    import random

    import numpy as np

    from yolo_tpu.data.augment import cutmix

    rng = random.Random(3)
    np.random.seed(3)
    base = {
        "img": np.zeros((100, 100, 3), np.uint8),
        "bboxes": np.zeros((0, 4), np.float32),
        "cls": np.zeros((0,), np.float32),
    }
    donor = {
        "img": np.full((100, 100, 3), 200, np.uint8),
        "bboxes": np.array([[20, 20, 80, 80]], np.float32),
        "cls": np.array([1.0], np.float32),
    }
    out = cutmix(base, donor, rng=rng)
    # either a region pasted with the donor label adopted, or a no-op (tiny cut)
    if len(out["bboxes"]):
        assert out["cls"][-1] == 1.0
        assert out["img"].max() == 200


def test_segments_survive_train_pipeline():
    """Segment polygons flow through mosaic4 → perspective → flips with boxes
    recomputed from the warped polygons."""
    import random

    import numpy as np

    from yolo_tpu.data.augment import mosaic4, random_flip, random_perspective

    rng = random.Random(5)
    items = []
    for i in range(4):
        poly = np.array([[20, 20], [60, 20], [60, 60], [20, 60]], np.float32) + i
        items.append({
            "img": np.full((80, 80, 3), 100, np.uint8),
            "bboxes": np.array([[20, 20, 61, 61]], np.float32) + i,
            "cls": np.array([0.0], np.float32),
            "segments": [poly],
        })
    lab = mosaic4(items, imgsz=80, rng=rng)
    assert len(lab["segments"]) == 4
    lab = random_perspective(lab, degrees=5.0, translate=0.05, scale=0.2, border=(-40, -40), rng=rng)
    assert len(lab["segments"]) == len(lab["bboxes"])
    for sg, box in zip(lab["segments"], lab["bboxes"]):
        assert sg is not None
        assert abs(sg[:, 0].min() - box[0]) < 1e-3 and abs(sg[:, 0].max() - box[2]) < 1e-3
    lab = random_flip(lab, lr_p=1.0, ud_p=0.0, rng=rng)
    w = lab["img"].shape[1]
    for sg, box in zip(lab["segments"], lab["bboxes"]):
        # mirrored polygon still inside the mirrored box
        assert sg[:, 0].min() >= box[0] - w and sg[:, 0].max() <= w


# --- SAHI-style tiling (ops/tiling.py; ref analog examples/YOLOv8-SAHI-Inference-Video) ---


def test_tile_grid_covers_frame():
    from yolo_tpu.ops.tiling import tile_grid

    h, w, t = 512, 640, 256
    grid = tile_grid(h, w, tile=t, overlap=0.25)
    cov = np.zeros((h, w), bool)
    for y, x in grid:
        assert 0 <= y <= h - t and 0 <= x <= w - t
        cov[y : y + t, x : x + t] = True
    assert cov.all(), "tiles must cover every pixel"
    # static grid: same inputs -> same grid (compile-cache friendly)
    assert grid == tile_grid(h, w, tile=t, overlap=0.25)


def test_tile_merge_dedups_and_maps_coords():
    from yolo_tpu.ops.tiling import merge_tile_detections, slice_tiles, tile_grid

    img = np.zeros((512, 640, 3), np.uint8)
    grid = tile_grid(512, 640, tile=256, overlap=0.25)
    tiles = slice_tiles(img, grid, 256)
    assert tiles.shape == (len(grid), 256, 256, 3)

    # one true object at frame (300..320, 250..270) seen by every tile that
    # contains it (tile-local coords), plus a unique one near the origin
    tgt = np.array([300.0, 250.0, 320.0, 270.0])
    per_tile = []
    for y0, x0 in grid:
        dets = []
        if tgt[0] >= x0 and tgt[2] <= x0 + 256 and tgt[1] >= y0 and tgt[3] <= y0 + 256:
            dets.append([tgt[0] - x0, tgt[1] - y0, tgt[2] - x0, tgt[3] - y0, 0.9, 0.0])
        if y0 == 0 and x0 == 0:
            dets.append([10, 10, 30, 30, 0.8, 0.0])
        d = np.asarray(dets, np.float32).reshape(-1, 6)
        per_tile.append((d[:, :4], d[:, 4], d[:, 5]))

    boxes, scores, cls = merge_tile_detections(per_tile, grid, iou_thres=0.5)
    assert len(boxes) == 2, f"duplicates not merged: {boxes}"
    got = boxes[np.argmax(scores)]
    assert np.allclose(got, tgt, atol=1e-5), "merged box must be in frame coords"


def test_tile_merge_is_class_aware():
    from yolo_tpu.ops.tiling import merge_tile_detections

    # identical geometry, different classes -> both survive class-aware NMS
    b = np.array([[10.0, 10, 50, 50]], np.float32)
    per_tile = [(np.concatenate([b, b]), np.array([0.9, 0.8], np.float32), np.array([0.0, 1.0], np.float32))]
    boxes, scores, cls = merge_tile_detections(per_tile, [(0, 0)], iou_thres=0.5)
    assert len(boxes) == 2
    boxes, scores, cls = merge_tile_detections(per_tile, [(0, 0)], iou_thres=0.5, class_aware=False)
    assert len(boxes) == 1


def test_tiled_predict_through_facade():
    """tiled_predict drives the YOLO facade with one batched call per frame."""
    from yolo_tpu import YOLO
    from yolo_tpu.ops.tiling import tiled_predict

    m = YOLO("yolov8-small.yaml")
    img = np.random.default_rng(0).integers(0, 255, (200, 320, 3), np.uint8)
    boxes, scores, cls = tiled_predict(m, img, tile=160, overlap=0.25, conf=0.9)
    assert boxes.shape[1:] == (4,)
    if len(boxes):  # random weights: any box must still be inside the frame
        assert (boxes[:, [0, 2]] <= 320).all() and (boxes[:, [1, 3]] <= 200).all()
