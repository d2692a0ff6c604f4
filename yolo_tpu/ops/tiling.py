"""SAHI-style tiled (sliced) inference for small targets.

Reference analog: examples/YOLOv8-SAHI-Inference-Video/yolov8_sahi.py — the
reference wraps the external `sahi` package and runs the detector slice by
slice in a Python loop. TPU-first redesign: the tile grid is STATIC for a
given (H, W, tile, overlap) so every frame reuses one compiled program; all
tiles run as ONE batched call (the MXU sees a (T, tile, tile, 3) batch
instead of T sequential launches); the merge is offset-shift + greedy NMS
over the already per-tile-suppressed candidates (the classic SAHI
postprocess).

Why it matters here: the flagship task is <32x32 px IR targets. Tiling keeps
them at native resolution instead of shrinking them through a full-frame
resize, trading FLOPs for recall — the same motivation as the reference's
P2 head, composable with it.
"""

from __future__ import annotations

import numpy as np


def tile_grid(h: int, w: int, tile: int = 256, overlap: float = 0.25):
    """Static tile origins covering (h, w); the last row/col snaps to the
    border so every pixel is covered without ragged tiles.

    Returns a list of (y0, x0) ints.
    """
    tile = int(min(tile, h, w))
    step = max(1, int(round(tile * (1.0 - overlap))))

    def starts(extent):
        s = list(range(0, max(extent - tile, 0) + 1, step))
        if s[-1] + tile < extent:
            s.append(extent - tile)
        return s

    return [(y, x) for y in starts(h) for x in starts(w)]


def slice_tiles(img: np.ndarray, grid, tile: int) -> np.ndarray:
    """Stack tiles of `img` (H, W, C) into one (T, tile, tile, C) batch."""
    return np.stack([img[y : y + tile, x : x + tile] for y, x in grid])


def _greedy_nms(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> list[int]:
    """Host-side greedy NMS over the merged (already small) candidate set."""
    order = np.argsort(-scores)
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-9)
        suppressed |= iou > iou_thres
    return keep


def merge_tile_detections(per_tile, grid, iou_thres: float = 0.5, class_aware: bool = True):
    """Merge per-tile detections back into frame coordinates.

    Args:
        per_tile: sequence of (boxes_xyxy (N,4), scores (N,), cls (N,)) numpy
            triplets, one per grid entry (tile-local coordinates).
        grid: the (y0, x0) origins from `tile_grid`.
        iou_thres: suppression threshold across overlapping tiles.
        class_aware: suppress only within the same class (matches the
            predictor's default non-agnostic NMS).

    Returns:
        (boxes_xyxy (M,4), scores (M,), cls (M,)) in frame coordinates.
    """
    all_b, all_s, all_c = [], [], []
    for (y0, x0), (b, s, c) in zip(grid, per_tile):
        if len(b) == 0:
            continue
        b = np.asarray(b, np.float32).copy()
        b[:, [0, 2]] += x0
        b[:, [1, 3]] += y0
        all_b.append(b)
        all_s.append(np.asarray(s, np.float32))
        all_c.append(np.asarray(c, np.float32))
    if not all_b:
        z = np.zeros((0,), np.float32)
        return np.zeros((0, 4), np.float32), z, z
    boxes = np.concatenate(all_b)
    scores = np.concatenate(all_s)
    cls = np.concatenate(all_c)
    # class-offset trick: disjoint classes never overlap geometrically
    off = cls * 7680.0 if class_aware else np.zeros_like(cls)
    keep = _greedy_nms(boxes + off[:, None], scores, iou_thres)
    return boxes[keep], scores[keep], cls[keep]


def tiled_predict(model, img: np.ndarray, tile: int = 256, overlap: float = 0.25,
                  conf: float = 0.25, iou: float = 0.45, merge_iou: float = 0.5, **kwargs):
    """Run a YOLO facade over a static tile grid and merge detections.

    All tiles go through `model.predict` as one batch (one device program, T
    on the batch axis). Returns (boxes_xyxy, scores, cls) in frame coords.
    """
    grid = tile_grid(img.shape[0], img.shape[1], tile, overlap)
    tiles = slice_tiles(img, grid, tile)
    results = model.predict(list(tiles), conf=conf, iou=iou, imgsz=tile, verbose=False, **kwargs)
    per_tile = [(r.boxes.xyxy, r.boxes.conf, r.boxes.cls) for r in results]
    return merge_tile_detections(per_tile, grid, iou_thres=merge_iou)
