"""Association cost matrices + linear assignment (ref: trackers/utils/matching.py)."""

from __future__ import annotations

import numpy as np
import scipy.optimize

from yolo_tpu.ops.boxes import box_iou


def linear_assignment(cost_matrix: np.ndarray, thresh: float):
    """Hungarian assignment with cost threshold.

    Returns (matches (M,2), unmatched_a, unmatched_b) — same contract as the
    reference's lap.lapjv path (ref: matching.py:20).
    """
    if cost_matrix.size == 0:
        return (
            np.empty((0, 2), dtype=int),
            tuple(range(cost_matrix.shape[0])),
            tuple(range(cost_matrix.shape[1])),
        )
    # forbid above-threshold pairs
    cost = cost_matrix.copy()
    cost[cost > thresh] = thresh + 1e-4
    row, col = scipy.optimize.linear_sum_assignment(cost)
    matches = [(r, c) for r, c in zip(row, col) if cost_matrix[r, c] <= thresh]
    matched_a = {m[0] for m in matches}
    matched_b = {m[1] for m in matches}
    unmatched_a = tuple(i for i in range(cost_matrix.shape[0]) if i not in matched_a)
    unmatched_b = tuple(i for i in range(cost_matrix.shape[1]) if i not in matched_b)
    return np.asarray(matches, dtype=int).reshape(-1, 2), unmatched_a, unmatched_b


def iou_distance(atracks: list, btracks: list) -> np.ndarray:
    """1 - IoU cost between two track/box lists (ref: matching.py:64); OBB
    tracks (5-col xywha) use probiou like the reference."""

    def coords(tracks):
        if tracks and not isinstance(tracks[0], np.ndarray):
            return [t.xywha if getattr(t, "angle", None) is not None else t.xyxy for t in tracks]
        return tracks

    atlbrs, btlbrs = coords(atracks), coords(btracks)
    if len(atlbrs) == 0 or len(btlbrs) == 0:
        return np.zeros((len(atlbrs), len(btlbrs)), dtype=np.float32)
    a, b = np.stack(atlbrs).astype(np.float32), np.stack(btlbrs).astype(np.float32)
    if a.shape[-1] == 5 and b.shape[-1] == 5:  # rotated (ref matching.py:90)
        from yolo_tpu.ops.boxes import probiou

        ious = np.asarray(probiou(a[:, None], b[None]), dtype=np.float32)[..., 0]
    else:
        ious = np.asarray(box_iou(a, b), dtype=np.float32)
    return 1.0 - ious


def embedding_distance(tracks: list, detections: list, metric: str = "cosine") -> np.ndarray:
    """Cosine distance between track smooth features and detection features."""
    cost = np.zeros((len(tracks), len(detections)), dtype=np.float32)
    if cost.size == 0:
        return cost
    det_features = np.asarray([d.curr_feat for d in detections], dtype=np.float32)
    track_features = np.asarray([t.smooth_feat for t in tracks], dtype=np.float32)
    a = track_features / (np.linalg.norm(track_features, axis=1, keepdims=True) + 1e-9)
    b = det_features / (np.linalg.norm(det_features, axis=1, keepdims=True) + 1e-9)
    return np.maximum(0.0, 1.0 - a @ b.T)


def fuse_score(cost_matrix: np.ndarray, detections: list) -> np.ndarray:
    """Fuse detection confidence into the IoU cost (ref: matching.py:134)."""
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1 - cost_matrix
    det_scores = np.array([d.score for d in detections])
    det_scores = np.broadcast_to(det_scores[None, :], cost_matrix.shape)
    fused = iou_sim * det_scores
    return 1 - fused
