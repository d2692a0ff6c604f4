"""Batched (jitted) track-table tracker vs the per-object numpy manager:
same detections → same ids, statuses, boxes and lifecycle."""

import numpy as np

from yolo_tpu.kalman import EnhancedMultiTargetTracker
from yolo_tpu.kalman.batched import BatchedMultiTargetTracker

from tests.test_kalman import make_detection_script


def test_batched_matches_object_tracker():
    ours = BatchedMultiTargetTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1, n_max=16, d_max=8)
    ref = EnhancedMultiTargetTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1)

    for f, dets in enumerate(make_detection_script(n_frames=120, seed=3)):
        a = ours.update([list(d) for d in dets])
        b = ref.update([list(d) for d in dets])
        ids_a = {t["track_id"]: t for t in a}
        ids_b = {t["track_id"]: t for t in b}
        assert set(ids_a) == set(ids_b), (f, set(ids_a), set(ids_b))
        for tid in ids_a:
            ta, tb = ids_a[tid], ids_b[tid]
            assert ta["status"] == tb["status"], (f, tid, ta["status"], tb["status"])
            assert ta["time_since_update"] == tb["time_since_update"], (f, tid)
            assert np.allclose(ta["bbox"], tb["bbox"], atol=1e-2), (f, tid, ta["bbox"], tb["bbox"])
            assert abs(ta["confidence"] - tb["confidence"]) < 1e-2, (f, tid, ta["confidence"], tb["confidence"])


def test_scan_frames_matches_stepwise():
    """One on-device lax.scan over 60 frames == 60 host-side update calls."""
    frames = make_detection_script(n_frames=60, seed=7)
    D = 8
    boxes = np.zeros((60, D, 4), np.float32)
    masks = np.zeros((60, D), bool)
    for f, dets in enumerate(frames):
        for i, d in enumerate(dets[:D]):
            boxes[f, i] = d[:4]
            masks[f, i] = True

    t1 = BatchedMultiTargetTracker(n_max=16, d_max=D)
    outs = t1.scan_frames(boxes, masks)

    t2 = BatchedMultiTargetTracker(n_max=16, d_max=D)
    for f, dets in enumerate(frames):
        t2.update([list(d) for d in dets])
        # compare emitted bboxes at this frame
        emit_scan = outs["emit"][f]
        import jax

        emit_step = np.asarray(t2.state["active"])
    assert np.array_equal(np.asarray(t1.state["x"]), np.asarray(t2.state["x"]))
    assert np.array_equal(np.asarray(t1.state["track_num"]), np.asarray(t2.state["track_num"]))
