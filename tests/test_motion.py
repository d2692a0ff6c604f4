"""Camera-motion compensation tests: jump-detection/reset logic on synthetic
position sequences (the reference's quick_test.py pattern — model-free), plus
golden parity of the reset tracker against the reference implementation."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.motion import MotionCompensatedMultiTracker, MotionResetKalmanTracker


def test_position_jump_triggers_reset():
    t = MotionResetKalmanTracker([100, 100, 120, 116])
    # settle with smooth motion
    for i in range(1, 20):
        t.predict()
        t.update([100 + 2 * i, 100, 120 + 2 * i, 116])
    assert t.reset_count == 0
    # sudden 200px jump (simulated camera pan)
    t.predict()
    t.update([340, 300, 360, 316])
    assert t.reset_count == 1
    assert np.allclose(t.x[4:], 0)  # velocities zeroed on reset
    assert t.reset_reasons[-1]["reasons"][0].startswith("position_jump")


def test_reset_cooldown_suppresses_consecutive_resets():
    t = MotionResetKalmanTracker([0, 0, 20, 20])
    for i in range(1, 20):
        t.predict()
        t.update([2 * i, 0, 20 + 2 * i, 20])
    t.predict()
    t.update([300, 300, 320, 320])
    assert t.reset_count == 1
    # immediate second jump inside the 15-frame cooldown must NOT reset again
    t.predict()
    t.update([600, 600, 620, 620])
    assert t.reset_count == 1


def test_multi_tracker_global_reset_on_camera_pan():
    import cv2

    mt = MotionCompensatedMultiTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1)
    rng = np.random.default_rng(0)
    # structured background (random blobs) so optical flow tracks reliably
    base = np.full((240, 320), 30, np.uint8)
    for _ in range(60):
        x, y = int(rng.uniform(10, 310)), int(rng.uniform(10, 230))
        cv2.circle(base, (x, y), int(rng.uniform(3, 9)), int(rng.uniform(90, 220)), -1)
    frame0 = cv2.cvtColor(base, cv2.COLOR_GRAY2BGR)

    dets = [[100, 100, 120, 115, 0.9]]
    for f in range(6):
        mt.update([list(d) for d in dets], frame0)
    # progressive camera pan: 35 px/frame for 3 frames (sustained-motion path)
    tracks = []
    for k in range(1, 4):
        M = np.float32([[1, 0, -35 * k], [0, 1, 0]])
        panned = cv2.warpAffine(frame0, M, (320, 240))
        shifted_dets = [[100 - 35 * k, 100, 120 - 35 * k, 115, 0.9]]
        tracks = mt.update(shifted_dets, panned)
    assert mt.motion_detector.stats["motion_events"] >= 1
    assert len(tracks) >= 1


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_reset_tracker_golden_parity():
    add_reference_to_path()
    from camera_motion_compensation.motion_reset_kalman_tracker import (
        MotionResetKalmanTracker as RefTracker,
    )

    ours = MotionResetKalmanTracker([100, 100, 120, 116], track_id="T001")
    ref = RefTracker([100, 100, 120, 116], track_id="T001")
    rng = np.random.default_rng(5)
    for i in range(1, 60):
        ours.predict()
        ref.predict()
        if i == 30:  # inject a camera jump
            bbox = [400.0, 350.0, 420.0, 366.0]
        else:
            jitter = rng.normal(0, 0.3, 2)
            x = 100 + 3 * i + jitter[0]
            y = 100 + jitter[1] + (300 - 50 if i > 30 else 0) * 0  # stay linear otherwise
            bbox = [x, y, x + 20, y + 16]
            if i > 30:
                bbox = [x + 300, y + 250, x + 320, y + 266]
        ours.update(list(bbox))
        ref.update(list(bbox))
        assert ours.reset_count == ref.reset_count, i
        assert np.allclose(ours.x, ref.x, atol=1e-6), i
        a, b = ours.get_track_info(), ref.get_track_info()
        assert np.allclose(a["bbox"], b["bbox"], atol=1e-6)
        assert a["reset_count"] == b["reset_count"]


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_global_motion_detector_golden_parity():
    """Deterministic cv2 pipelines → identical (is_motion, magnitude, reset) decisions."""
    add_reference_to_path()
    import cv2
    from camera_motion_compensation.global_motion_detector import GlobalMotionDetector as RefDetector

    from yolo_tpu.motion import GlobalMotionDetector

    rng = np.random.default_rng(0)
    base = np.full((240, 320), 30, np.uint8)
    for _ in range(80):
        x, y = int(rng.uniform(10, 310)), int(rng.uniform(10, 230))
        cv2.circle(base, (x, y), int(rng.uniform(2, 7)), int(rng.uniform(80, 220)), -1)
    frames = [cv2.cvtColor(base, cv2.COLOR_GRAY2BGR)]
    for k in (5, 12, 40, 42, 45, 0, 0):  # mixed small/large pans
        M = np.float32([[1, 0, -k], [0, 1, 0]])
        frames.append(cv2.cvtColor(cv2.warpAffine(base, M, (320, 240)), cv2.COLOR_GRAY2BGR))

    ours = GlobalMotionDetector("optical_flow")
    ref = RefDetector("optical_flow")
    for f in frames:
        a = ours.detect_motion(f.copy())
        b = ref.detect_motion(f.copy())
        assert a[0] == b[0] and a[3] == b[3], (a, b)
        assert a[1] == pytest.approx(b[1], abs=1e-4)
    assert ours.stats["motion_events"] == ref.stats["motion_events"]
    assert ours.stats["reset_triggers"] == ref.stats["reset_triggers"]


def test_motion_method_comparison_harness(tmp_path):
    import cv2

    from yolo_tpu.motion.compare import compare_motion_methods

    vid = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30, (320, 240))
    rng = np.random.default_rng(0)
    base = np.full((240, 320), 30, np.uint8)
    for _ in range(60):
        x, y = int(rng.uniform(10, 310)), int(rng.uniform(10, 230))
        cv2.circle(base, (x, y), int(rng.uniform(3, 8)), int(rng.uniform(90, 210)), -1)
    for f in range(20):
        M = np.float32([[1, 0, -2 * f], [0, 1, 0]])
        vw.write(cv2.cvtColor(cv2.warpAffine(base, M, (320, 240)), cv2.COLOR_GRAY2BGR))
    vw.release()

    def det(frame):
        return [[100, 100, 120, 115, 0.9]]

    out = compare_motion_methods(vid, det, max_frames=20, report_path=tmp_path / "report.txt")
    assert set(out["results"]) == {"optical_flow", "feature_matching", "hybrid"}
    assert out["recommended"] in out["results"]
    text = (tmp_path / "report.txt").read_text()
    assert "Recommended method" in text and "FPS" in text
