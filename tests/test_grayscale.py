"""Grayscale fallback tracker tests: vectorized scorer vs the reference's
per-window loop (golden oracle), numpy↔JAX scorer agreement, and the full
forced-loss recovery pipeline on a synthetic clip."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.grayscale import GrayscaleTracker, predict_center
from yolo_tpu.grayscale.scoring import gradient_window_scores, predict_center_jax


def make_frame(cx, cy, h=128, w=160, noise_seed=0):
    rng = np.random.default_rng(noise_seed)
    img = rng.normal(28, 5, (h, w)).clip(0, 255).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = 200 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 3.0**2)))
    return np.clip(img + blob, 0, 255).astype(np.uint8)


def test_predict_center_finds_bright_blob():
    frame = make_frame(80, 60)
    (gx, gy), score = predict_center(frame, (70, 55))  # last center 11px off
    assert abs(gx - 80) <= 2 and abs(gy - 60) <= 2
    assert score > 0.3


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_scorer_golden_parity_with_reference_loop():
    """Vectorized scorer == the reference's per-window double loop."""
    add_reference_to_path()
    from grayscale_tracking_system_oracle import ref_gradient_magnitude_prediction

    frame = make_frame(83, 57, noise_seed=3)
    for last_center in [(70, 55), (90, 60), (10, 10), (155, 120)]:
        ref_center, ref_score = ref_gradient_magnitude_prediction(frame, last_center, roi_size=40)
        our_center, our_score = predict_center(frame, last_center, roi_size=40)
        assert tuple(our_center) == tuple(ref_center), (last_center, our_center, ref_center)
        assert our_score == pytest.approx(ref_score, abs=1e-4)


def test_jax_scorer_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    roi = rng.uniform(0, 255, (40, 40)).astype(np.float32)
    np_scores = gradient_window_scores(roi)
    best, best_score = predict_center_jax(jnp.asarray(roi))
    iy, ix = np.unravel_index(int(np.argmax(np_scores)), np_scores.shape)
    assert tuple(np.asarray(best)) == (iy, ix)
    assert float(best_score) == pytest.approx(float(np_scores[iy, ix]), rel=1e-5)


def test_forced_loss_recovery_pipeline(tmp_path):
    """Detector blackout (test mode) → grayscale coasting keeps the track."""
    import cv2

    vid = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30, (160, 128))
    centers = [(20 + 3 * f, 64) for f in range(40)]
    for cx, cy in centers:
        vw.write(cv2.cvtColor(make_frame(cx, cy), cv2.COLOR_GRAY2BGR))
    vw.release()

    def det(frame):
        # locate the blob from the frame itself (stub "detector")
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) if frame.ndim == 3 else frame
        blur = cv2.GaussianBlur(gray, (5, 5), 0)
        cy, cx = np.unravel_index(int(np.argmax(blur)), blur.shape)
        return [[cx - 6, cy - 6, cx + 6, cy + 6, 0.9, 0]]

    tracker = GrayscaleTracker(detector=det)
    stats = tracker.process_video(vid, output_path=tmp_path / "out.mp4", test_range=(10, 25), max_frames=40)
    assert stats["frames"] == 40
    assert stats["predicted_frames"] >= 14  # coasted through the blackout
    # track survived the blackout without id churn
    assert len(stats["tracks"]) == 1
    info = list(stats["tracks"].values())[0]
    assert info["status"] == "detected"  # re-acquired at the end
    # prediction followed the blob: final center near the last detection
    assert abs(info["last_center"][0] - centers[-1][0]) < 15


def test_config_overlays_tracker_params(tmp_path):
    """INI values actually land on the tracker (incl. the association gate,
    which was parsed but unwired before round 3)."""
    ini = tmp_path / "cfg.ini"
    ini.write_text(
        "[TRACKING_PARAMETERS]\n"
        "roi_size = 24\n"
        "search_radius = 30\n"
        "similarity_threshold = 0.4\n"
        "distance_threshold = 40\n"
        "[MODEL_SETTINGS]\n"
        "detection_threshold = 0.5\n"
    )
    from yolo_tpu.grayscale.config import load_config, tracker_from_config

    cfg = load_config(ini)
    assert cfg["TRACKING_PARAMETERS"]["distance_threshold"] == 40
    t = tracker_from_config(ini, detector=lambda f: [])
    assert (t.roi_size, t.search_radius, t.min_prediction_confidence, t.dist_threshold, t.conf) == (24, 30, 0.4, 40.0, 0.5)
    # the gate is live: a detection 60 px from the only track must NOT associate
    import numpy as np

    frame = np.zeros((200, 200, 3), np.uint8)
    t.tracks[0] = {"last_center": (50, 50), "last_detection_frame": 0}
    t.track_id_counter = 1
    cur = t.associate_detections([[105, 45, 115, 55, 0.9, 0]], frame, 1)  # center (110, 50): 60 px away
    assert 0 not in cur and 1 in cur  # new track, not stolen


def test_save_process_with_explicit_output_path(tmp_path, monkeypatch):
    """save_process artifacts are written even when output_path is named
    (the results tree was only created for unnamed outputs before round 3)."""
    import cv2
    import numpy as np

    from yolo_tpu.grayscale.tracker import GrayscaleTracker

    monkeypatch.chdir(tmp_path)
    vid = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
    for f in range(6):
        fr = np.full((64, 64, 3), 15, np.uint8)
        cv2.circle(fr, (20 + 2 * f, 32), 4, (250,) * 3, -1)
        vw.write(fr)
    vw.release()

    calls = {"n": 0}

    def det(frame):
        calls["n"] += 1
        f = calls["n"] - 1
        return [] if f >= 2 else [[14 + 2 * f, 26, 26 + 2 * f, 38, 0.9, 0]]

    t = GrayscaleTracker(detector=det, save_process=True)
    t.process_video(vid, output_path=str(tmp_path / "out.mp4"), write_video=True)
    assert t.process_dir is not None and t.process_dir.exists()
    assert any(t.roi_patches_dir.iterdir()) or any(t.grayscale_data_dir.iterdir())


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_ncc_search_golden_parity_with_reference_loop():
    """Vectorized stride-2 NCC grid search == the reference's manual double
    loop (ref grayscale_tracking_system.py:644-714), incl. border clipping and
    first-in-scan-order tie handling."""
    add_reference_to_path()
    from grayscale_tracking_system_oracle import ref_grayscale_similarity_search

    from yolo_tpu.grayscale.scoring import grayscale_similarity_search

    rng = np.random.default_rng(11)
    template = rng.integers(0, 255, (24, 24), np.uint8)  # even side: the live case
    for seed, last_center, radius in [(0, (80, 60), 50), (1, (15, 15), 50), (2, (150, 120), 30), (3, (80, 60), 7)]:
        frame = make_frame(83, 57, noise_seed=seed)
        # plant the template so there is a real peak to find
        frame[40:64, 90:114] = template
        ref_center, ref_score = ref_grayscale_similarity_search(frame, template, last_center, search_radius=radius)
        our_center, our_score = grayscale_similarity_search(frame, template, last_center, search_radius=radius)
        assert tuple(our_center) == tuple(ref_center), (last_center, our_center, ref_center)
        assert our_score == pytest.approx(ref_score, abs=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_ncc_search_odd_template_degenerates_like_reference():
    """The reference's extract_roi yields 2*(size//2) pixels, so an odd
    template (the 25x25 capture default) never shape-matches — the search
    returns (last_center, -1). Keep that contract bit-for-bit."""
    add_reference_to_path()
    from grayscale_tracking_system_oracle import ref_grayscale_similarity_search

    from yolo_tpu.grayscale.scoring import grayscale_similarity_search

    frame = make_frame(83, 57, noise_seed=4)
    template = np.random.default_rng(7).integers(0, 255, (25, 25), np.uint8)
    ref_out = ref_grayscale_similarity_search(frame, template, (80, 60))
    our_out = grayscale_similarity_search(frame, template, (80, 60))
    assert tuple(our_out[0]) == tuple(ref_out[0]) and our_out[1] == ref_out[1] == -1


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_lost_target_chooser_parity():
    """The best-of chooser (ref :806-830: gradient first, NCC overrides when it
    scores strictly higher) picks the same method + center as the reference."""
    add_reference_to_path()
    from grayscale_tracking_system_oracle import (
        ref_gradient_magnitude_prediction,
        ref_grayscale_similarity_search,
    )

    template = np.random.default_rng(21).integers(100, 255, (24, 24), np.uint8)

    def run_chooser(frame, last_center, tmpl):
        tr = GrayscaleTracker(detector=lambda f: [], local_grayscale_template=tmpl)
        tr.tracks[1] = {"last_center": last_center, "last_detection_frame": 0,
                        "last_bbox": (last_center[0] - 12, last_center[1] - 12,
                                      last_center[0] + 12, last_center[1] + 12)}
        out = tr.predict_lost_targets(frame, 5, gray=frame)
        return out[1]["last_center"], out[1]["confidence"]

    for seed, plant in [(0, True), (1, False)]:
        frame = make_frame(83, 57, noise_seed=seed)
        if plant:  # a strong NCC peak away from the gradient blob
            frame[40:64, 90:114] = template
        g_center, g_score = ref_gradient_magnitude_prediction(frame, (80, 60), roi_size=40)
        n_center, n_score = ref_grayscale_similarity_search(frame, template, (80, 60))
        ref_center, ref_score = (n_center, n_score) if n_score > g_score else (g_center, g_score)
        our_center, our_score = run_chooser(frame, (80, 60), template)
        assert tuple(our_center) == tuple(ref_center)
        assert our_score == pytest.approx(ref_score, abs=1e-4)
