"""Alternative-pipeline tests: classical detector parity with the reference
implementation (oracle), JAX enhancement ≈ cv2 enhancement, 4-state Kalman math,
single-target loop behavior."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.otherplan import KalmanCV2D, classical_detect, enhance_small_targets
from yolo_tpu.otherplan.single_target import IRSmallTargetTracker


def ir_frame_with_blob(cx, cy, h=512, w=640, r=0.9, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    # smooth low-frequency background (sky/cloud-like), not pixel noise —
    # the top-hat enhancement is designed for exactly this regime
    noise = rng.normal(40, 8, (h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(noise, (w, h), interpolation=cv2.INTER_CUBIC)
    yy, xx = np.mgrid[0:h, 0:w]
    blob = 160 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r**2)))
    return np.clip(img + blob, 0, 255).astype(np.uint8)


def test_classical_detect_finds_small_bright_target():
    gray = ir_frame_with_blob(150, 100)
    boxes = classical_detect(gray, gray.shape)
    assert len(boxes) >= 1
    x1, y1, x2, y2, score = boxes[0]
    assert abs((x1 + x2) / 2 - 150) < 6 and abs((y1 + y2) / 2 - 100) < 6


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_classical_detect_golden_parity():
    add_reference_to_path()
    import importlib.util

    # yolov11x+kalman.py is the variant our params mirror (simple_detection.py
    # uses different weights/sigmas — a second tuning in the reference)
    spec = importlib.util.spec_from_file_location("ref_yk", "/root/reference/otherplan/yolov11x+kalman.py")
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"cannot load reference oracle: {e}")
    if not hasattr(mod, "enhance_small_targets"):
        pytest.skip("reference module lacks enhance_small_targets")
    gray = ir_frame_with_blob(88, 140, seed=2)
    ref_enh = mod.enhance_small_targets(gray)
    our_enh = enhance_small_targets(gray)
    assert np.allclose(ref_enh.astype(int), our_enh.astype(int), atol=1)
    if hasattr(mod, "classical_detect"):
        ref_boxes = mod.classical_detect(gray, gray.shape)
        our_boxes = classical_detect(gray, gray.shape)
        assert len(ref_boxes) == len(our_boxes)
        for a, b in zip(ref_boxes, our_boxes):
            assert tuple(a[:4]) == tuple(b[:4])
            assert a[4] == pytest.approx(b[4], abs=1e-3)


@pytest.mark.heavy  # dense cv2-oracle sweep
def test_jax_enhancement_close_to_cv2():
    import jax.numpy as jnp

    from yolo_tpu.otherplan import enhance_small_targets_jax

    gray = ir_frame_with_blob(120, 80, seed=4)
    ours = np.asarray(enhance_small_targets_jax(jnp.asarray(gray[None].astype(np.float32))))[0]
    host = enhance_small_targets(gray).astype(np.float32)
    # different border handling/kernel sizes → compare peak location, not pixels
    oy, ox = np.unravel_index(np.argmax(ours), ours.shape)
    hy, hx = np.unravel_index(np.argmax(host), host.shape)
    assert abs(ox - hx) <= 4 and abs(oy - hy) <= 4


def test_kalman_cv2d_converges_to_velocity():
    kf = KalmanCV2D(dt=1.0)
    kf.init(100, 100, init_vel=(-5.0, 0.0))
    for i in range(1, 40):
        kf.predict()
        kf.update(100 - 3.0 * i, 100 + 1.0 * i)
    cx, cy, vx, vy = kf.state
    assert abs(vx + 3.0) < 0.5 and abs(vy - 1.0) < 0.5


def test_single_target_tracker_gating_and_coast():
    frames = []
    for f in range(50):
        cx = 280 - 4 * f  # right→left
        frames.append(ir_frame_with_blob(cx, 120, seed=f))

    calls = {"n": 0}

    def det(frame_bgr):
        f = calls["n"]
        calls["n"] += 1
        if 20 <= f < 28:  # dropout → classical fallback / coast
            return []
        cx = 280 - 4 * f
        return [[cx - 4, 116, cx + 4, 124, 0.8]]

    t = IRSmallTargetTracker(fps=25, detector=det)
    import cv2

    alive_frames = 0
    for fr in frames:
        if not t.step(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR)):
            break
        alive_frames += 1
    assert alive_frames == 50  # classical fallback keeps it alive through dropout
    cx, cy, vx, vy = t.kf.state
    assert vx < -2.0  # leftward velocity learned
