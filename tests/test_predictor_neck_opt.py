"""The engine predictor's neck-fold wiring: a fused model facade must produce
the same detections as the raw one (the fold is exact algebra), and the
program cache must key on the fused-params state so set_params can't serve a
stale program."""

import numpy as np
import pytest

import yolo_tpu


@pytest.mark.heavy  # 4 predictor compiles; the wiring test below stays default
def test_fused_facade_matches_raw():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96, 3), np.uint8)

    m_raw = yolo_tpu.YOLO("yolov8-small.yaml")
    r_raw = m_raw.predict(img, conf=0.001, imgsz=(64, 96), verbose=False)[0]

    m_fused = yolo_tpu.YOLO("yolov8-small.yaml")
    # same weights as m_raw (deterministic init), then fuse -> fold kicks in
    m_fused.params = m_raw.params
    m_fused.fuse()
    r_fused = m_fused.predict(img, conf=0.001, imgsz=(64, 96), verbose=False)[0]

    assert len(r_raw) == len(r_fused)
    if len(r_raw):
        np.testing.assert_allclose(
            r_fused.boxes.xyxy, r_raw.boxes.xyxy, rtol=1e-2, atol=0.5
        )
        np.testing.assert_allclose(
            r_fused.boxes.conf, r_raw.boxes.conf, rtol=5e-2, atol=1e-3
        )


def test_predictor_cache_keys_on_fused_state():
    model = yolo_tpu.YOLO("yolov8-small.yaml")
    model.predict(np.zeros((64, 96, 3), np.uint8), conf=0.25, imgsz=(64, 96), verbose=False)
    pred = model.predictor
    assert pred._params_fused_float is False
    key_raw = len(pred._fn_cache)
    model.fuse()
    model.predict(np.zeros((64, 96, 3), np.uint8), conf=0.25, imgsz=(64, 96), verbose=False)
    assert pred._params_fused_float is True
    # a fresh program was compiled for the fused tree (cache key changed)
    assert len(pred._fn_cache) > key_raw
