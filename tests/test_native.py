"""Native C++ preprocess library: builds, and matches the cv2 letterbox path."""

import numpy as np
import pytest

from yolo_tpu import native
from yolo_tpu.ops.letterbox import LetterBox


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
@pytest.mark.parametrize(
    "shape", [(512, 640, 3), (300, 500, 3), (720, 1280, 3), (100, 80, 3), (512, 640, 1)]
)
def test_native_letterbox_matches_cv2(shape):
    """Geometry exact, resample within ±1 level — covers pad-only (r=1),
    downscale (r<1), and real bilinear up-scales (r>1)."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, shape, np.uint8)
    ours, (ratio_n, pad_n) = native.letterbox(img, (640, 640))
    ref, (ratio_c, pad_c) = LetterBox((640, 640))(img, return_meta=True)
    assert ours.shape == ref.shape
    assert ratio_n[0] == pytest.approx(ratio_c[0], abs=1e-6)
    assert pad_n == pytest.approx(pad_c, abs=1e-4)
    # identical geometry; bilinear rounding may differ by ±1 intensity level
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.mean(diff) < 0.6 and diff.max() <= 1, (np.mean(diff), diff.max())


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
def test_predictor_uses_native_letterbox(monkeypatch):
    """The predictor's pre_transform routes through the C++ fast path by
    default (YOLO_TPU_NATIVE_PRE=0 restores the cv2 path)."""
    from yolo_tpu.engine.model import YOLO
    from yolo_tpu.engine.predictor import BasePredictor

    calls = {"n": 0}
    orig = native.letterbox

    def counting(img, dst_hw, pad_value=114):
        calls["n"] += 1
        return orig(img, dst_hw, pad_value)

    monkeypatch.setattr(native, "letterbox", counting)
    m = YOLO("yolov8-small.yaml")
    pred = BasePredictor(m.model, m.params, overrides={"imgsz": 64}, names=m.model.names)
    img = np.random.default_rng(2).integers(0, 255, (48, 80, 3), np.uint8)
    out, meta = pred.pre_transform(img)
    assert calls["n"] == 1 and out.shape == (64, 64, 3)
    monkeypatch.setenv("YOLO_TPU_NATIVE_PRE", "0")
    out2, meta2 = pred.pre_transform(img)
    assert calls["n"] == 1  # cv2 path, no new native call
    assert out2.shape == out.shape and meta2[0][0] == pytest.approx(meta[0][0])


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
def test_native_batch_letterbox():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (4, 256, 320, 3), np.uint8)
    out, (ratio, pad) = native.letterbox_batch(frames, (640, 640))
    assert out.shape == (4, 640, 640, 3)
    single, _ = native.letterbox(frames[2], (640, 640))
    assert np.array_equal(out[2], single)
