"""Native C++ preprocess library: builds, and matches the cv2 letterbox path."""

import numpy as np
import pytest

from yolo_tpu import native
from yolo_tpu.ops.letterbox import LetterBox


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
def test_native_letterbox_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (512, 640, 3), np.uint8)
    ours, (ratio_n, pad_n) = native.letterbox(img, (640, 640))
    ref, (ratio_c, pad_c) = LetterBox((640, 640))(img, return_meta=True)
    assert ours.shape == ref.shape
    assert ratio_n[0] == pytest.approx(ratio_c[0], abs=1e-6)
    assert pad_n == pytest.approx(pad_c, abs=0.5)
    # identical geometry; bilinear rounding may differ by ±1 intensity level
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.mean(diff) < 0.6 and np.percentile(diff, 99) <= 2, (np.mean(diff), diff.max())


@pytest.mark.skipif(not native.available(), reason="no g++ / build failed")
def test_native_batch_letterbox():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (4, 256, 320, 3), np.uint8)
    out, (ratio, pad) = native.letterbox_batch(frames, (640, 640))
    assert out.shape == (4, 640, 640, 3)
    single, _ = native.letterbox(frames[2], (640, 640))
    assert np.array_equal(out[2], single)
