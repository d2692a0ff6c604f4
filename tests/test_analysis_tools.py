"""ROI analysis tools + loss-event capture + progress/logging utilities."""

import numpy as np

from yolo_tpu.grayscale.analysis import ROI_METHODS, LossEventCapturer, roi_analysis_comparison
from yolo_tpu.utils.logger import TQDM, ConsoleLogger


def blob_roi(cx=20, cy=20, size=40, seed=0):
    rng = np.random.default_rng(seed)
    roi = rng.normal(30, 3, (size, size)).clip(0, 255)
    yy, xx = np.mgrid[0:size, 0:size]
    roi += 180 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 2.0**2)))
    return roi.clip(0, 255).astype(np.uint8)


def test_all_roi_methods_find_center():
    roi = blob_roi(25, 14)
    results = roi_analysis_comparison([roi], true_centers=[(25, 14)])
    assert set(results) == set(ROI_METHODS)
    # the bright-blob-friendly methods must be within a few px
    for m in ("max_value", "mean_window", "local_contrast", "temperature_cluster"):
        assert results[m]["mean_error"] < 4.0, (m, results[m])


def test_roi_report_written(tmp_path):
    rois = [blob_roi(20, 20, seed=i) for i in range(3)]
    roi_analysis_comparison(rois, true_centers=[(20, 20)] * 3, report_path=tmp_path / "report.txt")
    text = (tmp_path / "report.txt").read_text()
    assert "max_value" in text


def test_loss_event_capturer(tmp_path):
    cap = LossEventCapturer(tmp_path, patch=25, lost_threshold=3)
    frame = blob_roi(60, 60, size=120)
    for f in range(10):
        dets = [(60, 60)] if f < 4 else []
        cap.step(frame, dets, f)
    assert len(cap.captured) >= 1
    import cv2

    patch = cv2.imread(cap.captured[0], cv2.IMREAD_GRAYSCALE)
    assert patch.shape == (25, 25)


def test_tqdm_and_console_logger(tmp_path, capsys):
    import io

    buf = io.StringIO()
    for _ in TQDM(range(50), desc="x", file=buf):
        pass
    assert "100%" in buf.getvalue()

    log = tmp_path / "console.log"
    with ConsoleLogger(log):
        print("hello capture")
    assert "hello capture" in log.read_text()
