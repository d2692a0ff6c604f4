"""Grayscale-appearance fallback tracking (ref: Grayscale-Tracking/).

When the detector loses a small IR target, a 40×40 ROI / 5×5 sliding-window
grayscale+gradient scorer keeps predicting the target center indefinitely.
The reference's "GPU unfold" scorer maps to a vectorized window scorer here:
numpy on host, jitted JAX on device (both numerically identical to the
reference's per-window loop — golden-tested against it).
"""

from yolo_tpu.grayscale.scoring import gradient_window_scores, predict_center, predict_center_jax
from yolo_tpu.grayscale.tracker import GrayscaleTracker

__all__ = ["GrayscaleTracker", "gradient_window_scores", "predict_center", "predict_center_jax"]
