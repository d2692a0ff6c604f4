"""Alternative pipelines (ref: otherplan/).

Standalone variants of the IR small-target pipeline:
  - :mod:`classical` — Top-hat + LoG + local-contrast enhancement and
    geometry-filtered detection (no learned model needed); the enhancement has
    a batched jitted JAX twin for the device path.
  - :mod:`single_target` — 4-state [cx,cy,vx,vy] Kalman single-target tracker
    with right→left direction prior, 50 px gating, 30-frame coast limit and CSV
    trajectory output (ref: otherplan/yolov11x+kalman.py).
  - :func:`detect_only` — detector-only video loop (ref: yolo_detect_only.py).
"""

from yolo_tpu.otherplan.classical import classical_detect, enhance_small_targets, enhance_small_targets_jax
from yolo_tpu.otherplan.single_target import IRSmallTargetTracker, KalmanCV2D, run_single_target_tracking
from yolo_tpu.otherplan.detect_only import detect_only

__all__ = [
    "classical_detect", "enhance_small_targets", "enhance_small_targets_jax",
    "IRSmallTargetTracker", "KalmanCV2D", "run_single_target_tracking", "detect_only",
]
