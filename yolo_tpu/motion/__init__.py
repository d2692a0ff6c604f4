"""Camera-motion compensation (ref: camera_motion_compensation/).

Global camera-motion detection (optical flow / ORB feature matching / hybrid)
triggering Kalman-state resets — the fork's answer to panning IR cameras:

  - :class:`GlobalMotionDetector` — per-frame motion magnitude/vector + reset flag.
  - :class:`MotionResetKalmanTracker` — single-target tracker with jump detection
    and filter reset.
  - :class:`MotionCompensatedMultiTracker` — multi-target manager wiring both.
"""

from yolo_tpu.motion.global_motion_detector import GlobalMotionDetector
from yolo_tpu.motion.motion_reset_tracker import MotionResetKalmanTracker
from yolo_tpu.motion.motion_compensated_tracker import MotionCompensatedMultiTracker

__all__ = ["GlobalMotionDetector", "MotionResetKalmanTracker", "MotionCompensatedMultiTracker"]
