"""Long-horizon Kalman tracking for IR aircraft under cloud occlusion.

Re-implements the fork's custom tracking stack (ref: kalman/
enhanced_aircraft_kalman_tracker.py, enhanced_multi_target_tracker.py,
trajectory_visualizer.py, aircraft_detection_tracking.py) with identical
state-machine semantics and output schema. Two implementations share one
contract:

  - :mod:`yolo_tpu.kalman.tracker` — per-track numpy objects (API parity layer,
    drop-in for the reference classes).
  - :mod:`yolo_tpu.kalman.batched` — fixed-capacity (N,8) track table with fused
    predict/associate/update as one jitted step, `lax.scan`-able over frames
    (the TPU fast path used by the fused detect+track loop).
"""

from yolo_tpu.kalman.tracker import AircraftKalmanTracker, EnhancedAircraftKalmanTracker
from yolo_tpu.kalman.multi_tracker import EnhancedMultiTargetTracker
from yolo_tpu.kalman.visualizer import TrajectoryVisualizer

__all__ = [
    "AircraftKalmanTracker",
    "EnhancedAircraftKalmanTracker",
    "EnhancedMultiTargetTracker",
    "TrajectoryVisualizer",
]
