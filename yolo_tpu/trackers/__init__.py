"""Multi-object trackers (MOT): ByteTrack, BoT-SORT + Kalman/matching/GMC utils.

Re-implements the reference tracker layer (ref: ultralytics/trackers/) with the
same two-stage association semantics. Host-side numpy — per-frame track counts
are tiny; the device budget belongs to detection. The fork's own Kalman stack
lives separately in yolo_tpu.kalman (the two stacks are deliberately decoupled,
see SURVEY §1 note).
"""

from yolo_tpu.trackers.byte_tracker import BYTETracker, STrack
from yolo_tpu.trackers.bot_sort import BOTSORT, BOTrack
from yolo_tpu.trackers.kalman_filter import KalmanFilterXYAH, KalmanFilterXYWH

__all__ = ["BYTETracker", "STrack", "BOTSORT", "BOTrack", "KalmanFilterXYAH", "KalmanFilterXYWH"]
