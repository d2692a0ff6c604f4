"""Solutions: demo applications over predict/track (ref: ultralytics/solutions/).

The reference ships ~20 demo apps on one BaseSolution; we provide the base plus
the most-used trio (object counting, heatmaps, speed estimation) wired to the
TPU predict/track stack. Additional apps drop in as subclasses.
"""

from yolo_tpu.solutions.solutions import BaseSolution
from yolo_tpu.solutions.object_counter import ObjectCounter
from yolo_tpu.solutions.heatmap import Heatmap
from yolo_tpu.solutions.speed_estimator import SpeedEstimator
from yolo_tpu.solutions.queue_manager import QueueManager, RegionCounter

__all__ = ["BaseSolution", "ObjectCounter", "Heatmap", "SpeedEstimator", "QueueManager", "RegionCounter"]
