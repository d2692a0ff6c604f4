"""Solutions: demo applications over predict/track (ref: ultralytics/solutions/).

The reference ships ~20 demo apps on one BaseSolution; all the vision-only ones
are provided here over the TPU predict/track stack (streamlit_inference needs a
streamlit UI and similarity_search needs CLIP+faiss — both out of scope for a
zero-egress TPU host).
"""

from yolo_tpu.solutions.solutions import BaseSolution
from yolo_tpu.solutions.object_counter import ObjectCounter
from yolo_tpu.solutions.heatmap import Heatmap
from yolo_tpu.solutions.speed_estimator import SpeedEstimator
from yolo_tpu.solutions.queue_manager import QueueManager, RegionCounter
from yolo_tpu.solutions.apps import (
    AIGym,
    Analytics,
    DistanceCalculation,
    InstanceSegmentation,
    ObjectBlurrer,
    ObjectCropper,
    ParkingManagement,
    SecurityAlarm,
    TrackZone,
    VisionEye,
)

__all__ = [
    "BaseSolution", "ObjectCounter", "Heatmap", "SpeedEstimator", "QueueManager", "RegionCounter",
    "AIGym", "Analytics", "DistanceCalculation", "InstanceSegmentation", "ObjectBlurrer",
    "ObjectCropper", "ParkingManagement", "SecurityAlarm", "TrackZone", "VisionEye",
]
