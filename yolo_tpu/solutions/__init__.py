"""Solutions: demo applications over predict/track (ref: ultralytics/solutions/).

The reference ships ~20 demo apps on one BaseSolution; all are provided over
the TPU predict/track stack. similarity_search runs on the in-repo JAX CLIP
towers (numpy cosine index instead of FAISS); the streamlit UI is replaced by
a stdlib MJPEG web view (web_inference.WebInference).
"""

from yolo_tpu.solutions.solutions import BaseSolution
from yolo_tpu.solutions.object_counter import ObjectCounter
from yolo_tpu.solutions.heatmap import Heatmap
from yolo_tpu.solutions.speed_estimator import SpeedEstimator
from yolo_tpu.solutions.queue_manager import QueueManager
from yolo_tpu.solutions.region_counter import RegionCounter
from yolo_tpu.solutions.similarity_search import VisualAISearch
from yolo_tpu.solutions.web_inference import WebInference
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
    "VisualAISearch", "WebInference",
]
