"""Model family facades beyond the core YOLO class (ref: ultralytics/models/)."""

from yolo_tpu.models.fastsam import FastSAM, FastSAMPredictor
from yolo_tpu.models.sam import SAM, SAMPredictor

__all__ = ["FastSAM", "FastSAMPredictor", "SAM", "SAMPredictor"]
