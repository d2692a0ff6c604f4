"""Model family facades beyond the core YOLO class (ref: ultralytics/models/)."""

from yolo_tpu.models.fastsam import FastSAM, FastSAMPredictor

__all__ = ["FastSAM", "FastSAMPredictor"]
