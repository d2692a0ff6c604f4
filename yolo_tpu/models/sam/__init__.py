"""Segment Anything Model, functional JAX (ref: ultralytics/models/sam/)."""

from yolo_tpu.models.sam.build import build_sam_vit_b, build_sam_vit_h, build_sam_vit_l
from yolo_tpu.models.sam.model import SAM
from yolo_tpu.models.sam.predict import SAMPredictor
from yolo_tpu.models.sam.video import SAM2VideoPredictor

__all__ = ["SAM", "SAMPredictor", "SAM2VideoPredictor", "build_sam_vit_b", "build_sam_vit_l", "build_sam_vit_h"]
