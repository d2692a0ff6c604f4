"""Fused on-device pipelines (detect+track scan)."""

from yolo_tpu.pipeline.fused import FusedDetectTrack

__all__ = ["FusedDetectTrack"]
