"""Data pipeline: YOLO-format datasets, host-side augmentation, batch building."""

from yolo_tpu.data.dataset import YOLODataset, check_det_dataset
from yolo_tpu.data.build import build_dataloader, build_yolo_dataset

__all__ = ["YOLODataset", "check_det_dataset", "build_dataloader", "build_yolo_dataset"]
