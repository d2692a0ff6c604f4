"""Data pipeline: YOLO-format datasets, host-side augmentation, batch building,
and dataset tooling (converters, splitters, auto-annotation)."""

from yolo_tpu.data.dataset import YOLODataset, check_det_dataset
from yolo_tpu.data.build import build_dataloader, build_yolo_dataset
from yolo_tpu.data.converter import (
    coco80_to_coco91_class,
    coco91_to_coco80_class,
    convert_coco,
    convert_dota_to_yolo_obb,
    convert_segment_masks_to_yolo_seg,
    merge_multi_segment,
    yolo_bbox2segment,
)
from yolo_tpu.data.split import autosplit, img2label_paths, split_classify_dataset

__all__ = [
    "YOLODataset", "check_det_dataset", "build_dataloader", "build_yolo_dataset",
    "convert_coco", "convert_segment_masks_to_yolo_seg", "convert_dota_to_yolo_obb",
    "coco91_to_coco80_class", "coco80_to_coco91_class", "merge_multi_segment",
    "yolo_bbox2segment", "autosplit", "split_classify_dataset", "img2label_paths",
]
