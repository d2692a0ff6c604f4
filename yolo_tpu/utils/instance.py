"""Vectorized label containers for the augmentation pipeline
(ref: ultralytics/utils/instance.py Bboxes:35, Instances:188)."""

from __future__ import annotations

import numpy as np

from yolo_tpu.ops.boxes import ltwh2xyxy, xywh2xyxy, xyxy2ltwh, xyxy2xywh

_FORMATS = ("xyxy", "xywh", "ltwh")


class Bboxes:
    """Boxes in one of xyxy / xywh / ltwh formats with vectorized conversion."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"format must be one of {_FORMATS}"
        bboxes = bboxes[None, :] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes.astype(np.float32)
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        if self.format == format:
            return
        via = {"xyxy": {"xywh": xyxy2xywh, "ltwh": xyxy2ltwh}, "xywh": {"xyxy": xywh2xyxy}, "ltwh": {"xyxy": ltwh2xyxy}}
        if format in via.get(self.format, {}):
            self.bboxes = np.asarray(via[self.format][format](self.bboxes), np.float32)
        else:  # two hops through xyxy
            self.convert("xyxy")
            self.convert(format)
            return
        self.format = format

    def areas(self) -> np.ndarray:
        fmt = self.format
        self.convert("xyxy")
        a = (self.bboxes[:, 2] - self.bboxes[:, 0]) * (self.bboxes[:, 3] - self.bboxes[:, 1])
        self.convert(fmt)
        return a

    def mul(self, scale):
        """Scale by (sx, sy, sx2, sy2) or a scalar."""
        scale = (scale,) * 4 if isinstance(scale, (int, float)) else scale
        self.bboxes = self.bboxes * np.asarray(scale, np.float32)

    def add(self, offset):
        offset = (offset,) * 4 if isinstance(offset, (int, float)) else offset
        self.bboxes = self.bboxes + np.asarray(offset, np.float32)

    def __len__(self):
        return len(self.bboxes)

    def __getitem__(self, idx):
        return Bboxes(self.bboxes[idx].reshape(-1, 4), self.format)

    @classmethod
    def concatenate(cls, boxes_list, axis: int = 0):
        assert boxes_list
        fmt = boxes_list[0].format
        for b in boxes_list:
            b.convert(fmt)
        return cls(np.concatenate([b.bboxes for b in boxes_list], axis=axis), fmt)


class Instances:
    """Boxes (+ optional segments/keypoints) moving together through augments."""

    def __init__(self, bboxes, segments=None, keypoints=None, bbox_format: str = "xywh", normalized: bool = True):
        self._bboxes = Bboxes(bboxes, bbox_format)
        self.segments = segments if segments is not None else np.zeros((len(self._bboxes), 0, 2), np.float32)
        self.keypoints = keypoints
        self.normalized = normalized

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    def convert_bbox(self, format: str):
        self._bboxes.convert(format)

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def scale(self, sx: float, sy: float, bbox_only: bool = False):
        self._bboxes.mul((sx, sy, sx, sy))
        if not bbox_only:
            if len(self.segments):
                self.segments[..., 0] *= sx
                self.segments[..., 1] *= sy
            if self.keypoints is not None:
                self.keypoints[..., 0] *= sx
                self.keypoints[..., 1] *= sy

    def denormalize(self, w: int, h: int):
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w: int, h: int):
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw: float, padh: float):
        assert not self.normalized, "pad in pixel space"
        self._bboxes.add((padw, padh, padw, padh))
        if len(self.segments):
            self.segments[..., 0] += padw
            self.segments[..., 1] += padh
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def flipud(self, h: int):
        """Vertical flip of boxes AND segments/keypoints (ref: instance.py
        Instances.flipud — the label groups must move together)."""
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        y1 = self.bboxes[:, 1].copy()
        y2 = self.bboxes[:, 3].copy()
        self._bboxes.bboxes[:, 1] = h - y2
        self._bboxes.bboxes[:, 3] = h - y1
        self.convert_bbox(fmt)
        if len(self.segments):
            self.segments[..., 1] = h - self.segments[..., 1]
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def fliplr(self, w: int):
        """Horizontal flip of boxes AND segments/keypoints (ref: fliplr)."""
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        x1 = self.bboxes[:, 0].copy()
        x2 = self.bboxes[:, 2].copy()
        self._bboxes.bboxes[:, 0] = w - x2
        self._bboxes.bboxes[:, 2] = w - x1
        self.convert_bbox(fmt)
        if len(self.segments):
            self.segments[..., 0] = w - self.segments[..., 0]
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def clip(self, w: int, h: int):
        """Clip boxes and segments into the image; keypoints outside are
        zeroed with visibility cleared when a 3rd channel exists (ref: clip)."""
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        self._bboxes.bboxes[:, [0, 2]] = self.bboxes[:, [0, 2]].clip(0, w)
        self._bboxes.bboxes[:, [1, 3]] = self.bboxes[:, [1, 3]].clip(0, h)
        self.convert_bbox(fmt)
        if len(self.segments):
            self.segments[..., 0] = self.segments[..., 0].clip(0, w)
            self.segments[..., 1] = self.segments[..., 1].clip(0, h)
        if self.keypoints is not None:
            out = (
                (self.keypoints[..., 0] < 0)
                | (self.keypoints[..., 0] > w)
                | (self.keypoints[..., 1] < 0)
                | (self.keypoints[..., 1] > h)
            )
            if self.keypoints.shape[-1] == 3:
                self.keypoints[..., 2] = np.where(out, 0.0, self.keypoints[..., 2])
            self.keypoints[..., 0] = self.keypoints[..., 0].clip(0, w)
            self.keypoints[..., 1] = self.keypoints[..., 1].clip(0, h)

    def remove_zero_area_boxes(self):
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
            if len(self.segments):
                self.segments = self.segments[good]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def __len__(self):
        return len(self._bboxes)

    def __getitem__(self, idx):
        return Instances(
            self.bboxes[idx].reshape(-1, 4),
            self.segments[idx] if len(self.segments) else None,
            self.keypoints[idx] if self.keypoints is not None else None,
            bbox_format=self._bboxes.format,
            normalized=self.normalized,
        )
