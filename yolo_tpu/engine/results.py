"""Inference result containers (ref: ultralytics/engine/results.py Results:192, Boxes:855).

Host-side, numpy-backed: the device pipeline hands back fixed-shape arrays; these
classes trim padding and expose the reference's `.boxes.xyxy/conf/cls/id` API that
the fork's Kalman pipeline consumes (ref: kalman/aircraft_detection_tracking.py:99-106).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class Boxes:
    """Detection boxes with xyxy/conf/cls (+ optional track id) views."""

    def __init__(self, data: np.ndarray, orig_shape):
        # data: (N, 6) [x1,y1,x2,y2,conf,cls] or (N, 7) [..., track_id] (id before conf, like reference)
        data = np.asarray(data, dtype=np.float32).reshape(-1, data.shape[-1] if data.ndim > 1 else 6)
        assert data.shape[-1] in (6, 7)
        self.data = data
        self.orig_shape = orig_shape
        self.is_track = data.shape[-1] == 7

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Boxes(self.data[idx], self.orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, 4] if self.is_track else None

    @property
    def xywh(self):
        from yolo_tpu.ops.boxes import xyxy2xywh

        return xyxy2xywh(self.xyxy)

    @property
    def xyxyn(self):
        b = self.xyxy.copy()
        b[:, [0, 2]] /= self.orig_shape[1]
        b[:, [1, 3]] /= self.orig_shape[0]
        return b

    @property
    def xywhn(self):
        from yolo_tpu.ops.boxes import xyxy2xywh

        b = xyxy2xywh(self.xyxy)
        b[:, [0, 2]] /= self.orig_shape[1]
        b[:, [1, 3]] /= self.orig_shape[0]
        return b

    def cpu(self):
        return self

    def numpy(self):
        return self


class Results:
    """Single-image inference result (detection subset of the reference Results)."""

    def __init__(self, orig_img: np.ndarray, path: str, names: dict, boxes: np.ndarray | None = None, speed: dict | None = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None and len(boxes) else Boxes(np.zeros((0, 6), np.float32), self.orig_shape)
        self.speed = speed or {"preprocess": None, "inference": None, "postprocess": None}
        self.save_dir = None

    def __len__(self):
        return len(self.boxes)

    def __getitem__(self, idx):
        sel = idx if isinstance(idx, (slice, list, np.ndarray)) else [idx]
        r = Results(self.orig_img, self.path, self.names, boxes=self.boxes.data[sel])
        if getattr(self, "masks", None) is not None:
            r.masks = Masks(np.asarray(self.masks.data)[sel], self.orig_shape)
        if getattr(self, "keypoints", None) is not None:
            r.keypoints = Keypoints(np.asarray(self.keypoints.data)[sel], self.orig_shape)
        r.speed = self.speed
        return r

    def new(self, boxes: np.ndarray | None = None):
        return Results(self.orig_img, self.path, self.names, boxes=boxes, speed=self.speed)

    def update(self, boxes: np.ndarray | None = None):
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)

    def plot(self, conf: bool = True, line_width: int | None = None, labels: bool = True, img: np.ndarray | None = None):
        """Draw boxes on the image (BGR). Minimal reference-style annotator."""
        import cv2

        im = (img if img is not None else self.orig_img).copy()
        if im.ndim == 2:
            im = cv2.cvtColor(im, cv2.COLOR_GRAY2BGR)
        lw = line_width or max(round(sum(im.shape[:2]) / 2 * 0.003), 2)
        for row in self.boxes.data:
            x1, y1, x2, y2 = map(int, row[:4])
            c, conf_v = int(row[-1]), float(row[-2])
            color = (56, 56, 255)
            cv2.rectangle(im, (x1, y1), (x2, y2), color, lw)
            if labels:
                name = self.names.get(c, str(c))
                label = f"{name} {conf_v:.2f}" if conf else name
                cv2.putText(im, label, (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX, lw / 6, color, max(lw - 1, 1))
        return im

    def save(self, filename: str | None = None):
        import cv2

        filename = filename or f"results_{Path(self.path).name or 'image.jpg'}"
        from yolo_tpu.utils.files import imwrite
        imwrite(str(filename), self.plot())
        return filename

    def save_txt(self, txt_file, save_conf: bool = False):
        """Save detections in YOLO txt format (normalized xywh)."""
        lines = []
        for row in self.boxes.data:
            from yolo_tpu.ops.boxes import xyxy2xywhn

            xywhn = xyxy2xywhn(row[None, :4], w=self.orig_shape[1], h=self.orig_shape[0])[0]
            vals = [int(row[-1]), *xywhn.tolist()] + ([float(row[-2])] if save_conf else [])
            lines.append(" ".join(f"{v:.6g}" if isinstance(v, float) else str(v) for v in vals))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        with open(txt_file, "a", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))

    def summary(self, normalize: bool = False, decimals: int = 5):
        out = []
        for row in self.boxes.data:
            b = row[:4] / np.array([self.orig_shape[1], self.orig_shape[0]] * 2) if normalize else row[:4]
            out.append(
                {
                    "name": self.names.get(int(row[-1]), str(int(row[-1]))),
                    "class": int(row[-1]),
                    "confidence": round(float(row[-2]), decimals),
                    "box": {k: round(float(v), decimals) for k, v in zip("x1 y1 x2 y2".split(), b)},
                }
            )
        return out

    def to_json(self, normalize: bool = False):
        import json

        return json.dumps(self.summary(normalize=normalize), indent=2)


class Masks:
    """Instance masks container (ref: engine/results.py Masks:1074)."""

    def __init__(self, masks: np.ndarray, orig_shape):
        # masks: (N, H, W) float/bool in original-image resolution
        self.data = np.asarray(masks)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Masks(self.data[idx], self.orig_shape)

    @property
    def xy(self):
        """Mask contours as pixel-coordinate polygons (list of (K, 2) arrays)."""
        import cv2

        polys = []
        for m in self.data:
            cnts, _ = cv2.findContours((m > 0.5).astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            polys.append(max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32) if cnts else np.zeros((0, 2), np.float32))
        return polys

    @property
    def xyn(self):
        h, w = self.orig_shape
        return [p / np.array([w, h], np.float32) for p in self.xy]

    def cpu(self):
        return self

    def numpy(self):
        return self


class Keypoints:
    """Keypoints container (ref: engine/results.py Keypoints:1172).

    data: (N, nkpt, 2|3) — x, y [, visibility] in original-image pixels.
    """

    def __init__(self, keypoints: np.ndarray, orig_shape):
        self.data = np.asarray(keypoints, np.float32)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Keypoints(self.data[idx], self.orig_shape)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.xy / np.array([w, h], np.float32)

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None

    def cpu(self):
        return self

    def numpy(self):
        return self


class Probs:
    """Classification probabilities (ref: engine/results.py Probs:1293)."""

    def __init__(self, probs: np.ndarray):
        self.data = np.asarray(probs, np.float32)

    @property
    def top1(self) -> int:
        return int(np.argmax(self.data))

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self) -> float:
        return float(self.data[self.top1])

    @property
    def top5conf(self):
        return self.data[self.top5]

    def cpu(self):
        return self

    def numpy(self):
        return self


class OBBoxes:
    """Oriented boxes container (ref: engine/results.py OBB:1434).

    data: (N, 7) [cx, cy, w, h, angle, conf, cls] — angle in radians.
    """

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32).reshape(-1, 7)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self):
        """Corner representation (N, 4, 2)."""
        cx, cy, w, h, a = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(a), np.sin(a)
        dx = np.stack([w / 2, w / 2, -w / 2, -w / 2], -1)
        dy = np.stack([h / 2, -h / 2, -h / 2, h / 2], -1)
        x = cx[:, None] + dx * cos[:, None] - dy * sin[:, None]
        y = cy[:, None] + dx * sin[:, None] + dy * cos[:, None]
        return np.stack([x, y], -1)

    @property
    def xyxy(self):
        """Axis-aligned envelope of the rotated box."""
        c = self.xyxyxyxy
        return np.concatenate([c.min(1), c.max(1)], -1)

    def cpu(self):
        return self

    def numpy(self):
        return self
