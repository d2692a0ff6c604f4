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
        if len(self.boxes):
            return len(self.boxes)
        obb = getattr(self, "obb", None)
        return len(obb) if obb is not None else 0

    def __getitem__(self, idx):
        sel = idx if isinstance(idx, (slice, list, np.ndarray)) else [idx]
        r = Results(self.orig_img, self.path, self.names, boxes=self.boxes.data[sel] if len(self.boxes) else None)
        if getattr(self, "masks", None) is not None:
            r.masks = Masks(np.asarray(self.masks.data)[sel], self.orig_shape)
        if getattr(self, "keypoints", None) is not None:
            r.keypoints = Keypoints(np.asarray(self.keypoints.data)[sel], self.orig_shape)
        if getattr(self, "obb", None) is not None:
            r.obb = self.obb[sel]
        r.speed = self.speed
        return r

    def new(self, boxes: np.ndarray | None = None):
        return Results(self.orig_img, self.path, self.names, boxes=boxes, speed=self.speed)

    def update(self, boxes: np.ndarray | None = None, obb: np.ndarray | None = None):
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        if obb is not None:
            self.obb = OBBoxes(obb, self.orig_shape)

    def plot(
        self,
        conf: bool = True,
        line_width: int | None = None,
        labels: bool = True,
        boxes: bool = True,
        masks: bool = True,
        probs: bool = True,
        kpt_radius: int = 5,
        kpt_line: bool = True,
        img: np.ndarray | None = None,
    ):
        """Draw detections on the image (BGR): boxes (per-class reference
        palette), alpha-blended instance masks, keypoints + skeleton, rotated
        OBB quads, classify top-5 text (ref: engine/results.py Results.plot)."""
        import cv2

        from yolo_tpu.utils.plotting import Annotator, color_for

        im = (img if img is not None else self.orig_img).copy()
        if im.ndim == 2:
            im = cv2.cvtColor(im, cv2.COLOR_GRAY2BGR)
        ann = Annotator(im, line_width=line_width)

        def _label(c, conf_v, tid=None):
            name = self.names.get(int(c), str(int(c)))
            if tid is not None:
                name = f"id:{int(tid)} {name}"
            return (f"{name} {conf_v:.2f}" if conf else name) if labels else ""

        pr = getattr(self, "probs", None)
        if pr is not None and probs:  # classify: top-5 text block (ref :~700)
            text = "\n".join(f"{self.names.get(j, j)} {pr.data[j]:.2f}" for j in pr.top5)
            for k, line in enumerate(text.split("\n")):
                ann.text((8, 8 + k * (ann.lw * 12)), line, box_color=(64, 64, 64))
            return ann.result()

        obb = getattr(self, "obb", None)
        if obb is not None and len(obb) and boxes:
            for j, corners in enumerate(np.asarray(obb.xyxyxyxy)):
                c = int(obb.cls[j])
                col = color_for(c)
                cv2.polylines(ann.im, [corners.astype(np.int32).reshape(-1, 1, 2)], True, col, ann.lw, cv2.LINE_AA)
                lab = _label(c, float(obb.conf[j]), obb.id[j] if obb.is_track else None)
                if lab:
                    x1, y1 = corners.min(0)
                    ann.text((int(x1), int(max(y1 - 4, 12))), lab, box_color=col)
            return ann.result()

        mk = getattr(self, "masks", None)
        if mk is not None and masks and len(mk.data):
            cols = [color_for(int(c)) for c in self.boxes.cls] if len(self.boxes) else [color_for(j) for j in range(len(mk.data))]
            ann.masks(mk.data, cols)
        if boxes:
            for row in self.boxes.data:
                c = int(row[-1])
                tid = row[4] if self.boxes.is_track else None
                ann.box_label(row[:4], _label(c, float(row[-2]), tid), color=color_for(c))
        kp = getattr(self, "keypoints", None)
        if kp is not None:
            for k in np.asarray(kp.data):
                ann.kpts(k, radius=kpt_radius, kpt_line=kpt_line)
        return ann.result()

    def verbose(self) -> str:
        """Per-image log fragment, reference format (ref Results.verbose:~560):
        '384x640 2 persons, 1 dog, ' / top-1 for classify / '(no detections), '."""
        pr = getattr(self, "probs", None)
        if pr is not None:
            return f"{self.names.get(pr.top1, pr.top1)} {pr.top1conf:.2f}, "
        obb = getattr(self, "obb", None)
        data = obb if obb is not None and len(self.boxes) == 0 else self.boxes
        h, w = self.orig_shape
        if not len(data):
            return f"{h}x{w} (no detections), "
        cls = np.asarray(data.cls).astype(int)
        parts = []
        for c in sorted(set(cls.tolist())):
            n = int((cls == c).sum())
            name = self.names.get(c, str(c))
            parts.append(f"{n} {name}{'s' if n > 1 else ''}")
        return f"{h}x{w} " + ", ".join(parts) + ", "

    def save(self, filename: str | None = None):
        import cv2

        filename = filename or f"results_{Path(self.path).name or 'image.jpg'}"
        from yolo_tpu.utils.files import imwrite
        imwrite(str(filename), self.plot())
        return filename

    def save_txt(self, txt_file, save_conf: bool = False):
        """Save detections in YOLO txt format (normalized xywh; OBB results
        write normalized 8-coord corners, ref Results.save_txt obb branch;
        classify writes top-5 `conf name` lines)."""
        lines = []
        pr = getattr(self, "probs", None)
        if pr is not None:
            lines = [f"{pr.data[j]:.2f} {self.names.get(j, j)}" for j in pr.top5]
        obb = getattr(self, "obb", None)
        if obb is not None and len(obb):
            H, W = self.orig_shape
            corners = np.asarray(obb.xyxyxyxy) / np.array([W, H], np.float32)
            for j, c8 in enumerate(corners.reshape(len(obb), 8)):
                vals = [int(obb.cls[j]), *c8.tolist()] + ([float(obb.conf[j])] if save_conf else [])
                lines.append(" ".join(f"{v:.6g}" if isinstance(v, float) else str(v) for v in vals))
        for row in self.boxes.data:
            from yolo_tpu.ops.boxes import xyxy2xywhn

            xywhn = xyxy2xywhn(row[None, :4], w=self.orig_shape[1], h=self.orig_shape[0])[0]
            vals = [int(row[-1]), *xywhn.tolist()] + ([float(row[-2])] if save_conf else [])
            lines.append(" ".join(f"{v:.6g}" if isinstance(v, float) else str(v) for v in vals))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        with open(txt_file, "a", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))

    def summary(self, normalize: bool = False, decimals: int = 5):
        """Per-detection dicts (ref: Results.summary:788): classify returns
        the top class; obb returns 8-corner boxes; masks add polygon segments
        and pose adds keypoints; track ids ride along when present."""
        out = []
        pr = getattr(self, "probs", None)
        if pr is not None:
            return [
                {
                    "name": self.names.get(pr.top1, str(pr.top1)),
                    "class": pr.top1,
                    "confidence": round(pr.top1conf, decimals),
                }
            ]
        h, w = self.orig_shape if normalize else (1, 1)
        obb = getattr(self, "obb", None)
        data = obb if obb is not None and len(self.boxes) == 0 and len(obb) else self.boxes
        is_obb = data is obb
        mk = getattr(self, "masks", None)
        kp = getattr(self, "keypoints", None)
        for i in range(len(data)):
            corners = (
                np.asarray(obb.xyxyxyxy[i]) if is_obb else np.asarray(self.boxes.xyxy[i]).reshape(-1, 2)
            )
            xy = {}
            for j, (bx, by) in enumerate(corners):
                xy[f"x{j + 1}"] = round(float(bx) / w, decimals)
                xy[f"y{j + 1}"] = round(float(by) / h, decimals)
            c = int(data.cls[i])
            res = {
                "name": self.names.get(c, str(c)),
                "class": c,
                "confidence": round(float(data.conf[i]), decimals),
                "box": xy,
            }
            if data.is_track:
                res["track_id"] = int(data.id[i])
            if mk is not None and i < len(mk.data):
                poly = mk.xy[i]
                res["segments"] = {
                    "x": (poly[:, 0] / w).round(decimals).tolist(),
                    "y": (poly[:, 1] / h).round(decimals).tolist(),
                }
            if kp is not None and i < len(kp.data):
                k = np.asarray(kp.data[i], np.float64)
                res["keypoints"] = {
                    "x": (k[:, 0] / w).round(decimals).tolist(),
                    "y": (k[:, 1] / h).round(decimals).tolist(),
                    "visible": k[:, 2].round(decimals).tolist() if k.shape[-1] == 3 else [1.0] * len(k),
                }
            out.append(res)
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

    data: (N, 7) [cx, cy, w, h, angle, conf, cls] — angle in radians — or
    (N, 8) with a track id before conf (like Boxes).
    """

    def __init__(self, data: np.ndarray, orig_shape):
        data = np.asarray(data, np.float32)
        self.data = data.reshape(-1, data.shape[-1] if data.ndim > 1 else 7)
        assert self.data.shape[-1] in (7, 8)
        self.is_track = self.data.shape[-1] == 8
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return OBBoxes(self.data[idx], self.orig_shape)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, 5] if self.is_track else None

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
