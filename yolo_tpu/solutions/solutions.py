"""BaseSolution: shared model/track plumbing for demo apps (ref: solutions/solutions.py)."""

from __future__ import annotations

import numpy as np



class BaseSolution:
    """Holds a YOLO model + persistent tracker and extracts per-frame tracks."""

    def __init__(self, model="yolov8n.yaml", region=None, classes=None, conf: float = 0.25, iou: float = 0.7, imgsz: int = 640, show: bool = False, **kwargs):
        from yolo_tpu import YOLO
        from yolo_tpu.solutions.config import SolutionConfig

        # typed config: unknown kwargs raise instead of being swallowed
        # (ref: solutions/config.py SolutionConfig.update)
        self.cfg = SolutionConfig().update(
            region=region, classes=classes, conf=conf, iou=iou, imgsz=imgsz, show=show,
            **({"model": model} if isinstance(model, str) else {}), **kwargs,
        )
        self.model = YOLO(model) if isinstance(model, str) else model
        self.names = self.model.names
        self.region = region  # list of (x, y) points
        self.classes = classes
        self.conf, self.iou, self.imgsz = conf, iou, imgsz
        self.show = show
        self.track_history: dict[int, list] = {}
        self.boxes = np.zeros((0, 4), np.float32)
        self.track_ids: list[int] = []
        self.clss: list[int] = []
        self.confs: list[float] = []

    def extract_tracks(self, im0: np.ndarray):
        """Run track() on the frame and unpack boxes/ids/classes."""
        results = self.model.track(
            im0, persist=True, conf=self.conf, iou=self.iou, imgsz=self.imgsz, classes=self.classes, verbose=False
        )
        r = results[0]
        if len(r.boxes) and r.boxes.id is not None:
            self.boxes = r.boxes.xyxy
            self.track_ids = [int(i) for i in r.boxes.id]
            self.clss = [int(c) for c in r.boxes.cls]
            self.confs = [float(c) for c in r.boxes.conf]
        else:
            self.boxes = np.zeros((0, 4), np.float32)
            self.track_ids, self.clss, self.confs = [], [], []
        return r

    def store_tracking_history(self, track_id: int, box):
        """Append box center to the per-track history (30-point window)."""
        cx, cy = float((box[0] + box[2]) / 2), float((box[1] + box[3]) / 2)
        hist = self.track_history.setdefault(track_id, [])
        hist.append((cx, cy))
        if len(hist) > 30:
            hist.pop(0)

    def display_output(self, im0):
        if self.show:
            import cv2

            cv2.imshow(type(self).__name__, im0)
            cv2.waitKey(1)
        return im0

    def __call__(self, im0, *args, **kwargs):
        return self.process(im0, *args, **kwargs)

    def process(self, im0):
        raise NotImplementedError
