"""Additional solution apps (ref: ultralytics/solutions/ — ai_gym.py AIGym,
distance_calculation.py DistanceCalculation, trackzone.py TrackZone,
vision_eye.py VisionEye, object_blurrer.py ObjectBlurrer,
object_cropper.py ObjectCropper, instance_segmentation.py InstanceSegmentation,
analytics.py Analytics, parking_management.py ParkingManagement,
security_alarm.py SecurityAlarm).

Each app follows the BaseSolution pattern: extract tracks (or predictions) per
frame, update app state, annotate, return the frame. Heavy external surfaces
(GUI windows, SMTP, matplotlib) degrade gracefully when unavailable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from yolo_tpu.solutions.solutions import BaseSolution


class AIGym(BaseSolution):
    """Workout rep counting from pose keypoints (ref: ai_gym.py AIGym)."""

    def __init__(self, *args, kpts=(6, 8, 10), up_angle: float = 145.0, down_angle: float = 90.0, **kwargs):
        kwargs.setdefault("model", "yolov8n-pose.yaml")
        super().__init__(*args, **kwargs)
        self.kpts = list(kpts)
        self.up_angle, self.down_angle = float(up_angle), float(down_angle)
        self.states: dict[int, dict] = {}

    @staticmethod
    def estimate_pose_angle(a, b, c) -> float:
        """Angle at b formed by points a-b-c, degrees in [0, 180]."""
        a, b, c = (np.asarray(p, np.float32)[:2] for p in (a, b, c))
        ang = np.degrees(np.arctan2(c[1] - b[1], c[0] - b[0]) - np.arctan2(a[1] - b[1], a[0] - b[0]))
        ang = abs(ang)
        return 360 - ang if ang > 180 else float(ang)

    def process(self, im0):
        r = self.extract_tracks(im0)
        kdata = getattr(r, "keypoints", None)
        if kdata is not None and len(self.track_ids):
            kp = np.asarray(kdata.data)
            for i, tid in enumerate(self.track_ids):
                st = self.states.setdefault(tid, {"angle": 0.0, "count": 0, "stage": "-"})
                pts = [kp[i][int(j)] for j in self.kpts]
                st["angle"] = self.estimate_pose_angle(*pts)
                if st["angle"] < self.down_angle:
                    if st["stage"] == "up":
                        st["count"] += 1
                    st["stage"] = "down"
                elif st["angle"] > self.up_angle:
                    st["stage"] = "up"
        return self.display_output(im0)

    @property
    def workout_counts(self):
        return {tid: st["count"] for tid, st in self.states.items()}


class DistanceCalculation(BaseSolution):
    """Pixel-centroid distance between two selected tracks (ref: distance_calculation.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.selected_boxes: dict[int, np.ndarray] = {}
        self.pixels_distance = 0.0

    def select(self, track_id: int):
        """Programmatic stand-in for the reference's mouse selection."""
        for box, tid in zip(self.boxes, self.track_ids):
            if tid == track_id:
                self.selected_boxes[track_id] = np.asarray(box)
        if len(self.selected_boxes) > 2:
            self.selected_boxes.pop(next(iter(self.selected_boxes)))

    def process(self, im0):
        self.extract_tracks(im0)
        for box, tid in zip(self.boxes, self.track_ids):
            if tid in self.selected_boxes:  # refresh selected boxes with new positions
                self.selected_boxes[tid] = np.asarray(box)
        if len(self.selected_boxes) == 2:
            c = [((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in self.selected_boxes.values()]
            self.pixels_distance = float(np.hypot(c[0][0] - c[1][0], c[0][1] - c[1][1]))
        return self.display_output(im0)


class TrackZone(BaseSolution):
    """Track only inside a polygon zone (ref: trackzone.py TrackZone)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._mask = None

    def process(self, im0):
        import cv2

        region = np.asarray(self.region or [(75, 75), (565, 75), (565, 285), (75, 285)], np.int32)
        if self._mask is None or self._mask.shape != im0.shape[:2]:
            self._mask = np.zeros(im0.shape[:2], np.uint8)
            cv2.fillPoly(self._mask, [cv2.convexHull(region)], 255)
        masked = cv2.bitwise_and(im0, im0, mask=self._mask)
        self.extract_tracks(masked)
        cv2.polylines(im0, [cv2.convexHull(region)], True, (255, 255, 255), 2)
        return self.display_output(im0)


class VisionEye(BaseSolution):
    """Draw sight-lines from a vision point to every tracked centroid (ref: vision_eye.py)."""

    def __init__(self, *args, vision_point=(20, 20), **kwargs):
        super().__init__(*args, **kwargs)
        self.vision_point = tuple(vision_point)

    def process(self, im0):
        import cv2

        self.extract_tracks(im0)
        for box in self.boxes:
            cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
            cv2.circle(im0, (cx, cy), 4, (0, 255, 0), -1)
            cv2.line(im0, self.vision_point, (cx, cy), (0, 200, 255), 1)
        return self.display_output(im0)


class ObjectBlurrer(BaseSolution):
    """Gaussian-blur detected regions (ref: object_blurrer.py ObjectBlurrer)."""

    def __init__(self, *args, blur_ratio: float = 0.5, **kwargs):
        super().__init__(*args, **kwargs)
        self.blur_ratio = max(int(blur_ratio * 100), 3)

    def process(self, im0):
        import cv2

        self.extract_tracks(im0)
        k = self.blur_ratio | 1  # odd kernel
        for box in self.boxes:
            x1, y1, x2, y2 = (int(v) for v in box)
            x1, y1 = max(x1, 0), max(y1, 0)
            if x2 > x1 and y2 > y1:
                im0[y1:y2, x1:x2] = cv2.blur(im0[y1:y2, x1:x2], (k, k))
        return self.display_output(im0)


class ObjectCropper(BaseSolution):
    """Save a crop per detection (ref: object_cropper.py ObjectCropper)."""

    def __init__(self, *args, crop_dir: str = "cropped-detections", **kwargs):
        kwargs["show"] = False
        super().__init__(*args, **kwargs)
        self.crop_dir = Path(crop_dir)
        self.crop_dir.mkdir(parents=True, exist_ok=True)
        self.crop_idx = 0

    def process(self, im0):
        import cv2

        r = self.model.predict(im0, conf=self.conf, iou=self.iou, imgsz=self.imgsz, classes=self.classes, verbose=False)[0]
        for box in np.asarray(r.boxes.xyxy):
            x1, y1, x2, y2 = (int(v) for v in box)
            x1, y1 = max(x1, 0), max(y1, 0)
            if x2 > x1 and y2 > y1:
                self.crop_idx += 1
                cv2.imwrite(str(self.crop_dir / f"crop_{self.crop_idx}.jpg"), im0[y1:y2, x1:x2])
        return im0


class InstanceSegmentation(BaseSolution):
    """Overlay instance masks (ref: instance_segmentation.py InstanceSegmentation)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("model", "yolov8n-seg.yaml")
        super().__init__(*args, **kwargs)

    def process(self, im0):
        r = self.extract_tracks(im0)
        masks = getattr(r, "masks", None)
        if masks is not None and len(masks):
            data = np.asarray(masks.data)
            rng = np.random.default_rng(0)
            for m in data:
                color = rng.integers(64, 255, 3)
                im0[m.astype(bool)] = (im0[m.astype(bool)] * 0.5 + color * 0.5).astype(np.uint8)
        return self.display_output(im0)


class Analytics(BaseSolution):
    """Per-frame class-count analytics with optional chart rendering
    (ref: analytics.py Analytics — line/bar/pie/area over matplotlib)."""

    def __init__(self, *args, analytics_type: str = "line", **kwargs):
        super().__init__(*args, **kwargs)
        self.analytics_type = analytics_type
        self.total_counts: list[int] = []
        self.clswise_counts: list[dict] = []

    def process(self, im0, frame_number: int | None = None):
        self.extract_tracks(im0)
        counts: dict[str, int] = {}
        for c in self.clss:
            name = self.names.get(int(c), str(c))
            counts[name] = counts.get(name, 0) + 1
        self.total_counts.append(len(self.track_ids))
        self.clswise_counts.append(counts)
        return self.display_output(im0)

    def plot(self, save_path=None):
        """Render the counts chart if matplotlib is available."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover - chart is an optional surface
            return None
        fig, ax = plt.subplots()
        if self.analytics_type == "pie" and self.clswise_counts:
            agg: dict[str, int] = {}
            for c in self.clswise_counts:
                for k, v in c.items():
                    agg[k] = agg.get(k, 0) + v
            ax.pie(list(agg.values()), labels=list(agg.keys()))
        elif self.analytics_type == "bar" and self.clswise_counts:
            last = self.clswise_counts[-1]
            ax.bar(list(last.keys()), list(last.values()))
        else:
            ax.plot(self.total_counts)
            ax.set_xlabel("frame")
            ax.set_ylabel("tracks")
        if save_path:
            fig.savefig(save_path)
        plt.close(fig)
        return save_path


class ParkingManagement(BaseSolution):
    """Occupancy per parking polygon (ref: parking_management.py ParkingManagement)."""

    def __init__(self, *args, json_file=None, regions=None, **kwargs):
        super().__init__(*args, **kwargs)
        if json_file:
            import json

            regions = [r["points"] for r in json.loads(Path(json_file).read_text())]
        self.regions = [np.asarray(r, np.float32) for r in (regions or [])]
        self.pr_info = {"Occupancy": 0, "Available": 0}

    @staticmethod
    def _point_in_poly(pt, poly) -> bool:
        import cv2

        return cv2.pointPolygonTest(poly.astype(np.float32), (float(pt[0]), float(pt[1])), False) >= 0

    def process(self, im0):
        import cv2

        self.extract_tracks(im0)
        centers = [((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in self.boxes]
        occupied = 0
        for poly in self.regions:
            occ = any(self._point_in_poly(c, poly) for c in centers)
            occupied += occ
            cv2.polylines(im0, [poly.astype(np.int32)], True, (0, 0, 255) if occ else (0, 255, 0), 2)
        self.pr_info = {"Occupancy": occupied, "Available": len(self.regions) - occupied}
        return self.display_output(im0)


class SecurityAlarm(BaseSolution):
    """Raise an alert when detections exceed a threshold (ref: security_alarm.py).

    Email delivery (the reference's SMTP hook) is replaced by a callback —
    this environment has no network egress."""

    def __init__(self, *args, records: int = 5, on_alert=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.records = int(records)
        self.on_alert = on_alert
        self.email_sent = False
        self.alerts: list[int] = []

    def process(self, im0):
        self.extract_tracks(im0)
        n = len(self.track_ids)
        if n >= self.records and not self.email_sent:
            self.email_sent = True
            self.alerts.append(n)
            if self.on_alert:
                self.on_alert(n, im0)
        return self.display_output(im0)
