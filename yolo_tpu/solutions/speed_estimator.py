"""Track speed estimation (ref: solutions/speed_estimation.py)."""

from __future__ import annotations

import numpy as np

from yolo_tpu.solutions.solutions import BaseSolution


class SpeedEstimator(BaseSolution):
    """Estimate per-track speed from center displacement over time.

    `meters_per_pixel` and `fps` convert px/frame → km/h; with defaults the
    reported value is px/s.
    """

    def __init__(self, *args, fps: float = 30.0, meters_per_pixel: float | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.fps = fps
        self.mpp = meters_per_pixel
        self.speeds: dict[int, float] = {}

    def process(self, im0):
        import cv2

        self.extract_tracks(im0)
        vis = im0.copy()
        for box, tid in zip(self.boxes, self.track_ids):
            self.store_tracking_history(tid, box)
            hist = self.track_history[tid]
            if len(hist) >= 2:
                # mean displacement over the last ≤10 steps
                pts = np.asarray(hist[-10:])
                d = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
                px_per_s = d * self.fps
                if self.mpp is not None:
                    self.speeds[tid] = px_per_s * self.mpp * 3.6  # km/h
                    label = f"{self.speeds[tid]:.1f} km/h"
                else:
                    self.speeds[tid] = px_per_s
                    label = f"{px_per_s:.0f} px/s"
                cv2.putText(vis, label, (int(box[0]), int(box[1]) - 6), cv2.FONT_HERSHEY_SIMPLEX, 0.45, (255, 255, 0), 1)
            cv2.rectangle(vis, (int(box[0]), int(box[1])), (int(box[2]), int(box[3])), (255, 255, 0), 1)
        self.display_output(vis)
        return {"im0": vis, "speeds": dict(self.speeds)}
