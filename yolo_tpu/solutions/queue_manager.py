"""Queue management: count tracks currently inside a region (ref: solutions/queue_management.py)."""

from __future__ import annotations

import numpy as np

from yolo_tpu.solutions.object_counter import _point_in_polygon
from yolo_tpu.solutions.solutions import BaseSolution


class QueueManager(BaseSolution):
    """Track how many objects currently wait inside the queue region."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.region = self.region or [(20, 60), (300, 60), (300, 400), (20, 400)]
        self.queue_count = 0
        self.max_queue = 0

    def process(self, im0):
        import cv2

        self.extract_tracks(im0)
        self.queue_count = 0
        vis = im0.copy()
        for box, tid in zip(self.boxes, self.track_ids):
            self.store_tracking_history(tid, box)
            center = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            inside = _point_in_polygon(center, self.region)
            if inside:
                self.queue_count += 1
            color = (0, 0, 255) if inside else (0, 255, 0)
            cv2.rectangle(vis, (int(box[0]), int(box[1])), (int(box[2]), int(box[3])), color, 1)
        self.max_queue = max(self.max_queue, self.queue_count)
        pts = np.asarray(self.region, np.int32)
        cv2.polylines(vis, [pts], True, (104, 0, 123), 2)
        cv2.putText(vis, f"Queue: {self.queue_count}", (10, 28), cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        self.display_output(vis)
        return {"im0": vis, "queue_count": self.queue_count, "max_queue": self.max_queue}
