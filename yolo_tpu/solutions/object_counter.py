"""Line/region object counting (ref: solutions/object_counter.py)."""

from __future__ import annotations

import numpy as np

from yolo_tpu.solutions.solutions import BaseSolution


def _side_of_line(p, a, b) -> float:
    return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])


def _point_in_polygon(p, poly) -> bool:
    x, y = p
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1
            if x < xin:
                inside = not inside
    return inside


class ObjectCounter(BaseSolution):
    """Count tracks crossing a line (2 points) or entering a region (3+ points)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.region = self.region or [(0, 200), (640, 200)]
        self.in_count = 0
        self.out_count = 0
        self.counted_ids: set[int] = set()
        self.classwise: dict[str, dict] = {}

    def process(self, im0):
        self.extract_tracks(im0)
        for box, tid, cls in zip(self.boxes, self.track_ids, self.clss):
            self.store_tracking_history(tid, box)
            hist = self.track_history[tid]
            if tid in self.counted_ids or len(hist) < 2:
                continue
            prev, curr = hist[-2], hist[-1]
            name = self.names.get(cls, str(cls))
            cw = self.classwise.setdefault(name, {"IN": 0, "OUT": 0})
            if len(self.region) == 2:  # line crossing with signed side change
                s0 = _side_of_line(prev, self.region[0], self.region[1])
                s1 = _side_of_line(curr, self.region[0], self.region[1])
                if s0 * s1 < 0:
                    if s1 > 0:
                        self.in_count += 1
                        cw["IN"] += 1
                    else:
                        self.out_count += 1
                        cw["OUT"] += 1
                    self.counted_ids.add(tid)
            else:  # polygon entry/exit (ref object_counter counts both directions)
                inside_now = _point_in_polygon(curr, self.region)
                inside_before = _point_in_polygon(prev, self.region)
                if inside_now and not inside_before:
                    self.in_count += 1
                    cw["IN"] += 1
                    self.counted_ids.add(tid)
                elif inside_before and not inside_now:
                    self.out_count += 1
                    cw["OUT"] += 1
                    self.counted_ids.add(tid)

        im0 = self._annotate(im0)
        self.display_output(im0)
        return {"in_count": self.in_count, "out_count": self.out_count, "classwise_count": self.classwise, "im0": im0}

    def _annotate(self, im0):
        import cv2

        vis = im0.copy()
        pts = np.asarray(self.region, np.int32)
        if len(self.region) == 2:
            cv2.line(vis, tuple(pts[0]), tuple(pts[1]), (104, 0, 123), 2)
        else:
            cv2.polylines(vis, [pts], True, (104, 0, 123), 2)
        for box, tid in zip(self.boxes, self.track_ids):
            cv2.rectangle(vis, (int(box[0]), int(box[1])), (int(box[2]), int(box[3])), (0, 255, 0), 1)
            cv2.putText(vis, str(tid), (int(box[0]), int(box[1]) - 4), cv2.FONT_HERSHEY_SIMPLEX, 0.4, (0, 255, 0), 1)
        cv2.putText(vis, f"IN {self.in_count}  OUT {self.out_count}", (10, 28), cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        return vis
