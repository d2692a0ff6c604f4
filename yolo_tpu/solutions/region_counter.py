"""Per-region live object counting over multiple named regions
(ref: solutions/region_counter.py:13-136)."""

from __future__ import annotations

import numpy as np

from yolo_tpu.solutions.object_counter import _point_in_polygon
from yolo_tpu.solutions.solutions import BaseSolution


class RegionCounter(BaseSolution):
    """Count tracked objects currently inside each user-defined region.

    Mirrors the reference surface (ref solutions/region_counter.py:41-136):
    regions arrive either as ``region={"name": [(x,y), ...], ...}`` (the
    reference's dict form), as a single point list (wrapped as ``Region#01``,
    ref :90-91), via the ``regions=`` kwarg, or incrementally through
    :meth:`add_region`. ``process`` returns per-region counts for the current
    frame plus ``total_tracks`` (ref :136); counts reset every frame (ref :132).
    """

    def __init__(self, *args, regions: dict | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        if regions is None:
            region = self.region
            if isinstance(region, dict):
                regions = dict(region)
            else:
                regions = {"Region#01": region or [(0, 0), (320, 0), (320, 240), (0, 240)]}
        self.regions = dict(regions)
        self.region_counts = {k: 0 for k in self.regions}

    def add_region(self, name: str, polygon_points: list) -> None:
        """Register one more named counting region (ref :55-86)."""
        self.regions[name] = list(polygon_points)
        self.region_counts.setdefault(name, 0)

    def process(self, im0):
        import cv2

        self.extract_tracks(im0)
        self.region_counts = {k: 0 for k in self.regions}
        vis = im0.copy()
        for box in self.boxes:
            center = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            for name, poly in self.regions.items():
                if _point_in_polygon(center, poly):
                    self.region_counts[name] += 1
            cv2.rectangle(vis, (int(box[0]), int(box[1])), (int(box[2]), int(box[3])), (0, 255, 0), 1)
        for i, (name, poly) in enumerate(self.regions.items()):
            pts = np.asarray(poly, np.int32)
            cv2.polylines(vis, [pts], True, (104, 0, 123), 2)
            cv2.putText(vis, f"{name}: {self.region_counts[name]}", (10, 28 + 24 * i),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
        self.display_output(vis)
        return {
            "im0": vis,
            "region_counts": dict(self.region_counts),
            "total_tracks": len(self.track_ids),
        }
