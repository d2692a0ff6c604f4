"""Cumulative detection heatmap overlay (ref: solutions/heatmap.py)."""

from __future__ import annotations

import numpy as np

from yolo_tpu.solutions.solutions import BaseSolution


class Heatmap(BaseSolution):
    """Accumulate per-pixel presence of tracked boxes, render as a colormap blend."""

    def __init__(self, *args, colormap: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.colormap = colormap
        self.heat = None

    def process(self, im0):
        import cv2

        if self.heat is None:
            self.heat = np.zeros(im0.shape[:2], np.float32)
        self.extract_tracks(im0)
        for box in self.boxes:
            x1, y1, x2, y2 = [int(v) for v in box]
            # gaussian-ish center-weighted splat inside the box
            h, w = max(y2 - y1, 1), max(x2 - x1, 1)
            yy, xx = np.mgrid[0:h, 0:w]
            cy, cx = (h - 1) / 2, (w - 1) / 2
            g = np.exp(-(((xx - cx) / (w / 2 + 1e-6)) ** 2 + ((yy - cy) / (h / 2 + 1e-6)) ** 2))
            ys, ye = max(y1, 0), min(y2, im0.shape[0])
            xs, xe = max(x1, 0), min(x2, im0.shape[1])
            if ye <= ys or xe <= xs:  # box entirely off-frame
                continue
            # slice g at the CLIPPED offset so the peak stays on the object
            # center for edge boxes (g[:h_clip] alone shifts the peak)
            self.heat[ys:ye, xs:xe] += g[ys - y1 : ye - y1, xs - x1 : xe - x1]

        norm = (255 * self.heat / (self.heat.max() + 1e-9)).astype(np.uint8)
        cmap = self.colormap if self.colormap is not None else cv2.COLORMAP_JET
        colored = cv2.applyColorMap(norm, cmap)
        im_out = cv2.addWeighted(im0, 0.5, colored, 0.5, 0)
        self.display_output(im_out)
        return {"im0": im_out, "total_heat": float(self.heat.sum())}
