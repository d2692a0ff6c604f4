"""Typed solutions configuration (ref: ultralytics/solutions/config.py
SolutionConfig:12) — one dataclass holding every solution-tunable knob, with
`update()` rejecting unknown keys so argument typos fail loudly instead of
being silently ignored.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class SolutionConfig:
    """Union of the per-app knobs across all shipped solutions."""

    source: str | None = None
    model: str | None = None
    classes: list | None = None
    show_conf: bool = True
    show_labels: bool = True
    region: list | dict | None = None  # RegionCounter also accepts {name: points} (ref region_counter.py:90-91)
    colormap: int | None = None
    show_in: bool = True
    show_out: bool = True
    up_angle: float = 145.0
    down_angle: float = 90.0
    kpts: list = field(default_factory=lambda: [6, 8, 10])
    analytics_type: str = "line"
    figsize: tuple | None = (12.8, 7.2)
    blur_ratio: float = 0.5
    vision_point: tuple = (20, 20)
    crop_dir: str = "cropped-detections"
    json_file: str | None = None
    line_width: int = 2
    records: int = 5
    fps: float = 30.0
    max_hist: int = 5
    meter_per_pixel: float = 0.05
    max_speed: int = 120
    show: bool = False
    iou: float = 0.7
    conf: float = 0.25
    device: str | None = None
    max_det: int = 300
    half: bool = False
    tracker: str = "botsort.yaml"
    verbose: bool = True
    data: str = "images"
    imgsz: int = 640  # this build's predictors are shape-static; not in the reference dataclass

    def update(self, **kwargs: Any) -> "SolutionConfig":
        """Overlay user kwargs; unknown keys raise (ref: config.py update)."""
        extra = [k for k in kwargs if not hasattr(self, k)]
        if extra:
            valid = ", ".join(sorted(vars(self)))
            raise ValueError(f"unknown solution argument(s) {extra} — valid keys: {valid}")
        for k, v in kwargs.items():
            setattr(self, k, v)
        return self
