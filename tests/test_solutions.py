"""Solutions apps over a stubbed tracking model (no weights needed)."""

import numpy as np
import pytest

from yolo_tpu.engine.results import Results
from yolo_tpu.solutions import Heatmap, ObjectCounter, SpeedEstimator


class StubModel:
    """Duck-type of YOLO.track for solutions tests: one target moving down."""

    def __init__(self):
        self.names = {0: "aircraft"}
        self.f = 0

    def track(self, im0, **kwargs):
        y = 40 + 24 * self.f
        self.f += 1
        boxes = np.array([[300, y, 340, y + 30, 1.0, 0.9, 0]], np.float32)  # id=1 col at idx 4
        return [Results(im0, "stub", self.names, boxes=boxes)]


def frames(n=10, h=480, w=640):
    return [np.full((h, w, 3), 30, np.uint8) for _ in range(n)]


def test_object_counter_line_crossing():
    counter = ObjectCounter(model=StubModel(), region=[(0, 160), (640, 160)])
    out = None
    for f in frames(10):
        out = counter.process(f)
    assert out["in_count"] + out["out_count"] == 1
    assert "aircraft" in out["classwise_count"]


def test_heatmap_accumulates():
    hm = Heatmap(model=StubModel())
    out = None
    for f in frames(5):
        out = hm.process(f)
    assert out["total_heat"] > 0
    assert out["im0"].shape == (480, 640, 3)


def test_speed_estimator_reports_positive_speed():
    se = SpeedEstimator(model=StubModel(), fps=30)
    out = None
    for f in frames(6):
        out = se.process(f)
    speeds = list(out["speeds"].values())
    assert speeds and speeds[0] > 100  # 24 px/frame * 30fps = 720 px/s


def test_queue_manager_counts_inside_region():
    from yolo_tpu.solutions import QueueManager

    qm = QueueManager(model=StubModel(), region=[(250, 0), (400, 0), (400, 480), (250, 480)])
    out = None
    for f in frames(6):
        out = qm.process(f)
    assert out["queue_count"] == 1  # target at x≈300-340 stays inside
    assert out["max_queue"] >= 1


def test_region_counter_multiple_regions():
    from yolo_tpu.solutions import RegionCounter

    rc = RegionCounter(
        model=StubModel(),
        regions={"left": [(0, 0), (200, 0), (200, 480), (0, 480)], "right": [(200, 0), (640, 0), (640, 480), (200, 480)]},
    )
    out = rc.process(frames(1)[0])
    assert out["region_counts"]["right"] == 1
    assert out["region_counts"]["left"] == 0
