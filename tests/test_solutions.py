"""Solutions apps over a stubbed tracking model (no weights needed)."""

import numpy as np
from pathlib import Path
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
    assert out["total_tracks"] == 1


def test_region_counter_reference_surface():
    """region= dict form, point-list wrapping as Region#01, add_region
    (ref solutions/region_counter.py:55-91)."""
    from yolo_tpu.solutions import RegionCounter

    rc = RegionCounter(model=StubModel(), region={"zoneA": [(250, 0), (640, 0), (640, 480), (250, 480)]})
    rc.add_region("zoneB", [(0, 0), (100, 0), (100, 480), (0, 480)])
    out = rc.process(frames(1)[0])
    assert out["region_counts"] == {"zoneA": 1, "zoneB": 0}

    rc2 = RegionCounter(model=StubModel(), region=[(0, 0), (640, 0), (640, 480), (0, 480)])
    out2 = rc2.process(frames(1)[0])
    assert out2["region_counts"] == {"Region#01": 1}


def test_new_solution_apps_run(tmp_path):
    """All the new demo apps process frames without error and update state."""
    import numpy as np

    from yolo_tpu import YOLO
    from yolo_tpu.solutions import (
        Analytics, DistanceCalculation, ObjectBlurrer, ObjectCropper,
        ParkingManagement, SecurityAlarm, TrackZone, VisionEye,
    )

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (96, 128, 3), np.uint8)
    shared = YOLO("yolov8n.yaml")

    tz = TrackZone(model=shared, conf=1e-4, imgsz=64, region=[(5, 5), (120, 5), (120, 90), (5, 90)])
    tz.process(frame.copy())

    ve = VisionEye(model=shared, conf=1e-4, imgsz=64)
    out = ve.process(frame.copy())
    assert out.shape == frame.shape

    bl = ObjectBlurrer(model=shared, conf=1e-4, imgsz=64, blur_ratio=0.3)
    bl.process(frame.copy())

    cr = ObjectCropper(model=shared, conf=1e-4, imgsz=64, crop_dir=str(tmp_path / "crops"))
    cr.process(frame.copy())
    assert cr.crop_idx >= 0

    an = Analytics(model=shared, conf=1e-4, imgsz=64)
    an.process(frame.copy())
    assert len(an.total_counts) == 1
    an.plot(save_path=str(tmp_path / "chart.png"))

    dc = DistanceCalculation(model=shared, conf=1e-4, imgsz=64)
    dc.process(frame.copy())
    if len(dc.track_ids) >= 2:
        dc.select(dc.track_ids[0])
        dc.select(dc.track_ids[1])
        dc.process(frame.copy())
        assert dc.pixels_distance >= 0

    pm = ParkingManagement(model=shared, conf=1e-4, imgsz=64, regions=[[(0, 0), (60, 0), (60, 60), (0, 60)]])
    pm.process(frame.copy())
    assert pm.pr_info["Occupancy"] + pm.pr_info["Available"] == 1

    hits = []
    sa = SecurityAlarm(model=shared, conf=1e-4, imgsz=64, records=1, on_alert=lambda n, im: hits.append(n))
    sa.process(frame.copy())
    assert sa.email_sent == (len(hits) > 0)


def test_aigym_counts_reps():
    import numpy as np

    from yolo_tpu.solutions import AIGym

    gym = AIGym(model="yolov8n-pose.yaml", conf=1e-4, imgsz=64)
    # angle math sanity: straight line = 180°, right angle = 90°
    assert abs(gym.estimate_pose_angle((0, 0), (1, 0), (2, 0)) - 180.0) < 1e-3
    assert abs(gym.estimate_pose_angle((0, 0), (1, 0), (1, 1)) - 90.0) < 1e-3
    frame = np.random.default_rng(1).integers(0, 255, (96, 128, 3), np.uint8)
    gym.process(frame)
    assert isinstance(gym.workout_counts, dict)


def test_instance_segmentation_app():
    import numpy as np

    from yolo_tpu.solutions import InstanceSegmentation

    seg = InstanceSegmentation(model="yolov8n-seg.yaml", conf=1e-4, imgsz=64)
    frame = np.random.default_rng(2).integers(0, 255, (96, 128, 3), np.uint8)
    out = seg.process(frame)
    assert out.shape == frame.shape


def test_web_inference_serves_mjpeg(tmp_path):
    """Local-web live view (streamlit_inference equivalent): page + MJPEG
    stream of annotated frames."""
    import http.client
    import threading
    import time

    import cv2

    from yolo_tpu.solutions.web_inference import WebInference

    vid = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for _ in range(6):
        vw.write(np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8))
    vw.release()

    wi = WebInference(model="yolov8n.yaml", source=str(vid), conf=0.9, max_frames=6)
    ready = threading.Event()
    t = threading.Thread(target=wi.serve, kwargs={"port": 0, "ready_event": ready}, daemon=True)
    t.start()
    assert ready.wait(30)
    conn = http.client.HTTPConnection("127.0.0.1", wi.port, timeout=120)
    conn.request("GET", "/")
    page = conn.getresponse().read()
    assert b"yolo_tpu live inference" in page
    # wait for the first annotated frame, then read a stream chunk
    for _ in range(600):
        if wi._jpeg is not None:
            break
        time.sleep(0.1)
    assert wi._jpeg is not None, "no frame produced"
    conn.request("GET", "/stream")
    r = conn.getresponse()
    chunk = r.read(2000)
    assert b"--frame" in chunk and b"image/jpeg" in chunk
    wi.shutdown()
    conn.close()


def test_plot_images_and_labels(tmp_path):
    """Train-batch mosaics + label stats (ref: plotting.py plot_images:682,
    plot_labels:564)."""
    from yolo_tpu.utils.plotting import Annotator, plot_images, plot_labels

    rng = np.random.default_rng(0)
    batch = {
        "img": rng.integers(0, 255, (4, 64, 64, 3), np.uint8),
        "cls": np.zeros((4, 8), np.float32),
        "bboxes": np.tile(np.array([0.5, 0.5, 0.4, 0.3], np.float32), (4, 8, 1)),
        "mask_gt": np.tile(np.array([1, 1] + [0] * 6, np.float32), (4, 1)),
    }
    out = tmp_path / "tb.jpg"
    plot_images(batch, fname=out, names={0: "obj"})
    assert out.exists() and out.stat().st_size > 500
    grid = plot_images(batch, save=False)
    assert grid.shape == (128, 128, 3)
    lp = plot_labels(batch["bboxes"].reshape(-1, 4), batch["cls"].reshape(-1), names={0: "obj"},
                     save_path=tmp_path / "labels.png")
    assert (tmp_path / "labels.png").exists()
    # annotator extras
    im = np.zeros((64, 64, 3), np.uint8)
    a = Annotator(im)
    a.rectangle((4, 4, 30, 30), outline=(0, 255, 0))
    a.text((5, 5), "t", box_color=(64, 64, 64))
    a.masks(np.ones((1, 64, 64)), [(255, 0, 0)], alpha=0.4)
    kp = np.concatenate([rng.uniform(5, 60, (17, 2)), np.ones((17, 1))], -1)
    a.kpts(kp)
    assert a.result().any()


def test_solution_config_rejects_unknown_keys():
    """SolutionConfig.update raises on typos (ref: solutions/config.py)."""
    import pytest as _pytest

    from yolo_tpu.solutions.config import SolutionConfig

    cfg = SolutionConfig().update(conf=0.5, region=[(0, 0), (1, 1)])
    assert cfg.conf == 0.5
    with _pytest.raises(ValueError, match="unknown solution argument"):
        SolutionConfig().update(confidnce=0.5)


@pytest.mark.heavy
def test_example_interactive_tracking(tmp_path, monkeypatch):
    """Headless drive of examples/interactive_tracking.py via --click."""
    import cv2
    import numpy as np

    vid = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30, (160, 128))
    for f in range(6):
        fr = np.full((128, 160, 3), 20, np.uint8)
        cv2.circle(fr, (40 + 4 * f, 64), 10, (255, 255, 255), -1)
        vw.write(fr)
    vw.release()
    import importlib.util

    spec = importlib.util.spec_from_file_location("it_ex", Path(__file__).parents[1] / "examples" / "interactive_tracking.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.chdir(tmp_path)
    sel, n = mod.main(["--source", str(vid), "--model", "yolov8n.yaml", "--conf", "0.0001", "--click", "44,64", "--max-frames", "4"])
    assert n == 4 and (tmp_path / "interactive_tracker_output.mp4").exists()


@pytest.mark.heavy
def test_example_action_recognition(tmp_path, monkeypatch):
    """Headless drive of examples/action_recognition.py (random CLIP towers)."""
    import cv2
    import numpy as np

    vid = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30, (160, 128))
    for f in range(6):
        fr = np.full((128, 160, 3), 20, np.uint8)
        cv2.rectangle(fr, (60, 30), (100, 110), (255, 255, 255), -1)
        vw.write(fr)
    vw.release()
    import importlib.util

    spec = importlib.util.spec_from_file_location("ar_ex", Path(__file__).parents[1] / "examples" / "action_recognition.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.chdir(tmp_path)
    actions, n = mod.main(["--source", str(vid), "--model", "yolov8n.yaml", "--conf", "0.0001", "--window", "2", "--max-frames", "4"])
    assert n == 4 and (tmp_path / "action_recognition_output.mp4").exists()


def test_heatmap_edge_boxes_keep_peak_alignment():
    """Review finding: boxes clipped at the frame edge used to shift the
    gaussian peak (or crash when fully off-frame)."""
    class EdgeStub:
        def __init__(self):
            self.names = {0: "obj"}
            self.f = 0

        def track(self, im0, **kw):
            boxes = np.array(
                [[-30, 100, -10, 140, 1.0, 0.9, 0],  # fully off-frame: must not crash
                 [-20, 200, 80, 260, 2.0, 0.9, 0]],  # clipped left: peak at x=30
                np.float32,
            )
            self.f += 1
            return [Results(im0, "stub", self.names, boxes=boxes)]

    hm = Heatmap(model=EdgeStub())
    out = hm.process(np.zeros((480, 640, 3), np.uint8))
    assert out["total_heat"] > 0
    row = hm.heat[230]  # vertical center of the clipped box
    assert row[:100].argmax() in (29, 30)  # peak at the box center ((w-1)/2 half-pixel), not shifted to ~49


def test_object_counter_polygon_counts_exits():
    """Review finding: polygon regions only ever counted entries."""
    class CrossStub:
        def __init__(self):
            self.names = {0: "obj"}
            self.f = 0

        def track(self, im0, **kw):
            cx = 50 + 40 * self.f  # inside at f=0/1, outside from f=2
            self.f += 1
            boxes = np.array([[cx - 8, 42, cx + 8, 58, 1.0, 0.9, 0]], np.float32)
            return [Results(im0, "stub", self.names, boxes=boxes)]

    oc = ObjectCounter(model=CrossStub(), region=[(0, 0), (100, 0), (100, 100), (0, 100)])
    for _ in range(5):
        out = oc.process(np.zeros((200, 200, 3), np.uint8))
    assert out["out_count"] == 1


def test_example_region_counter(tmp_path, monkeypatch):
    """Headless drive of examples/region_counter.py (multi-region counts)."""
    import cv2
    import numpy as np

    vid = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30, (160, 128))
    for f in range(4):
        fr = np.full((128, 160, 3), 20, np.uint8)
        cv2.circle(fr, (40, 64), 10, (255, 255, 255), -1)
        vw.write(fr)
    vw.release()
    import importlib.util

    spec = importlib.util.spec_from_file_location("rc_ex", Path(__file__).parents[1] / "examples" / "region_counter.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.chdir(tmp_path)
    counts = mod.main([
        "--source", str(vid), "--model", "yolov8n.yaml", "--conf", "0.0001", "--imgsz", "64",
        "--regions", "0,0 159,0 159,127 0,127;150,120 159,120 159,127 150,127",
        "--save", str(tmp_path / "rc.mp4"), "--max-frames", "3",
    ])
    assert set(counts) == {"region-01", "region-02"}
    assert (tmp_path / "rc.mp4").exists()
    # region-01 spans the whole frame: with conf ~0 there are detections in it
    assert counts["region-01"] >= counts["region-02"]


def test_example_segment_predict(tmp_path, monkeypatch):
    """Headless drive of examples/segment_predict.py on a tiny image."""
    import cv2
    import numpy as np

    img = tmp_path / "im.jpg"
    fr = np.full((96, 128, 3), 20, np.uint8)
    cv2.rectangle(fr, (40, 30), (90, 70), (255, 255, 255), -1)
    cv2.imwrite(str(img), fr)
    import importlib.util

    spec = importlib.util.spec_from_file_location("sp_ex", Path(__file__).parents[1] / "examples" / "segment_predict.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.chdir(tmp_path)
    results = mod.main(["--source", str(img), "--model", "yolov8n-seg.yaml", "--conf", "0.0001",
                        "--imgsz", "64", "--save", str(tmp_path / "seg.jpg")])
    assert len(results) == 1
    assert (tmp_path / "seg.jpg").exists()


@pytest.mark.heavy
def test_example_rtdetr_predict(tmp_path, monkeypatch):
    """Headless drive of examples/rtdetr_predict.py (NMS-free path)."""
    import cv2
    import numpy as np

    img = tmp_path / "im.jpg"
    fr = np.full((96, 128, 3), 20, np.uint8)
    cv2.rectangle(fr, (40, 30), (90, 70), (255, 255, 255), -1)
    cv2.imwrite(str(img), fr)
    import importlib.util

    spec = importlib.util.spec_from_file_location("rt_ex", Path(__file__).parents[1] / "examples" / "rtdetr_predict.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.chdir(tmp_path)
    # RT-DETR selects 300 queries from ΣHW anchors — imgsz must give ΣHW ≥ 300
    results = mod.main(["--source", str(img), "--conf", "0.0", "--imgsz", "160",
                        "--save", str(tmp_path / "rt.jpg")])
    assert len(results) == 1
    assert (tmp_path / "rt.jpg").exists()
