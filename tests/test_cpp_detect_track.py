"""Golden parity: the native C++ detect+track pipeline vs the Python tracker.

examples/cpp_detect_track ports the Kalman stack (AircraftKalmanTracker +
EnhancedMultiTargetTracker, ref: kalman/enhanced_*_tracker.py) to C++ so a TPU
deployment can run the repo's namesake application without Python. This test
replays one synthetic detection stream — linear motion, occlusion windows,
spurious detections, a second target — through both implementations and
compares track IDs, statuses, boxes, lifecycle counters and the final
detected/predicted/state-switch statistics.
"""

from __future__ import annotations

import csv
import os
import re
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
EXAMPLE_DIR = ROOT / "examples" / "cpp_detect_track"


@pytest.fixture(scope="module")
def cpp_binary():
    if shutil.which("cmake") is None:
        pytest.skip("no cmake")
    exe = EXAMPLE_DIR / "build" / "cpp_detect_track"
    if not exe.exists():
        try:
            subprocess.run(["cmake", "-S", str(EXAMPLE_DIR), "-B", str(EXAMPLE_DIR / "build")],
                           check=True, capture_output=True, text=True)
            subprocess.run(["cmake", "--build", str(EXAMPLE_DIR / "build")],
                           check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:  # pragma: no cover
            pytest.skip(f"cmake build failed: {e.stderr[-500:]}")
    return exe


def _synthetic_detections(n_frames: int = 420, seed: int = 7):
    """Two linear targets with noise, occlusion windows and clutter.

    Returns rows of (frame, x1, y1, x2, y2, conf); frame is 1-based.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for f in range(1, n_frames + 1):
        # target A: left->right, occluded 3x for 25/60/35 frames
        occluded_a = 90 <= f < 115 or 200 <= f < 260 or 330 <= f < 365
        if not occluded_a:
            cx = 40.0 + 1.31 * f + rng.normal(0, 0.4)
            cy = 250.0 + 0.23 * f + rng.normal(0, 0.4)
            w = 22.0 + rng.normal(0, 0.2)
            h = 14.0 + rng.normal(0, 0.2)
            conf = float(np.clip(0.55 + rng.normal(0, 0.1), 0.12, 0.99))
            rows.append((f, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, conf))
        # target B: enters at frame 60, diagonal, occluded once
        if f >= 60 and not (280 <= f < 310):
            cx = 600.0 - 0.9 * (f - 60) + rng.normal(0, 0.4)
            cy = 100.0 + 0.55 * (f - 60) + rng.normal(0, 0.4)
            w = 18.0 + rng.normal(0, 0.2)
            h = 12.0 + rng.normal(0, 0.2)
            conf = float(np.clip(0.5 + rng.normal(0, 0.1), 0.12, 0.99))
            rows.append((f, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, conf))
        # occasional clutter (low conf, random place) — some below the 0.1 gate
        if rng.random() < 0.06:
            cx, cy = rng.uniform(30, 610), rng.uniform(30, 480)
            w, h = rng.uniform(8, 20), rng.uniform(6, 14)
            conf = float(rng.uniform(0.05, 0.3))
            rows.append((f, cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, conf))
    return rows


def _write_csv(rows, path: Path):
    with open(path, "w") as f:
        f.write("frame,x1,y1,x2,y2,conf\n")
        for r in rows:
            f.write(f"{r[0]},{r[1]:.17g},{r[2]:.17g},{r[3]:.17g},{r[4]:.17g},{r[5]:.17g}\n")


def _python_reference(csv_path: Path, n_frames: int, conf: float = 0.1):
    """Replay through the Python tracker with main.cpp's exact loop semantics."""
    from yolo_tpu.kalman.multi_tracker import EnhancedMultiTargetTracker

    by_frame: dict[int, list[list[float]]] = {}
    with open(csv_path) as f:
        next(f)
        for line in f:
            vals = [float(v) for v in line.strip().split(",")]
            by_frame.setdefault(int(vals[0]), []).append(vals[1:6])

    tracker = EnhancedMultiTargetTracker(max_lost_frames=150, min_hits=1, iou_threshold=0.1)
    per_frame = {}
    detection_frames = prediction_frames = state_changes = 0
    last_states: dict[str, str] = {}
    for f in range(1, n_frames + 1):
        dets = [d for d in by_frame.get(f, []) if d[4] > conf]
        tracks = tracker.update(dets)
        current = {}
        for t in tracks:
            current[t["track_id"]] = t["status"]
            if t["track_id"] in last_states and last_states[t["track_id"]] != t["status"]:
                state_changes += 1
            if t["status"] == "detected":
                detection_frames += 1
            elif t["status"] == "predicted":
                prediction_frames += 1
        last_states = current
        per_frame[f] = [
            {
                "track_id": t["track_id"],
                "status": t["status"],
                "bbox": np.asarray(t["bbox"], dtype=float),
                "confidence": float(t["confidence"]),
                "hits": int(t["hits"]),
                "hit_streak": int(t["hit_streak"]),
                "time_since_update": int(t["time_since_update"]),
                "motion_confidence": float(t["motion_confidence"]),
            }
            for t in tracks
        ]
    stats = {
        "detection_frames": detection_frames,
        "prediction_frames": prediction_frames,
        "state_changes": state_changes,
    }
    return per_frame, stats, tracker.stats


def _run_cpp(exe: Path, csv_path: Path, out_path: Path, n_frames: int) -> str:
    r = subprocess.run(
        [str(exe), "--dets", str(csv_path), "--out", str(out_path),
         "--max-frames", str(n_frames)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, f"cpp pipeline failed:\n{r.stderr[-2000:]}\n{r.stdout[-2000:]}"
    return r.stdout


def test_cpp_tracker_golden_parity(cpp_binary, tmp_path):
    n_frames = 420
    rows = _synthetic_detections(n_frames)
    csv_path = tmp_path / "detections.csv"
    _write_csv(rows, csv_path)

    per_frame_py, stats_py, tracker_stats_py = _python_reference(csv_path, n_frames)
    out_path = tmp_path / "tracks.csv"
    stdout = _run_cpp(cpp_binary, csv_path, out_path, n_frames)

    # parse C++ per-frame tracks
    per_frame_cpp: dict[int, list[dict]] = {}
    with open(out_path) as f:
        for row in csv.DictReader(f):
            per_frame_cpp.setdefault(int(row["frame"]), []).append(
                {
                    "track_id": row["track_id"],
                    "status": row["status"],
                    "bbox": np.array([float(row["x1"]), float(row["y1"]),
                                      float(row["x2"]), float(row["y2"])]),
                    "confidence": float(row["confidence"]),
                    "hits": int(row["hits"]),
                    "hit_streak": int(row["hit_streak"]),
                    "time_since_update": int(row["time_since_update"]),
                    "motion_confidence": float(row["motion_confidence"]),
                }
            )

    # frame-by-frame comparison
    assert set(per_frame_cpp) == {f for f, ts in per_frame_py.items() if ts}
    for f, py_tracks in per_frame_py.items():
        cpp_tracks = per_frame_cpp.get(f, [])
        assert len(cpp_tracks) == len(py_tracks), f"frame {f}: track count"
        for pt, ct in zip(py_tracks, cpp_tracks):  # emission order = tracker order
            assert ct["track_id"] == pt["track_id"], f"frame {f}"
            assert ct["status"] == pt["status"], f"frame {f} {pt['track_id']}"
            np.testing.assert_allclose(ct["bbox"], pt["bbox"], rtol=1e-6, atol=2e-5,
                                       err_msg=f"frame {f} {pt['track_id']}")
            assert ct["hits"] == pt["hits"]
            assert ct["hit_streak"] == pt["hit_streak"]
            assert ct["time_since_update"] == pt["time_since_update"]
            assert abs(ct["confidence"] - pt["confidence"]) < 1e-5
            assert abs(ct["motion_confidence"] - pt["motion_confidence"]) < 1e-5

    # aggregate statistics parity (the reference's contract stats)
    m = re.search(r"done: (\d+) frames; detected (\d+) .* predicted (\d+) .*; (\d+) state switches",
                  stdout)
    assert m, f"no stats line in:\n{stdout[-1000:]}"
    assert int(m.group(1)) == n_frames
    assert int(m.group(2)) == stats_py["detection_frames"]
    assert int(m.group(3)) == stats_py["prediction_frames"]
    assert int(m.group(4)) == stats_py["state_changes"]

    # lifecycle stats (created / terminated / recoveries) from the stdout log
    created = stdout.count("New tracker created:")
    recovered = stdout.count("re-acquired, back to detection mode")
    assert created == tracker_stats_py["total_tracks_created"]
    assert recovered == tracker_stats_py["successful_recoveries"]

    # the scenario actually exercised coasting: some predictions + recoveries
    assert stats_py["prediction_frames"] > 50
    assert tracker_stats_py["successful_recoveries"] >= 2


def test_cpp_pipeline_usage(cpp_binary):
    r = subprocess.run([str(cpp_binary)], capture_output=True, text=True)
    assert r.returncode == 2 and "usage" in r.stderr


@pytest.mark.heavy
def test_cpp_full_pipeline_on_tpu(cpp_binary, tmp_path):
    """End-to-end native pipeline: C++ letterbox -> PJRT on the REAL TPU
    (nms=True export, on-device decode+NMS) -> C++ Kalman tracking."""
    plugin = Path("/opt/axon/libaxon_pjrt.so")
    if not plugin.exists():
        pytest.skip("axon PJRT plugin not present")

    from yolo_tpu.engine.exporter import export_stablehlo
    from yolo_tpu.nn.tasks import DetectionModel

    mini = {
        "nc": 1,
        "scales": {"n": [0.33, 0.25, 1024]},
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "C2f", [32, True]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [[[2, 3], 1, "Detect", ["nc"]]],
        "scale": "n",
        "yaml_file": "mini-detect.yaml",
    }
    model = DetectionModel(dict(mini))
    params = model.fuse(model.init(0))
    path = export_stablehlo(model, params, imgsz=(64, 64), nms=True, conf=0.01,
                            filename=str(tmp_path / "mini.stablehlo"))
    mlir = path.with_suffix(".mlir")

    # 3 raw RGB frames at a non-square source size (exercises the letterbox)
    src_h, src_w = 48, 80
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(3, src_h, src_w, 3), dtype=np.uint8)
    video = tmp_path / "clip.u8"
    video.write_bytes(frames.tobytes())

    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [str(cpp_binary), "--module", str(mlir), "--video", str(video),
         "--src-h", str(src_h), "--src-w", str(src_w), "--conf", "0.01"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, f"pipeline failed:\n{r.stderr[-3000:]}"
    assert "done: 3 frames" in r.stdout
