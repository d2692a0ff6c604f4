"""Profiling utilities + trainer resume."""

import numpy as np
import pytest

from yolo_tpu.nn.tasks import DetectionModel


def test_model_info_and_flops():
    from yolo_tpu.utils.profilers import model_info

    m = DetectionModel("yolov8n.yaml")
    params = m.init(0)
    info = model_info(m, params, imgsz=64, verbose=False)
    assert info["layers"] == 23
    assert info["parameters"] > 2.5e6
    # yolov8n ≈ 8.7 GFLOPs @640 → ≈ 0.087 @64; sanity band only
    assert 0.01 < info["GFLOPs"] < 1.0 or info["GFLOPs"] == 0.0  # 0.0 if backend lacks cost analysis


def test_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    from yolo_tpu.utils.profilers import trace

    with trace(tmp_path / "prof"):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert any((tmp_path / "prof").rglob("*"))


def test_trainer_resume(tmp_path):
    """Train 2 epochs, resume for 2 more — epochs continue, params carry over."""
    import cv2

    root = tmp_path / "ds"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.normal(30, 5, (96, 96, 3)).clip(0, 255).astype(np.uint8)
        cv2.circle(img, (48, 48), 6, (250,) * 3, -1)
        cv2.imwrite(str(root / f"images/train/{i}.png"), img)
        (root / f"labels/train/{i}.txt").write_text("0 0.5 0.5 0.15 0.15\n")
    (root / "dataset.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames: {{0: t}}\n")

    from yolo_tpu.engine.trainer import DetectionTrainer

    common = dict(
        data=str(root / "dataset.yaml"), imgsz=96, batch=4, workers=1, mosaic=0.0,
        optimizer="AdamW", lr0=0.002, amp=False, val=False, project=str(tmp_path / "runs"), name="exp", exist_ok=True,
    )
    t1 = DetectionTrainer(overrides={**common, "epochs": 2})
    t1.train()
    last = tmp_path / "runs" / "exp" / "weights" / "last.npz"
    assert last.exists()

    t2 = DetectionTrainer(overrides={**common, "epochs": 4, "resume": str(last)})
    assert t2.start_epoch == 2
    t2.train()
    import csv

    rows = list(csv.DictReader(open(tmp_path / "runs" / "exp" / "results.csv")))
    assert int(rows[0]["epoch"]) >= 2  # resumed run starts past the old epochs


def test_benchmark_formats(tmp_path):
    """Format-matrix benchmark (ref: benchmarks.py benchmark:53): every native
    export format exports, reloads, and serves the fused predict."""
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.utils.benchmarks import benchmark_formats

    m = DetectionModel("yolov8n.yaml")
    p = m.init(0)
    rows = benchmark_formats(m, p, imgsz=64, workdir=tmp_path)
    by_fmt = {r["format"]: r for r in rows}
    assert set(by_fmt) == {"native-jit", "npz", "orbax", "stablehlo"}
    for fmt, r in by_fmt.items():
        assert r["status"] == "✅", (fmt, r)
        assert r["fps"] > 0


def test_profile_per_layer_table():
    """Per-layer profile rows cover every graph node with sane numbers."""
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.utils.profilers import profile_per_layer

    cfg = {
        "nc": 1, "scale": "n",
        "backbone": [[-1, 1, "Conv", [16, 3, 2]], [-1, 1, "Conv", [32, 3, 2]], [-1, 1, "C2f", [32, True]],
                      [-1, 1, "Conv", [64, 3, 2]], [-1, 1, "SPPF", [64, 5]]],
        "head": [[[2, 4], 1, "Detect", ["nc"]]],
    }
    model = DetectionModel(dict(cfg))
    params = model.init(seed=0)
    rows = profile_per_layer(model, params, imgsz=64, n=1, verbose=False)
    assert len(rows) == len(model.layers)
    assert all(r["ms"] >= 0 for r in rows)
    assert sum(r["params"] for r in rows) == model.param_count(params)
    assert any(r["gflops"] > 0 for r in rows)


def test_hbm_buffer_table_parses_compiled_executable():
    """hbm_buffer_table returns physical-size rows from a compiled program
    (CPU executables carry layouts without TPU tiling — parser must cope)."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.utils.profilers import hbm_buffer_table

    @jax.jit
    def f(x, w):
        return jax.nn.softmax(jnp.dot(x, w), axis=-1).sum()

    c = f.lower(jnp.zeros((512, 1024)), jnp.zeros((1024, 512))).compile()
    rows = hbm_buffer_table(c, top=5, min_mb=0.1)
    assert rows, "expected at least one >0.1MB instruction"
    assert rows == sorted(rows, key=lambda r: -r["mb"])
    for r in rows:
        assert r["mb"] >= 0.1 and r["dtype"] in ("f32", "bf16") and isinstance(r["shape"], list)
