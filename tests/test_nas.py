"""YOLO-NAS deploy-form graph + facade (ref: models/nas/model.py NAS:20,
predict.py NASPredictor, val.py NASValidator)."""

import numpy as np
import pytest


def test_nas_builds_and_predicts():
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolo_nas_s.yaml")
    p = m.init(0)
    y = jax.jit(m.predict)(p, jnp.zeros((1, 128, 128, 3), jnp.float32))
    assert y.shape == (1, 84, 336)  # 4+80 over P3/8+P4/16+P5/32 anchors
    assert m.stride == [8, 16, 32]


def test_nas_facade_predict_and_roundtrip(tmp_path):
    from yolo_tpu import NAS

    m = NAS("yolo_nas_s")
    img = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
    res = m.predict(img, conf=0.9, verbose=False)
    assert res[0].boxes.xyxy.shape[1] == 4
    # native checkpoint round-trip keeps the graph
    from yolo_tpu.engine.exporter import load_npz, save_npz

    save_npz(m.model, m.params, tmp_path / "nas.npz")
    m2, p2, _ = load_npz(tmp_path / "nas.npz")
    assert type(m2).__name__ == "DetectionModel"
    assert [s.type for s in m2.layers] == [s.type for s in m.model.layers]


@pytest.mark.heavy
def test_tune_facade(tmp_path):
    """YOLO(...).tune(iterations=2) runs the Tuner (ref: engine/model.py tune:810)."""
    import cv2

    from yolo_tpu import YOLO

    # 4-image micro dataset
    root = tmp_path / "ds"
    for split in ("images", "labels"):
        (root / split / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        cv2.imwrite(str(root / "images" / "train" / f"{i}.jpg"), img)
        (root / "labels" / "train" / f"{i}.txt").write_text("0 0.5 0.5 0.3 0.3\n")
    data = root / "data.yaml"
    data.write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: t\n")

    m = YOLO("yolov8n.yaml")
    best = m.tune(iterations=2, data=str(data), epochs=1, imgsz=64, batch=2,
                  project=str(tmp_path / "tune_out"), workers=0, plots=False, val=True)
    assert best is not None
