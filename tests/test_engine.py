"""Engine-object tests: drive trainer/validator/predictor classes directly,
bypassing the YOLO facade (the reference's tests/test_engine.py pattern)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("engds")
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.normal(30, 5, (96, 96, 3)).clip(0, 255).astype(np.uint8)
        cv2.circle(img, (48, 48), 7, (250,) * 3, -1)
        cv2.imwrite(str(root / f"images/train/{i}.png"), img)
        (root / f"labels/train/{i}.txt").write_text("0 0.5 0.5 0.16 0.16\n")
    (root / "dataset.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames: {{0: t}}\n")
    return root


def test_detection_validator_direct(ds, tmp_path):
    from yolo_tpu.engine.validator import DetectionValidator
    from yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov8n.yaml", nc=1)
    params = model.init(0)
    v = DetectionValidator(
        args={"data": str(ds / "dataset.yaml"), "imgsz": 96, "batch": 4, "workers": 1,
              "save_json": True, "plots": True, "project": str(tmp_path), "name": "val", "exist_ok": True}
    )
    results = v(model=model, params=params)
    assert set(results) >= {"precision", "recall", "mAP50", "mAP50-95", "fitness"}
    assert (tmp_path / "val" / "confusion_matrix.png").exists()


def test_predictor_save_outputs(ds, tmp_path):
    from yolo_tpu.engine.predictor import BasePredictor
    from yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov8n.yaml")
    params = model.fuse(model.init(0))
    p = BasePredictor(
        model, params,
        overrides={"conf": 0.001, "imgsz": 96, "save": True, "save_txt": True, "save_conf": True,
                   "project": str(tmp_path), "name": "pred", "exist_ok": True, "verbose": False},
        names=model.names,
    )
    results = p(str(ds / "images/train/0.png"))
    assert len(results) == 1
    assert (tmp_path / "pred" / "0.jpg").exists()
    if len(results[0]):
        assert (tmp_path / "pred" / "labels" / "0.txt").exists()


@pytest.mark.heavy
def test_trainer_direct_smoke(ds, tmp_path):
    from yolo_tpu.engine.trainer import DetectionTrainer

    t = DetectionTrainer(
        overrides={"data": str(ds / "dataset.yaml"), "epochs": 1, "imgsz": 96, "batch": 4, "workers": 1,
                   "mosaic": 0.0, "optimizer": "SGD", "lr0": 0.01, "amp": False, "val": False,
                   "project": str(tmp_path), "name": "tr", "exist_ok": True}
    )
    t.train()
    assert (tmp_path / "tr" / "weights" / "last.npz").exists()
    assert (tmp_path / "tr" / "results.csv").exists()


def test_model_embed_facade():
    """YOLO(...).embed returns pooled per-image feature vectors
    (ref: engine/model.py embed:467)."""
    import numpy as np

    from yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    imgs = [np.random.default_rng(i).integers(0, 255, (80, 100, 3), np.uint8) for i in range(2)]
    out = m.embed(imgs, imgsz=64)
    assert len(out) == 2
    assert out[0].ndim == 1 and out[0].shape == out[1].shape
    assert np.isfinite(out[0]).all()
    # different images give different embeddings
    assert not np.allclose(out[0], out[1])


@pytest.mark.heavy
def test_predict_with_tta():
    """augment=True runs 3-scale + flip TTA (ref: _predict_augment:445) with
    anchors merged after tail clipping."""
    import numpy as np

    from yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    img = np.random.default_rng(0).integers(0, 255, (128, 128, 3), np.uint8)
    r = m.predict(img, conf=0.25, imgsz=128, augment=True, verbose=False)
    assert r[0].boxes.xyxy.shape[1] == 4
    # anchor count sanity at the model level: sum of 3 clipped passes > single
    import jax.numpy as jnp

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    single = m.model.predict(m.params, x).shape[-1]
    tta = m.model.predict_augment(m.params, x).shape[-1]
    assert tta > single


def test_save_crop(tmp_path, monkeypatch):
    """save_crop writes per-class detection crops (ref: save_one_box:626)."""
    import numpy as np

    from yolo_tpu import YOLO

    monkeypatch.chdir(tmp_path)
    m = YOLO("yolov8n.yaml")
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3), np.uint8)
    # very low conf so the random net emits something
    m.predict(img, conf=1e-5, imgsz=96, max_det=3, save_crop=True, verbose=False)
    crops = list((tmp_path).rglob("crops/*/*.jpg"))
    assert crops, "no crops written"


def test_predictor_cache_key_includes_classes_and_max_det(tmp_path):
    """Changing classes/max_det on a reused predictor must compile a fresh
    program, not serve the stale one (review finding: silent wrong output)."""
    import numpy as np

    from yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    m.predict(img, imgsz=64, verbose=False)
    n0 = len(m.predictor._fn_cache)
    m.predict(img, imgsz=64, classes=[0], verbose=False)
    n1 = len(m.predictor._fn_cache)
    m.predict(img, imgsz=64, classes=[0], max_det=7, verbose=False)
    n2 = len(m.predictor._fn_cache)
    assert n1 == n0 + 1 and n2 == n1 + 1


def test_int8_survives_predictor_reuse():
    """int8=True must stay quantized across facade predict calls (review
    finding: params refresh silently reverted to float)."""
    import numpy as np

    from yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    m.predict(img, imgsz=64, int8=True, verbose=False)

    def has_int8(tree):
        if isinstance(tree, dict):
            return "w_int8" in tree or any(has_int8(v) for v in tree.values())
        return False

    assert has_int8(m.predictor.params)
    m.predict(img, imgsz=64, verbose=False)  # reuse path refreshes params
    assert has_int8(m.predictor.params)


def test_val_dispatches_task_validator():
    """Model.val routes segment/pose/obb/rtdetr/classify to their validators
    (it always used DetectionValidator before round 3)."""
    from yolo_tpu.engine.validator import (
        DetectionValidator, OBBValidator, PoseValidator, RTDETRValidator,
        SegmentationValidator, validator_for,
    )

    class M:
        task = "detect"
        is_rtdetr = False

    m = M()
    assert validator_for(m) is DetectionValidator
    m.task = "segment"
    assert validator_for(m) is SegmentationValidator
    m.task = "pose"
    assert validator_for(m) is PoseValidator
    m.task = "obb"
    assert validator_for(m) is OBBValidator
    m.is_rtdetr = True
    assert validator_for(m) is RTDETRValidator


def test_predictor_accepts_grayscale_ndarray():
    """2-D and (H, W, 1) sources run through the Python API (serve.py already
    normalized channels; the predictor crashed at the stem conv before)."""
    import numpy as np

    from yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    gray2d = np.random.default_rng(0).integers(0, 255, (96, 128), np.uint8)
    gray3d = gray2d[..., None]
    color = np.random.default_rng(1).integers(0, 255, (96, 128, 3), np.uint8)
    res = m.predict([gray2d, gray3d, color], imgsz=64, conf=0.9, verbose=False)
    assert len(res) == 3 and all(r.boxes.xyxy.shape[1] == 4 for r in res)


def test_smart_request_rewinds_file_body(monkeypatch, tmp_path):
    """A retried upload re-sends the WHOLE file (the body was at EOF after a
    failed first attempt before round 3)."""
    import io
    import sys
    import types

    bodies = []

    def fake_request(method, url, json=None, data=None, headers=None, timeout=None):
        bodies.append(data.read() if hasattr(data, "read") else data)
        r = types.SimpleNamespace(status_code=500 if len(bodies) == 1 else 200)
        return r

    req = types.ModuleType("requests")
    req.request = fake_request
    monkeypatch.setitem(sys.modules, "requests", req)
    monkeypatch.setattr("time.sleep", lambda s: None)

    from yolo_tpu.hub import smart_request

    payload = b"checkpoint-bytes" * 100
    f = io.BytesIO(payload)
    r = smart_request("POST", "http://x/upload", data=f)
    assert r.status_code == 200
    assert bodies == [payload, payload]
