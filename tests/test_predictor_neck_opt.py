"""The engine predictor's inference-fuse + neck-fold wiring.

AutoBackend parity: the predictor folds Conv+BN at setup (ref
nn/autobackend.py fuse=True) while the facade's raw trainable params stay
unfused; the fused tree turns on the neck Upsample→Concat→C2f fold (exact
algebra). The program cache keys on the fused-params state so set_params can
never serve a stale program."""

import numpy as np
import pytest

import yolo_tpu


@pytest.mark.heavy  # several predictor compiles; the wiring tests below stay default
def test_fold_parity_through_facade(monkeypatch):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96, 3), np.uint8)

    m = yolo_tpu.YOLO("yolov8-small.yaml")
    r_fold = m.predict(img, conf=0.001, imgsz=(64, 96), verbose=False)[0]

    monkeypatch.setenv("YOLO_TPU_NECK_OPT", "0")  # kill switch → plain graph
    m2 = yolo_tpu.YOLO("yolov8-small.yaml")
    r_plain = m2.predict(img, conf=0.001, imgsz=(64, 96), verbose=False)[0]

    assert len(r_fold) == len(r_plain)
    if len(r_fold):
        np.testing.assert_allclose(r_fold.boxes.xyxy, r_plain.boxes.xyxy, rtol=1e-2, atol=0.5)
        np.testing.assert_allclose(r_fold.boxes.conf, r_plain.boxes.conf, rtol=5e-2, atol=1e-3)


def test_predictor_autofuses_and_facade_stays_raw():
    model = yolo_tpu.YOLO("yolov8-small.yaml")
    model.predict(np.zeros((64, 96, 3), np.uint8), conf=0.25, imgsz=(64, 96), verbose=False)
    pred = model.predictor
    # the predictor runs a fused float tree (AutoBackend fuse=True parity)...
    assert pred._params_fused_float is True
    from yolo_tpu.nn.tasks import params_are_fused_float

    assert params_are_fused_float(pred.params)
    # ...while the facade keeps the raw (trainable, BN-carrying) tree
    assert not params_are_fused_float(model.params)


def test_predictor_cache_keys_on_fused_state(monkeypatch):
    model = yolo_tpu.YOLO("yolov8-small.yaml")
    model.predict(np.zeros((64, 96, 3), np.uint8), conf=0.25, imgsz=(64, 96), verbose=False)
    pred = model.predictor
    assert pred._params_fused_float is True
    n_fused = len(pred._fn_cache)

    # a tree the fuse walk rejects falls back to unfused — and must compile a
    # FRESH program rather than serve the fold-enabled one
    monkeypatch.setattr(type(model.model), "fuse", lambda self, p: (_ for _ in ()).throw(RuntimeError("boom")))
    pred.set_params(dict(model.params))  # new tree object → re-setup
    assert pred._params_fused_float is False
    model.predict(np.zeros((64, 96, 3), np.uint8), conf=0.25, imgsz=(64, 96), verbose=False)
    assert len(pred._fn_cache) > n_fused


def test_predictor_lazy_decode_matches_full_route(tmp_path, monkeypatch):
    """The predictor's lazy-decode program (top-k first, decode winners only)
    returns the same detections as the decode-everything route."""
    import numpy as np

    from yolo_tpu import YOLO

    img = np.random.default_rng(5).integers(0, 255, (96, 128, 3), np.uint8)
    monkeypatch.setenv("YOLO_TPU_LAZY_DECODE", "1")
    m1 = YOLO("yolov8n.yaml")
    r1 = m1.predict(img, conf=1e-4, imgsz=96, verbose=False, save=False)[0]
    monkeypatch.delenv("YOLO_TPU_LAZY_DECODE")
    m2 = YOLO("yolov8n.yaml")
    r2 = m2.predict(img, conf=1e-4, imgsz=96, verbose=False, save=False)[0]
    assert len(r1.boxes) == len(r2.boxes)
    np.testing.assert_allclose(np.asarray(r1.boxes.data), np.asarray(r2.boxes.data), rtol=1e-5, atol=1e-5)
