"""Sparse box head parity: Detect.sparse_candidates + non_max_suppression_sparse
must reproduce non_max_suppression_parts(predict_parts(...)) to float tolerance.

The sparse route (dense cls branch -> global top-k by score -> cv2 chain + DFL
on gathered 5x5 patches at the winners) is mathematically the same selection,
decode and suppression as the dense parts route — identical terms, different
conv batching/summation order. These tests pin that equivalence on:
  - random inputs (targets everywhere incl. image borders, where the patch
    gather's zero-padding + out-of-image masking must match SAME-conv padding)
  - a synthetic IR frame batch through the full fused pipeline wiring
  - a multi-class model with class filtering and agnostic mode
Ref anchor: ultralytics/nn/modules/head.py:152 (_inference) +
ultralytics/utils/nms.py non_max_suppression:13 — the dense contract both
routes implement.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_tpu.nn.tasks import DetectionModel  # noqa: E402
from yolo_tpu.ops.nms import non_max_suppression_parts  # noqa: E402


def _det_dicts_close(ref, out, atol=2e-3):
    """Compare detection dicts allowing score-tie reorderings: match by
    (box, score) multiset per frame."""
    rv, ov = np.asarray(ref["valid"]), np.asarray(out["valid"])
    assert (rv == ov).all(), f"valid masks differ: {rv.sum()} vs {ov.sum()}"
    for k in ("boxes", "scores", "cls"):
        r, o = np.asarray(ref[k], np.float64), np.asarray(out[k], np.float64)
        assert np.allclose(r, o, atol=atol), f"{k}: max diff {np.abs(r - o).max()}"


@pytest.fixture(scope="module")
def small_model():
    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.fuse(model.init(0))
    return model, params


@pytest.mark.heavy  # r5 tier rebalance: sparse head is opt-in; full parity nightly (flag test stays default)
def test_sparse_matches_parts_random(small_model):
    model, params = small_model
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32))
    b, s = model.predict_parts(params, x, dtype=jnp.float32)
    ref = non_max_suppression_parts(b, s, conf_thres=0.001, iou_thres=0.6, max_det=16, max_nms=64)
    out = model.predict_sparse_det(
        params, x, conf_thres=0.001, iou_thres=0.6, max_det=16, max_nms=64, dtype=jnp.float32
    )
    _det_dicts_close(ref, out)


@pytest.mark.heavy
def test_sparse_matches_parts_border_targets(small_model):
    """Bright blobs in the image corners/edges: the winning anchors sit at
    feature-map borders where the 5x5 patch leaves the image — the masking
    must reproduce dense SAME-padding semantics exactly."""
    model, params = small_model
    img = np.full((1, 64, 96, 1), 0.1, np.float32)
    for cy, cx in [(1, 1), (1, 94), (62, 1), (62, 94), (0, 48), (63, 48)]:
        img[0, max(cy - 2, 0) : cy + 2, max(cx - 2, 0) : cx + 2] = 0.95
    x = jnp.asarray(img)
    b, s = model.predict_parts(params, x, dtype=jnp.float32)
    ref = non_max_suppression_parts(b, s, conf_thres=0.001, iou_thres=0.6, max_det=16, max_nms=64)
    out = model.predict_sparse_det(
        params, x, conf_thres=0.001, iou_thres=0.6, max_det=16, max_nms=64, dtype=jnp.float32
    )
    _det_dicts_close(ref, out)


@pytest.mark.heavy
def test_sparse_multiclass_and_filters():
    model = DetectionModel("yolov8n.yaml", ch=3, nc=80)
    params = model.fuse(model.init(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    b, s = model.predict_parts(params, x, dtype=jnp.float32)
    for kwargs in ({}, {"classes": [3, 17]}, {"agnostic": True}):
        ref = non_max_suppression_parts(
            b, s, conf_thres=0.001, iou_thres=0.5, max_det=8, max_nms=32, **kwargs
        )
        out = model.predict_sparse_det(
            params, x, conf_thres=0.001, iou_thres=0.5, max_det=8, max_nms=32,
            dtype=jnp.float32, **kwargs,
        )
        _det_dicts_close(ref, out)


@pytest.mark.heavy
def test_fused_pipeline_sparse_route_matches_dense():
    """FusedDetectTrack(sparse_head=True) vs (sparse_head=False) end to end on
    a synthetic IR chunk: identical track tables + contract stats."""
    from yolo_tpu.pipeline import FusedDetectTrack

    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.fuse(model.init(0))
    rng = np.random.default_rng(2)
    frames = rng.normal(26, 6, (8, 64, 96, 1)).clip(0, 255).astype(np.uint8)
    for f in range(8):
        cx, cy = 10 + 3 * f, 30
        frames[f, cy - 3 : cy + 3, cx - 4 : cx + 4] = 230

    def run(sparse):
        ft = FusedDetectTrack(
            model, params, frame_hw=(64, 96), channels=1, chunk=8,
            conf=0.15, iou=0.6, n_max=8, d_max=4, dtype=jnp.float32, sparse_head=sparse,
        )
        out = ft.process_chunk(frames)
        _, stats = [], {k: int(np.asarray(v)) for k, v in ft.stats.items() if not k.startswith("prev_")}
        return out, stats

    out_d, st_d = run(False)
    out_s, st_s = run(True)
    assert st_d == st_s
    assert (out_d["track_num"] == out_s["track_num"]).all()
    assert (out_d["status"] == out_s["status"]).all()
    assert np.allclose(out_d["bbox"], out_s["bbox"], atol=0.5)


def test_sparse_flag_resolution():
    """Default resolution: opt-in (A/B has not flipped it yet — see the
    fused.py comment): off by default, YOLO_TPU_SPARSE_HEAD=1 enables for
    fused float plain-Detect params, unfused params never route sparse."""
    import os

    from yolo_tpu.pipeline import FusedDetectTrack

    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    raw = model.init(0)
    fused = model.fuse(raw)
    ft = FusedDetectTrack(model, fused, frame_hw=(64, 96), channels=1, chunk=4, n_max=4, d_max=2)
    assert not ft.sparse_head
    os.environ["YOLO_TPU_SPARSE_HEAD"] = "1"
    try:
        ft_on = FusedDetectTrack(model, fused, frame_hw=(64, 96), channels=1, chunk=4, n_max=4, d_max=2)
        assert ft_on.sparse_head
        ft_raw = FusedDetectTrack(model, raw, frame_hw=(64, 96), channels=1, chunk=4, n_max=4, d_max=2)
        assert not ft_raw.sparse_head
    finally:
        os.environ.pop("YOLO_TPU_SPARSE_HEAD", None)
