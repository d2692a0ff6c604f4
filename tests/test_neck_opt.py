"""Parity tests for the neck Upsample→Concat→C2f algebra fold
(C2f.call_upconcat + DetectionModel._build_neck_opt): the 1x1 cv1 commutes
exactly with nearest upsample, so the rewrite must be numerically equivalent
(bit-wise in f32 up to summation-order rounding)."""

import jax.numpy as jnp
import numpy as np

from yolo_tpu.nn.tasks import DetectionModel
import pytest


def _model():
    m = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    return m, m.fuse(m.init(0))


def test_upconcat_chains_detected():
    m, _ = _model()
    m._build_neck_opt()
    # yolov8-small has exactly three neck upsample chains: P5→P4 (12),
    # P4→P3 (15), P3→P2 (18)
    assert m._upconcat == {12: (6, 2), 15: (4, 2), 18: (2, 2)}
    assert m._neck_skip == {10, 11, 13, 14, 16, 17}


@pytest.mark.heavy  # bf16 variant below is the shipped predict path; f32 runs nightly
def test_neck_opt_parity_f32():
    m, params = _model()
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32)
    want_b, want_s = m.predict_parts(params, x, dtype=jnp.float32)
    got_b, got_s = m.predict_parts(params, x, dtype=jnp.float32, neck_opt=True)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-4, atol=1e-4)


@pytest.mark.heavy  # r5 tier rebalance: f32 parity stays default
def test_neck_opt_parity_bf16():
    m, params = _model()
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32)
    want_b, want_s = m.predict_parts(params, x, dtype=jnp.bfloat16)
    got_b, got_s = m.predict_parts(params, x, dtype=jnp.bfloat16, neck_opt=True)
    # two bf16 roundings instead of one around the split cv1 matmuls
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=0.05, atol=0.5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=0.05, atol=0.02)


def test_params_are_fused_float():
    from yolo_tpu.nn.tasks import params_are_fused_float

    m = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    raw = m.init(0)
    assert not params_are_fused_float(raw)  # unfused: BN groups present
    assert params_are_fused_float(m.fuse(raw))


def test_fused_pipeline_defaults_neck_opt(monkeypatch):
    """The fold is the shipped default for fused float params (the on-chip
    A/B winner), auto-off for unfused trees, and env-killable."""
    from yolo_tpu.pipeline import FusedDetectTrack

    m, fused = _model()
    ft = FusedDetectTrack(m, fused, frame_hw=(64, 96), channels=1, chunk=4)
    assert ft.neck_opt is True

    raw = m.init(0)
    ft_raw = FusedDetectTrack(m, raw, frame_hw=(64, 96), channels=1, chunk=4)
    assert ft_raw.neck_opt is False

    monkeypatch.setenv("YOLO_TPU_NECK_OPT", "0")
    from yolo_tpu.nn.tasks import _neck_opt_flag

    assert _neck_opt_flag(True) is False
    monkeypatch.setenv("YOLO_TPU_NECK_OPT", "1")
    assert _neck_opt_flag(False) is True
