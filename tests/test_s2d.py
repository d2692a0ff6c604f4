"""Space-to-depth stem fold (nn/s2d.py): exact-parity + pipeline integration.

The fold rewrites the two stride-2 stem convs (ref model rows 0-1,
ultralytics/cfg/models/v8/yolov8-small.yaml via nn/tasks.py parse_model) onto
packed layouts; these tests pin that the rewrite is numerically the identity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yolo_tpu.nn.s2d import fold_stem, pack_input
from yolo_tpu.nn.tasks import DetectionModel
from yolo_tpu.pipeline import FusedDetectTrack


@pytest.fixture(scope="module")
def model_and_params():
    model = DetectionModel("yolov8-small.yaml", ch=1)
    params = model.fuse(model.init(0))
    return model, params


def test_pack_input_roundtrip_order():
    x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    p = pack_input(x, 4)
    assert p.shape == (2, 2, 2, 48)
    # channel order (row-off rr, col-off ss, c): block (0,0) channel of rr=1, ss=2, c=0
    assert p[0, 0, 0, (1 * 4 + 2) * 3 + 0] == x[0, 1, 2, 0]
    assert p[1, 1, 0, (3 * 4 + 0) * 3 + 2] == x[1, 4 + 3, 0, 2]


@pytest.mark.parametrize("r", [4, pytest.param(8, marks=pytest.mark.heavy)])
def test_s2d_predict_parity(model_and_params, r):
    """predict_s2d == predict up to float summation order (same products,
    different association; observed ~1e-5 abs on ~500-magnitude logits)."""
    model, params = model_and_params
    x = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 1), np.uint8)
    ref = np.asarray(model.predict(params, jnp.asarray(x, jnp.float32) / 255.0, dtype=jnp.float32))
    p2 = {**params, "s2d": fold_stem(params, r)}
    xp = jnp.asarray(pack_input(x, r), jnp.float32) / 255.0
    out = np.asarray(model.predict_s2d(p2, xp, dtype=jnp.float32))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-5)


def test_fold_stem_requires_fused(model_and_params):
    model, _ = model_and_params
    unfused = model.init(0)
    with pytest.raises(AssertionError, match="fused"):
        fold_stem(unfused, 4)


@pytest.mark.heavy
def test_fused_pipeline_s2d_matches_dense(model_and_params):
    """FusedDetectTrack(s2d=4) produces the same track tables as s2d=0."""
    model, params = model_and_params
    kw = dict(frame_hw=(64, 64), chunk=8, conf=1e-4, n_max=8, d_max=4, dtype=jnp.float32)
    clip = np.random.default_rng(1).integers(0, 255, (16, 64, 64, 1), np.uint8)
    base = FusedDetectTrack(model, params, **kw)
    outs0, stats0 = base.run_clip(clip)
    s2d = FusedDetectTrack(model, params, s2d=4, **kw)
    outs1, stats1 = s2d.run_clip(clip)
    assert stats0 == stats1
    for o0, o1 in zip(outs0, outs1):
        np.testing.assert_allclose(o0["bbox"], o1["bbox"], atol=1e-3)
        np.testing.assert_array_equal(o0["status"], o1["status"])
        np.testing.assert_array_equal(o0["track_num"], o1["track_num"])
