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


def test_train_stem_parity():
    """stem_apply_train (packed r=4, BN train semantics) matches the standard
    walk's layers 0-1 in train mode — activations, recorded batch stats, AND
    gradients w.r.t. conv weights + BN affine params (float tolerance: conv
    summation order differs). This is the r5 train-memory rewrite: the P1
    activation lives packed (B, H/4, W/4, 4*c0) instead of channel-minor
    (B, H/2, W/2, c0) that lane-pads 8x at b16 (r4 train roofline 335.5 MB x4).
    Ref stem: ultralytics/cfg/models/v8/yolov8-small.yaml backbone rows 0-1."""
    import jax

    from yolo_tpu.nn.modules import Ctx
    from yolo_tpu.nn.s2d import pack_input, stem_apply_train, validate_stem

    model = DetectionModel("yolov8-small.yaml", ch=1)
    params = model.init(0)  # UNFUSED (train) params
    validate_stem(model)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (4, 64, 96, 1), np.uint8)
    # non-trivial BN state so affine grads are exercised
    for li in ("0", "1"):
        bn = params["model"][li]["bn"]
        bn["weight"] = rng.uniform(0.5, 1.5, bn["weight"].shape).astype(np.float32)
        bn["bias"] = rng.normal(0, 0.1, bn["bias"].shape).astype(np.float32)

    def std_path(p, x):
        ctx = Ctx(train=True, dtype=jnp.float32)
        out, _, _ = model._walk(p, x, ctx, upto=2)
        return out, ctx.stats

    def packed_path(p, xp):
        ctx = Ctx(train=True, dtype=jnp.float32)
        out = stem_apply_train(p["model"]["0"], p["model"]["1"], xp, ctx)
        return out, ctx.stats

    x = jnp.asarray(img).astype(jnp.float32) / 255.0
    xp = jnp.asarray(pack_input(img, 4)).astype(jnp.float32) / 255.0
    out0, stats0 = std_path(params, x)
    out1, stats1 = packed_path(params, xp)
    assert out0.shape == out1.shape  # standard P2 layout either way
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=2e-5, rtol=1e-4)
    assert set(stats0) == set(stats1) == {"model/0/bn", "model/1/bn"}
    for k in stats0:
        m0, v0, n0 = stats0[k]
        m1, v1, n1 = stats1[k]
        assert n0 == n1, k
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-5, err_msg=k)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5, rtol=1e-4, err_msg=k)

    # gradients through both paths agree (sum-of-squares probe loss)
    sub = {"model": {"0": params["model"]["0"], "1": params["model"]["1"]}}
    g0 = jax.grad(lambda p: (std_path(p, x)[0] ** 2).sum())(sub)
    g1 = jax.grad(lambda p: (packed_path(p, xp)[0] ** 2).sum())(sub)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g1)}
    for k, v0 in flat0:
        ks = jax.tree_util.keystr(k)
        v1 = flat1[ks]
        scale = max(1.0, float(np.max(np.abs(v0))))
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=2e-4 * scale, err_msg=ks)


@pytest.mark.heavy  # r5 tier rebalance: stem_apply_train math parity (test_train_stem_parity) stays default
def test_trainer_s2d_step_matches_standard(tmp_path, monkeypatch):
    """A full DetectionTrainer jitted step with YOLO_TPU_TRAIN_S2D=4 produces
    the same loss components and (near-)identical updated params as the
    standard step — the packed stem is a drop-in rewrite, not a model change."""
    import jax

    from yolo_tpu.engine.trainer import DetectionTrainer

    rng = np.random.default_rng(3)
    batch = {
        "img": jnp.asarray(rng.integers(0, 255, (2, 64, 96, 1), np.uint8)),
        "cls": jnp.zeros((2, 4), jnp.float32),
        "bboxes": jnp.asarray(rng.uniform(0.3, 0.6, (2, 4, 4)).astype(np.float32)),
        "mask_gt": jnp.asarray(np.tile(np.array([1.0, 1.0, 0.0, 0.0], np.float32), (2, 1))),
    }

    outs = {}
    for flag in ("0", "4"):
        monkeypatch.setenv("YOLO_TPU_TRAIN_S2D", flag)
        model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
        tr = DetectionTrainer({"model": "yolov8-small.yaml", "imgsz": 64, "amp": False}, model=model, params=model.init(0))
        tr.opt = tr.build_optimizer(iterations=10)
        step = tr._build_step(mesh=None)
        p, os_ = tr.params, tr.opt.init(tr.params)
        ema = jax.tree_util.tree_map(lambda x: x, tr.params)
        n = jnp.zeros((), jnp.float32)
        p, os_, ema, n, comps = step(p, os_, ema, n, batch, 1e-3, 0.9, 1e-3)
        outs[flag] = (np.asarray(comps), p)
    c0, p0 = outs["0"]
    c4, p4 = outs["4"]
    np.testing.assert_allclose(c0, c4, rtol=1e-4, atol=1e-5)
    # BN running stats must have been updated identically through the packed
    # stem's combined-moment path (post-AdamW conv params are NOT compared:
    # m/(sqrt(v)+eps) after one step is ~sign(g), so float-reassociation of a
    # near-zero gradient legitimately flips individual updates — gradient
    # parity itself is asserted by test_train_stem_parity)
    for li in ("0", "1"):
        for key in ("running_mean", "running_var"):
            v0 = np.asarray(p0["model"][li]["bn"][key])
            v4 = np.asarray(p4["model"][li]["bn"][key])
            np.testing.assert_allclose(v0, v4, rtol=1e-4, atol=1e-5, err_msg=f"model/{li}/bn/{key}")
