"""Parity tests for the fused C2f Pallas kernel (ops/pallas_c2f.py) vs the
module implementation (nn/modules.py C2f) on identical fused params."""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.nn import modules as M
from yolo_tpu.ops.pallas_c2f import fused_c2f


def _fused_c2f_params(rng, mod):
    def fuse(m, p):
        return {"conv": {"weight": p["conv"]["weight"], "bias": rng.normal(0, 0.1, (m.c2,)).astype(np.float32)}}

    return {
        "cv1": fuse(mod.cv1, mod.cv1.init(rng)),
        "cv2": fuse(mod.cv2, mod.cv2.init(rng)),
        "m": {
            str(i): {"cv1": fuse(b.cv1, b.cv1.init(rng)), "cv2": fuse(b.cv2, b.cv2.init(rng))}
            for i, b in enumerate(mod.m)
        },
    }


@pytest.mark.parametrize(
    "B,H,W,c1,c2,n,shortcut",
    [
        (2, 8, 20, 24, 24, 2, True),  # backbone P2 geometry (yolov8-small-n layer 2)
        (2, 6, 16, 72, 24, 2, False),  # neck P2 (layer 18: concat input, no shortcut)
        (1, 7, 12, 48, 48, 3, True),  # P3 n=3, odd H, B=1
        (4, 5, 8, 16, 32, 1, False),  # n=1 minimal chain, B > block_b
    ],
)
def test_fused_c2f_parity_f32(B, H, W, c1, c2, n, shortcut):
    rng = np.random.default_rng(0)
    mod = M.C2f(c1, c2, n=n, shortcut=shortcut)
    p = _fused_c2f_params(rng, mod)
    x = rng.normal(0, 1, (B, H, W, c1)).astype(np.float32)

    ctx = M.Ctx(train=False, dtype=jnp.float32)
    want = np.asarray(mod(p, jnp.asarray(x), ctx))
    got = np.asarray(
        fused_c2f(jnp.asarray(x), p, n=n, shortcut=shortcut, block_b=2, interpret=True, dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.heavy
def test_model_predict_parts_pallas_c2f_matches():
    """Full-model route: every plain C2f (backbone + neck) through the kernel."""
    from yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.fuse(model.init(0))
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32)

    want_b, want_s = model.predict_parts(params, x, dtype=jnp.float32)
    got_b, got_s = model.predict_parts(
        params, x, dtype=jnp.float32, pallas_c2f=True, pallas_interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-3, atol=1e-3)


def test_fused_c2f_upconcat_parity_f32():
    """Upconcat variant vs the call_upconcat module algebra (itself parity-
    tested against the materialized Upsample→Concat→C2f in test_neck_opt)."""
    from yolo_tpu.ops.pallas_c2f import fused_c2f_upconcat

    rng = np.random.default_rng(3)
    cs, ck, c2 = 48, 24, 24  # P3→P2 neck geometry (small=48ch half-res)
    mod = M.C2f(cs + ck, c2, n=2, shortcut=False)
    p = _fused_c2f_params(rng, mod)
    small = rng.normal(0, 1, (2, 4, 10, cs)).astype(np.float32)
    skip = rng.normal(0, 1, (2, 8, 20, ck)).astype(np.float32)

    ctx = M.Ctx(train=False, dtype=jnp.float32)
    want = np.asarray(mod.call_upconcat(p, jnp.asarray(small), jnp.asarray(skip), 2, ctx))
    got = np.asarray(
        fused_c2f_upconcat(
            jnp.asarray(small), jnp.asarray(skip), p,
            n=2, shortcut=False, block_b=2, interpret=True, dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.heavy
def test_model_neck_opt_plus_pallas_c2f_matches():
    """Both flags together: folded neck chains run fused_c2f_upconcat, the
    rest run fused_c2f — output equals the plain XLA walk."""
    from yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.fuse(model.init(0))
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32)

    want_b, want_s = model.predict_parts(params, x, dtype=jnp.float32)
    got_b, got_s = model.predict_parts(
        params, x, dtype=jnp.float32, neck_opt=True, pallas_c2f=True, pallas_interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-3, atol=1e-3)


def test_fused_c2f_parity_bf16():
    rng = np.random.default_rng(1)
    mod = M.C2f(24, 24, n=2, shortcut=True)
    p = _fused_c2f_params(rng, mod)
    x = rng.normal(0, 1, (2, 8, 20, 24)).astype(np.float32)

    ctx = M.Ctx(train=False, dtype=jnp.bfloat16)
    want = np.asarray(mod(p, jnp.asarray(x), ctx), dtype=np.float32)
    got = np.asarray(
        fused_c2f(jnp.asarray(x), p, n=2, shortcut=True, block_b=2, interpret=True, dtype=jnp.bfloat16),
        dtype=np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.1)
