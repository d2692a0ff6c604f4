"""Parity tests for the fused Detect-head Pallas kernel (ops/pallas_head.py).

Oracle = the module walk it replaces: ConvBNAct x2 + Conv2d 1x1 per branch
(nn/modules.py Detect.__call__) + dfl_project, on identical fused params.
Kernel runs in interpret mode on the CPU backend (tests force
JAX_PLATFORMS=cpu in conftest); the compiled-mode numbers come from bench.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.nn import modules as M
from yolo_tpu.ops.pallas_head import fused_head_level


def _level_params(rng, C, c2, c3, nc, fused=True):
    """Fused-form (conv weight+bias) params for one head level."""
    mods_r = [M.ConvBNAct(C, c2, 3), M.ConvBNAct(c2, c2, 3), M.Conv2d(c2, 4 * 16, 1)]
    mods_c = [M.ConvBNAct(C, c3, 3), M.ConvBNAct(c3, c3, 3), M.Conv2d(c3, nc, 1)]

    def fuse_one(m, p):
        if not isinstance(m, M.ConvBNAct):
            return p
        # random bias + drop bn (pretend already fused); scale weights a bit
        return {"conv": {"weight": p["conv"]["weight"], "bias": rng.normal(0, 0.1, (m.c2,)).astype(np.float32)}}

    p_r = {str(j): fuse_one(m, m.init(rng)) for j, m in enumerate(mods_r)}
    p_c = {str(j): fuse_one(m, m.init(rng)) for j, m in enumerate(mods_c)}
    return mods_r, mods_c, p_r, p_c


def _oracle(mods_r, mods_c, p_r, p_c, x, proj, dtype):
    ctx = M.Ctx(train=False, dtype=dtype)
    b = x
    for j, m in enumerate(mods_r):
        b = m(p_r[str(j)], b, ctx)
    c = x
    for j, m in enumerate(mods_c):
        c = m(p_c[str(j)], c, ctx)
    B, H, W, _ = np.shape(b)
    box = jnp.asarray(b).reshape(B, H * W, 4, 16)
    dist = M.dfl_project(box, proj)  # (B, HW, 4) f32
    cls = jnp.asarray(c).reshape(B, H * W, -1)
    return np.asarray(dist), np.asarray(cls, dtype=np.float32)


@pytest.mark.parametrize(
    "B,H,W,C,c2,c3,nc",
    [
        (2, 8, 20, 24, 64, 24, 1),  # P2-like geometry, tiny H
        (4, 6, 16, 48, 64, 48, 3),  # P3-like, multi-class, B > block_b
        (1, 5, 8, 16, 64, 16, 1),  # odd H, small W, B=1
    ],
)
def test_fused_head_level_parity_f32(B, H, W, C, c2, c3, nc):
    rng = np.random.default_rng(0)
    mods_r, mods_c, p_r, p_c = _level_params(rng, C, c2, c3, nc)
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    proj = jnp.arange(16, dtype=jnp.float32)

    want_d, want_c = _oracle(mods_r, mods_c, p_r, p_c, x, proj, jnp.float32)
    got_d, got_c = fused_head_level(
        jnp.asarray(x), p_r, p_c, proj, nc=nc, block_b=2, interpret=True, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_c, np.float32), want_c, rtol=1e-4, atol=1e-4)


def test_fused_head_level_parity_bf16():
    """bf16 compute path agrees with the module walk run in bf16 (loose: both
    round at different points, but dist is an expectation in [0, 16])."""
    rng = np.random.default_rng(1)
    C, c2, c3, nc = 24, 64, 24, 1
    mods_r, mods_c, p_r, p_c = _level_params(rng, C, c2, c3, nc)
    x = rng.normal(0, 1, (2, 8, 20, C)).astype(np.float32)
    proj = jnp.arange(16, dtype=jnp.float32)

    want_d, want_c = _oracle(mods_r, mods_c, p_r, p_c, x, proj, jnp.bfloat16)
    got_d, got_c = fused_head_level(
        jnp.asarray(x), p_r, p_c, proj, nc=nc, block_b=2, interpret=True, dtype=jnp.bfloat16
    )
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=0.1, atol=0.15)
    np.testing.assert_allclose(np.asarray(got_c, np.float32), want_c, rtol=0.1, atol=0.2)


@pytest.mark.heavy
def test_model_predict_parts_pallas_head_matches():
    """Full-model route: predict_parts(pallas_head=True) == predict_parts."""
    from yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.fuse(model.init(0))
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32)

    want_b, want_s = model.predict_parts(params, x, dtype=jnp.float32)
    got_b, got_s = model.predict_parts(
        params, x, dtype=jnp.float32, pallas_head=True, pallas_interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-3, atol=1e-3)
