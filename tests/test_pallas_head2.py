"""Channel-major fused head kernel (ops/pallas_head2.py) parity.

Kernel runs in interpret mode on the CPU backend (the conftest forces
JAX_PLATFORMS=cpu); parity target is the shipping XLA route
(Detect._branch_walk + dfl_project / DetectionModel.predict_parts).
Ref anchor: ultralytics/nn/modules/head.py Detect.forward:119 + _inference:152.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_tpu.nn.modules import Ctx, Detect, dfl_project  # noqa: E402
from yolo_tpu.nn.tasks import DetectionModel  # noqa: E402


def _fused_level(chain):
    """ConvBNAct init params -> fused {conv: {weight, bias}} (BN folded)."""
    out = {}
    for j in ("0", "1"):
        w = chain[j]["conv"]["weight"]
        bn = chain[j]["bn"]
        g = bn["weight"] / np.sqrt(bn["running_var"] + 1e-3)
        out[j] = {"conv": {"weight": w * g, "bias": bn["bias"] - bn["running_mean"] * g}}
    out["2"] = chain["2"]
    return out


@pytest.mark.parametrize("H,W,C,nc", [(8, 20, 24, 1), (7, 16, 16, 3)])
def test_level_kernel_matches_walk(H, W, C, nc):
    from yolo_tpu.ops.pallas_head2 import head_level_cm

    rng = np.random.default_rng(0)
    head = Detect(nc=nc, ch=(C,))
    p = head.init(rng)
    hp = {
        "cv2": {"0": _fused_level(p["cv2"]["0"])},
        "cv3": {"0": _fused_level(p["cv3"]["0"])},
        "dfl": p["dfl"],
    }
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, C)).astype(np.float32))
    ctx = Ctx(train=False, dtype=jnp.float32)
    bins, clss, _ = head._branch_walk(hp, [x], ctx)
    proj = np.arange(16, dtype=np.float32)
    dist_ref = dfl_project(bins[0].reshape(2, H * W, 4, 16), jnp.asarray(proj))
    cls_ref = jax.nn.sigmoid(clss[0].astype(jnp.float32))
    dist_k, cls_k = head_level_cm(x, hp["cv2"]["0"], hp["cv3"]["0"], proj, nc, interpret=True, dtype=jnp.float32)
    assert np.abs(np.asarray(dist_ref) - np.asarray(dist_k)).max() < 1e-4
    assert np.abs(np.asarray(cls_ref) - np.asarray(cls_k)).max() < 1e-5


@pytest.mark.heavy
def test_full_model_parts_route():
    """predict_parts(pallas_head2=True) == predict_parts on the flagship
    graph (all four levels through the kernel where tiles exist)."""
    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.fuse(model.init(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 1)).astype(np.float32))
    b0, s0 = model.predict_parts(params, x, dtype=jnp.float32)
    b1, s1 = model.predict_parts(params, x, dtype=jnp.float32, pallas_head2=True, pallas_interpret=True)
    assert np.abs(np.asarray(b0) - np.asarray(b1)).max() < 2e-3
    assert np.abs(np.asarray(s0) - np.asarray(s1)).max() < 1e-4


@pytest.mark.heavy
def test_level_restriction_knob():
    """pallas_head2_levels=(0,) routes only P2 through the kernel; the rest
    take the XLA walk — outputs identical either way."""
    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.fuse(model.init(0))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 1)).astype(np.float32))
    b0, s0 = model.predict_parts(params, x, dtype=jnp.float32)
    b1, s1 = model.predict_parts(
        params, x, dtype=jnp.float32, pallas_head2=True, pallas_interpret=True, pallas_head2_levels=(0,)
    )
    assert np.abs(np.asarray(b0) - np.asarray(b1)).max() < 2e-3
    assert np.abs(np.asarray(s0) - np.asarray(s1)).max() < 1e-4
