"""int8 PTQ inference path (nn/quantize.py): numeric agreement with the f32
graph + int8 conv leaves actually engaged."""

import numpy as np
import pytest


def test_quantized_predict_agrees_with_f32():
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.quantize import quantize_params
    from yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    p = m.fuse(m.init(0))
    qp = quantize_params(p)

    # int8 leaves exist
    import jax.tree_util as jtu

    leaves = jtu.tree_leaves_with_path(qp)
    n_int8 = sum(1 for path, v in leaves if getattr(v, "dtype", None) == np.int8)
    assert n_int8 > 20, n_int8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y_f = np.asarray(jax.jit(m.predict)(p, x))
    y_q = np.asarray(jax.jit(m.predict)(qp, x))
    assert y_f.shape == y_q.shape
    # class probabilities: small absolute deviation; boxes: small relative
    assert np.abs(y_f[:, 4:] - y_q[:, 4:]).max() < 0.1, np.abs(y_f[:, 4:] - y_q[:, 4:]).max()
    box_err = np.abs(y_f[:, :4] - y_q[:, :4]) / (np.abs(y_f[:, :4]) + 1.0)
    assert np.median(box_err) < 0.05, float(np.median(box_err))


def test_quantize_skips_unfused_and_small_layers():
    from yolo_tpu.nn.quantize import quantize_params
    from yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    p = m.init(0)  # NOT fused — bn still present
    qp = quantize_params(p)
    # nothing quantized without fusing first
    import jax.tree_util as jtu

    assert all(getattr(v, "dtype", None) != np.int8 for _, v in jtu.tree_leaves_with_path(qp))


@pytest.mark.heavy
def test_calibrated_static_scales_match_dynamic():
    """calibrate_act_scales + quantize_params(act_scales=...) produces outputs
    close to the dynamic-quant path when the eval inputs match the
    calibration distribution (static scales are upper bounds of the same
    max)."""
    import numpy as np

    from yolo_tpu.nn.quantize import calibrate_act_scales, quantize_params
    from yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    fused = m.fuse(m.init(0))
    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    scales = calibrate_act_scales(m, fused, x)
    assert scales and all(s > 0 for s in scales.values())

    q_dyn = quantize_params(fused)
    q_sta = quantize_params(fused, act_scales=scales)
    # static params actually carry the scales
    def count_xscale(t):
        if isinstance(t, dict):
            return ("x_scale" in t) + sum(count_xscale(v) for v in t.values())
        return 0
    assert count_xscale(q_sta) > 10 and count_xscale(q_dyn) == 0

    y_dyn = np.asarray(m.predict(q_dyn, x))
    y_sta = np.asarray(m.predict(q_sta, x))
    # same int8 machinery, same data distribution → near-identical outputs
    denom = np.abs(y_dyn).max()
    assert np.abs(y_sta - y_dyn).max() / max(denom, 1e-6) < 0.1


def test_qtensor_module_paths():
    """int8-resident flow unit checks: qconcat rescale, int8 maxpool, C2f
    split, upsample passthrough (modules.QTensor)."""
    import jax.numpy as jnp
    import numpy as np

    from yolo_tpu.nn import modules as M

    rng = np.random.default_rng(0)
    # qconcat: two QTensors with different scales concat to max scale within
    # 0.5 LSB of the dequantized concat
    a = rng.integers(-127, 128, (1, 4, 4, 8)).astype(np.int8)
    b = rng.integers(-127, 128, (1, 4, 4, 8)).astype(np.int8)
    qa = M.QTensor(jnp.asarray(a), jnp.float32(0.02))
    qb = M.QTensor(jnp.asarray(b), jnp.float32(0.05))
    out = M.qconcat([qa, qb], jnp.float32)
    assert isinstance(out, M.QTensor) and abs(float(out.s) - 0.05) < 1e-6
    dense = np.concatenate([a * 0.02, b * 0.05], axis=-1)
    got = np.asarray(M.deq(out, jnp.float32))
    # 0.5 LSB of the target scale + bf16 ratio rounding (~0.4% of |x|)
    assert np.abs(got - dense).max() <= 0.5 * 0.05 + 0.004 * np.abs(dense).max()

    # mixed inputs dequantize
    out2 = M.qconcat([qa, jnp.ones((1, 4, 4, 2), jnp.float32)], jnp.float32)
    assert not isinstance(out2, M.QTensor) and out2.shape[-1] == 10

    # SPPF int8 pool == float pool of the dequantized tensor
    spp = M.SPPF(16, 16, k=5)
    q = rng.integers(-127, 128, (1, 8, 8, 16)).astype(np.int8)
    pooled_q = np.asarray(spp._pool_int8(jnp.asarray(q)))
    pooled_f = np.asarray(spp._pool(jnp.asarray(q, jnp.float32) * 0.03))
    assert np.allclose(pooled_q * 0.03, pooled_f)

    # Upsample keeps int8 + scale
    up = M.Upsample(scale_factor=2)
    uo = up({}, M.QTensor(jnp.asarray(q), jnp.float32(0.03)), M.Ctx())
    assert isinstance(uo, M.QTensor) and uo.q.shape == (1, 16, 16, 16) and uo.q.dtype == jnp.int8


def test_int8_flow_predict_agrees_with_f32():
    """End-to-end: QTensor-flow predict stays close to the float forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_tpu.nn.quantize import calibrate_act_scales, quantize_params
    from yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    fused = m.fuse(m.init(0))
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    scales = calibrate_act_scales(m, fused, x)
    assert any(k.startswith("OUT::") for k in scales), "output scales recorded"
    qp = quantize_params(fused, act_scales=scales, int8_flow=True)
    # y_scale present → the graph runs int8-resident
    leaves = []

    def find(n):
        if isinstance(n, dict):
            if "y_scale" in n:
                leaves.append(n)
            for v in n.values():
                find(v)

    find(qp)
    assert leaves, "int8-resident y_scales attached"
    y_f = np.asarray(jax.jit(m.predict)(fused, x))
    y_q = np.asarray(jax.jit(m.predict)(qp, x))
    # boxes within a few px, scores within ~0.1 on an untrained net
    assert np.abs(y_f[:, :4] - y_q[:, :4]).max() < 6.0
    assert np.abs(y_f[:, 4:] - y_q[:, 4:]).max() < 0.15


@pytest.mark.heavy  # compiles int8 predict for 3 extra architectures
def test_int8_flow_uncovered_architectures_run():
    """The int8-resident flow must not crash architectures with blocks that
    have no native QTensor path (C3k2 children, C2PSA attention, ...):
    flow_paths restricts QTensor emission to covered subtrees and the graph
    walker dequantizes inputs to uncovered layer classes."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.quantize import calibrate_act_scales, quantize_params
    from yolo_tpu.nn.tasks import DetectionModel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    # yolo11n: C3k2/C2PSA attention; yolov9s: RepConv/ELAN; yolov10n: C2fCIB
    # whose CIB residual receives the int8-resident split half
    for yaml in ("yolo11n.yaml", "yolov9s.yaml", "yolov10n.yaml"):
        m = DetectionModel(yaml)
        p = m.fuse(m.init(0))
        scales = calibrate_act_scales(m, p, x)
        flow = m.int8_flow_paths()
        assert flow, yaml  # covered convs exist in every family
        qp = quantize_params(p, act_scales=scales, flow_paths=flow)
        y_f = np.asarray(jax.jit(m.predict)(p, x))
        y_q = np.asarray(jax.jit(m.predict)(qp, x))  # crashed before flow_paths
        assert y_q.shape == y_f.shape and np.isfinite(y_q).all()
        assert np.abs(y_f[:, 4:] - y_q[:, 4:]).max() < 0.15
