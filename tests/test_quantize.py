"""int8 PTQ inference path (nn/quantize.py): numeric agreement with the f32
graph + int8 conv leaves actually engaged."""

import numpy as np


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
