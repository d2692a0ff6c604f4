"""Export formats: npz/orbax roundtrip, StableHLO serialize + re-execute."""

import numpy as np
import pytest

from yolo_tpu.nn.tasks import DetectionModel


@pytest.fixture(scope="module")
def small_model():
    m = DetectionModel("yolov8n.yaml")
    return m, m.init(0)


def test_npz_roundtrip(small_model, tmp_path):
    import jax
    import jax.numpy as jnp

    from yolo_tpu.engine.exporter import load_npz, save_npz

    model, params = small_model
    path = save_npz(model, params, tmp_path / "m.npz", meta={"note": "test"})
    model2, params2, meta = load_npz(path)
    assert meta["note"] == "test"
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    y1 = np.asarray(jax.jit(model.predict)(params, x))
    y2 = np.asarray(jax.jit(model2.predict)(params2, x))
    assert np.allclose(y1, y2, atol=1e-5)


def test_orbax_roundtrip(small_model, tmp_path):
    from yolo_tpu.engine.exporter import load_orbax, save_orbax

    model, params = small_model
    d = save_orbax(model, params, tmp_path / "ckpt")
    model2, params2, info = load_orbax(d)
    import jax

    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    assert len(leaves1) == len(leaves2)
    assert all(np.allclose(a, b) for a, b in zip(leaves1, leaves2))


def test_stablehlo_export_and_reexecute(small_model, tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from yolo_tpu.engine.exporter import export_stablehlo

    model, params = small_model
    path = export_stablehlo(model, params, imgsz=64, filename=tmp_path / "m.stablehlo")
    blob = path.read_bytes()
    assert len(blob) > 1000
    exported = jax_export.deserialize(blob)
    x = np.zeros((1, 64, 64, 3), np.uint8)
    y = exported.call(params, x)
    assert np.asarray(y).shape == (1, 84, 84)


def test_exporter_dispatch(small_model, tmp_path, monkeypatch):
    from yolo_tpu.engine.exporter import Exporter

    model, params = small_model
    monkeypatch.chdir(tmp_path)
    out = Exporter(args={"format": "npz", "model": "yolov8n.yaml"})(model, params)
    assert out.exists()
    with pytest.raises(ValueError):
        Exporter(args={"format": "tensorrt"})(model, params)
