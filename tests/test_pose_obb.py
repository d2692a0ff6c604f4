"""Pose/OBB heads: build/forward + numeric parity with the reference torch models."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.nn.tasks import OBBModel, PoseModel


def _parity(torch_model_cls, ref_yaml, ours, tol_box=5e-2, tol_rest=5e-3):
    add_reference_to_path()
    import torch

    from yolo_tpu.nn.torch_import import state_dict_to_params

    t = torch_model_cls(ref_yaml, verbose=False)
    t.eval()
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        y_t = t(torch.from_numpy(img))[0].numpy()
    import jax
    import jax.numpy as jnp

    y_j = np.asarray(jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert y_t.shape == y_j.shape, (y_t.shape, y_j.shape)
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=tol_box), np.abs(y_t[:, :4] - y_j[:, :4]).max()
    assert np.allclose(y_t[:, 4:], y_j[:, 4:], atol=5e-2), np.abs(y_t[:, 4:] - y_j[:, 4:]).max()
    return y_t, y_j


def test_pose_model_builds():
    import jax
    import jax.numpy as jnp

    m = PoseModel("yolov8n-pose.yaml")
    y = jax.jit(m.predict)(m.init(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert y.shape == (1, 4 + 1 + 51, 84)


def test_obb_model_builds():
    import jax
    import jax.numpy as jnp

    m = OBBModel("yolov8n-obb.yaml")
    y = jax.jit(m.predict)(m.init(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert y.shape == (1, 4 + 80 + 1, 84)
    angle = np.asarray(y)[:, -1]
    assert (angle >= -np.pi / 4 - 1e-3).all() and (angle <= 3 * np.pi / 4 + 1e-3).all()


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_pose_parity_with_reference():
    add_reference_to_path()
    from ultralytics.nn.tasks import PoseModel as TorchPose

    from yolo_tpu.utils import PKG_DIR

    ours = PoseModel(str(PKG_DIR / "cfg" / "models" / "v8" / "yolov8n-pose.yaml"))
    _parity(TorchPose, "/root/reference/ultralytics/cfg/models/v8/yolov8n-pose.yaml", ours)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_obb_parity_with_reference():
    add_reference_to_path()
    from ultralytics.nn.tasks import OBBModel as TorchOBB

    from yolo_tpu.utils import PKG_DIR

    ours = OBBModel(str(PKG_DIR / "cfg" / "models" / "v8" / "yolov8n-obb.yaml"))
    _parity(TorchOBB, "/root/reference/ultralytics/cfg/models/v8/yolov8n-obb.yaml", ours)
