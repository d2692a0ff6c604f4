"""Model graph construction, forward shapes, fuse parity, and — when the
read-only reference checkout is present — numeric parity against the reference
torch model as an oracle (same weights via state_dict import, same input)."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.nn.tasks import DetectionModel


def test_build_yolov8n_from_yaml():
    m = DetectionModel("yolov8n.yaml")
    assert m.nc == 80
    assert m.stride == [8, 16, 32]
    params = m.init(0)
    n = m.param_count(params)
    # yolov8n ≈ 3.15M params (incl. BN stats ~= small extra)
    assert 2.5e6 < n < 4.5e6


def test_build_yolov8_small_p2_from_yaml():
    m = DetectionModel("yolov8-small.yaml")
    assert m.nc == 1
    assert m.stride == [4, 8, 16, 32]  # P2 head added
    assert len(m.layers) == 26


def test_forward_shapes_and_anchor_count():
    import jax
    import jax.numpy as jnp

    m = DetectionModel("yolov8-small.yaml")
    params = m.init(0)
    x = jnp.zeros((1, 128, 160, 3), jnp.float32)
    preds = jax.jit(m.predict)(params, x)
    # anchors: 32*40 + 16*20 + 8*10 + 4*5 = 1700 at 128x160
    assert preds.shape == (1, 4 + 1, 1700)


def test_fuse_preserves_outputs():
    import jax
    import jax.numpy as jnp

    m = DetectionModel("yolov8n.yaml")
    params = m.init(0)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    fn = jax.jit(m.predict)
    y0 = np.asarray(fn(params, x))
    y1 = np.asarray(fn(m.fuse(params), x))
    assert np.allclose(y0, y1, atol=2e-3, rtol=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
@pytest.mark.parametrize(
    "yaml_name,ref_dir,our_dir",
    [
        ("yolov8n.yaml", "v8", "v8"),
        ("yolov8-small.yaml", "v8", "v8"),
        ("yolo11n.yaml", "11", "11"),
    ],
)
def test_numeric_parity_with_reference_oracle(yaml_name, ref_dir, our_dir):
    """Same weights, same input → same decoded output as the reference torch model."""
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

    from yolo_tpu.nn.torch_import import state_dict_to_params
    from yolo_tpu.utils import PKG_DIR

    ref_yaml = f"/root/reference/ultralytics/cfg/models/{ref_dir}/{yaml_name}"
    torch_model = TorchDetectionModel(ref_yaml, verbose=False)
    torch_model.eval()

    ours = DetectionModel(str(PKG_DIR / "cfg" / "models" / our_dir / yaml_name))
    assert [int(s) for s in torch_model.stride.tolist()] == ours.stride

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))

    rng = np.random.default_rng(42)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        y_t = torch_model(torch.from_numpy(img))[0].numpy()  # (1, 4+nc, A)

    import jax
    import jax.numpy as jnp

    y_j = np.asarray(jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert y_t.shape == y_j.shape
    # boxes are in pixels (up to 64), cls are sigmoids — check both at sane tolerances
    nc = ours.nc
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=5e-2), np.abs(y_t[:, :4] - y_j[:, :4]).max()
    assert np.allclose(y_t[:, 4 : 4 + nc], y_j[:, 4 : 4 + nc], atol=1e-3), np.abs(y_t[:, 4:] - y_j[:, 4:]).max()


def test_ensemble_nms_concat(tmp_path):
    """Ensemble concatenates member predictions on the anchor axis and runs
    through the YOLO facade end to end (ref: nn/tasks.py Ensemble:1267)."""
    import numpy as np

    from yolo_tpu import YOLO
    from yolo_tpu.nn.tasks import Ensemble

    a = DetectionModel("yolov8n.yaml")
    b = DetectionModel("yolov8s.yaml")
    ens = Ensemble([(a, a.init(0)), (b, b.init(1))])
    params = (a.init(0), b.init(1))
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype("float32")
    ya = np.asarray(a.predict(params[0], x))
    yb = np.asarray(b.predict(params[1], x))
    ye = np.asarray(ens.predict(params, x))
    assert ye.shape[-1] == ya.shape[-1] + yb.shape[-1]
    np.testing.assert_allclose(ye[..., : ya.shape[-1]], ya, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ye[..., ya.shape[-1] :], yb, rtol=1e-5, atol=1e-5)

    # facade: a weight list builds an ensemble and predicts
    pa, pb = tmp_path / "a.npz", tmp_path / "b.npz"
    YOLO("yolov8n.yaml").save(pa)
    YOLO("yolov8s.yaml").save(pb)
    m = YOLO([pa, pb])
    img = np.random.default_rng(1).integers(0, 255, (96, 96, 3), dtype=np.uint8)
    res = m.predict(img, imgsz=64, conf=0.01, verbose=False)
    assert len(res) == 1 and res[0].boxes is not None


def test_fuse_preserves_all_head_groups():
    """Review finding: fuse() used to crash on v10Detect and silently drop
    Segment's proto / extra param groups; the generic walk must keep every
    group and fold every BN."""
    import jax
    import numpy as np

    from yolo_tpu.nn.tasks import SegmentationModel

    m = DetectionModel("yolov10n.yaml")
    fp = m.fuse(m.init(0))  # used to raise AttributeError
    head = fp["model"][str(m.layers[-1].i)]
    assert "one2one_cv2" in head and "one2one_cv3" in head

    s = SegmentationModel("yolov8n-seg.yaml")
    sf = s.fuse(s.init(0))
    shead = sf["model"][str(s.layers[-1].i)]
    assert "proto" in shead and "cv4" in shead

    n = DetectionModel("yolo_nas_s.yaml")
    nf = n.fuse(n.init(0))
    bn_left = sum(
        1 for path, _ in jax.tree_util.tree_leaves_with_path(nf)
        if any(getattr(k, "key", "") == "bn" for k in path)
    )
    assert bn_left == 0, f"{bn_left} unfused BN leaves"
