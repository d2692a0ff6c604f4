"""Model-family breadth: build/forward every yaml + numeric parity of
representative members against the reference torch models."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.nn.tasks import DetectionModel

BUILD_CASES = [
    ("yolov3.yaml", 100e6, 108e6),
    ("yolov3-tiny.yaml", 11e6, 13e6),
    ("yolov3-spp.yaml", 100e6, 110e6),
    ("yolov5n.yaml", 2.2e6, 2.9e6),
    ("yolov5n6.yaml", 3.0e6, 4.5e6),
    ("yolov6n.yaml", 4.0e6, 5.0e6),
    ("yolo12n.yaml", 2.4e6, 2.8e6),
    ("yolov9s.yaml", 6.5e6, 8.0e6),
    ("yolov9m.yaml", 19e6, 22e6),
    ("yolov9c.yaml", 24e6, 27e6),
    ("yolov9e.yaml", 56e6, 60e6),
    ("yolov10s.yaml", 7.5e6, 9.0e6),
    ("yolov10m.yaml", 15e6, 18e6),
    ("yolov10b.yaml", 19e6, 22e6),
    ("yolov10l.yaml", 24e6, 28e6),
    ("yolov10x.yaml", 29e6, 34e6),
]


@pytest.mark.parametrize("name,lo,hi", BUILD_CASES)
def test_family_builds_and_forwards(name, lo, hi):
    import jax
    import jax.numpy as jnp

    m = DetectionModel(name)
    p = m.init(0)
    sz = 128 if "p6" in str(m.yaml.get("yaml_file", "")) or "n6" in name else 64
    y = jax.jit(m.predict)(p, jnp.zeros((1, sz, sz, 3), jnp.float32))
    assert lo < m.param_count(p) < hi, m.param_count(p)
    assert np.isfinite(np.asarray(y)).all()


def _parity(ref_yaml, our_name, cls=None, atol_box=5e-2, atol_cls=2e-3, size=64, check_feats=False):
    add_reference_to_path()
    import torch
    from ultralytics.nn.modules.conv import Conv as RefConv
    from ultralytics.nn.tasks import DetectionModel as TDM

    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp

    # the reference's `activation:` yaml override mutates Conv.default_act
    # globally — snapshot/restore so one oracle build can't pollute the next
    prev_act = RefConv.default_act
    try:
        t = TDM(ref_yaml, verbose=False)
    finally:
        RefConv.default_act = prev_act
    t.eval()
    ours = (cls or DetectionModel)(our_name)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        y_t = t(torch.from_numpy(img))[0].numpy()
    y_j = np.asarray(jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert y_t.shape == y_j.shape, (y_t.shape, y_j.shape)
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=atol_box), np.abs(y_t[:, :4] - y_j[:, :4]).max()
    assert np.allclose(y_t[:, 4:], y_j[:, 4:], atol=atol_cls), np.abs(y_t[:, 4:] - y_j[:, 4:]).max()
    if check_feats:  # random-init head outputs are bias-dominated; also pin an
        # early feature map so activation-function mismatches can't slip through
        from yolo_tpu.nn.modules import Ctx

        with torch.no_grad():
            f_t = t.model[0](torch.from_numpy(img)).numpy().transpose(0, 2, 3, 1)
        f_j = np.asarray(
            ours.layers[0].module(params["model"]["0"], jnp.asarray(img.transpose(0, 2, 3, 1)), Ctx(train=False, dtype=jnp.float32))
        )
        assert np.allclose(f_t, f_j, atol=1e-4), np.abs(f_t - f_j).max()


REF = "/root/reference/ultralytics/cfg/models"


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolov5n_parity():
    _parity(f"{REF}/v5/yolov5.yaml", "yolov5n.yaml", check_feats=True)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolov3_tiny_parity():
    _parity(f"{REF}/v3/yolov3-tiny.yaml", "yolov3-tiny.yaml")


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolov6n_parity():
    """v6 exercises the yaml `activation:` ReLU override."""
    _parity(f"{REF}/v6/yolov6.yaml", "yolov6n.yaml", check_feats=True)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolov9e_parity():
    """v9e exercises CBLinear/CBFuse aux-branch fusion."""
    _parity(f"{REF}/v9/yolov9e.yaml", "yolov9e.yaml")


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolo12n_parity():
    """yolo12 exercises the area-attention A2C2f/ABlock stack."""
    _parity(f"{REF}/12/yolo12.yaml", "yolo12n.yaml")


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolo11n_seg_parity():
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import SegmentationModel as TSM

    from yolo_tpu.nn.tasks import SegmentationModel
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp

    t = TSM(f"{REF}/11/yolo11-seg.yaml", verbose=False)
    t.eval()
    ours = SegmentationModel("yolo11n-seg.yaml")
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out = t(torch.from_numpy(img))
    y_t = out[0].numpy()
    protos_t = out[1][2].numpy()  # eval output: (cat([dets, mc], 1), (feats, mc, protos))
    y_j, protos_j = jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    y_j = np.asarray(y_j)
    protos_j = np.asarray(protos_j).transpose(0, 3, 1, 2)
    nc = ours.nc
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=5e-2), np.abs(y_t[:, :4] - y_j[:, :4]).max()
    assert np.allclose(y_t[:, 4 : 4 + nc], y_j[:, 4 : 4 + nc], atol=2e-3)
    assert np.allclose(y_t[:, 4 + nc :], y_j[:, 4 + nc :], atol=5e-3)  # mask coefs
    assert np.allclose(protos_t, protos_j, atol=5e-3)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolo11n_pose_parity():
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import PoseModel as TPM

    from yolo_tpu.nn.tasks import PoseModel
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp

    t = TPM(f"{REF}/11/yolo11-pose.yaml", verbose=False)
    t.eval()
    ours = PoseModel("yolo11n-pose.yaml")
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        y_t = t(torch.from_numpy(img))[0].numpy()
    y_j = np.asarray(jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert y_t.shape == y_j.shape
    assert np.allclose(y_t, y_j, atol=5e-2), np.abs(y_t - y_j).max()


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_rtdetr_l_parity():
    """RT-DETR-L: HGNetV2 + AIFI + deformable decoder. Query top-k tie-order is
    backend-dependent, so detections compare as a score-sorted set."""
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import RTDETRDetectionModel as TRT

    from yolo_tpu.nn.tasks import RTDETRDetectionModel
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp

    torch.manual_seed(0)  # reproducible weights → distinct top scores regardless of test order
    t = TRT(f"{REF}/rt-detr/rtdetr-l.yaml", verbose=False)
    t.eval()
    ours = RTDETRDetectionModel("rtdetr-l.yaml")
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        out = t(torch.from_numpy(img))
    y_t = (out[0] if isinstance(out, tuple) else out).numpy()[0]  # (300, 4+nc)
    y_j = np.asarray(jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))[0]
    assert y_t.shape == y_j.shape

    def by_score(y):
        return y[np.argsort(-y[:, 4:].max(-1))]

    s_t, s_j = by_score(y_t), by_score(y_j)
    # top detections have distinct scores → stable order across backends
    assert np.allclose(s_t[:100, 4:], s_j[:100, 4:], atol=1e-3), np.abs(s_t[:100, 4:] - s_j[:100, 4:]).max()
    assert np.allclose(s_t[:100, :4], s_j[:100, :4], atol=1e-3), np.abs(s_t[:100, :4] - s_j[:100, :4]).max()
    # the full 300-query set matches as a multiset
    assert np.allclose(np.sort(y_t.ravel()), np.sort(y_j.ravel()), atol=1e-3)


def test_rtdetr_builds_and_facade_predicts():
    from yolo_tpu import RTDETR

    m = RTDETR("rtdetr-l.yaml")
    assert getattr(m.model, "is_rtdetr", False)
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
    res = m.predict(img, conf=1e-4, imgsz=128, verbose=False)
    r = res[0]
    assert r.boxes is not None and len(r.boxes) > 0
    assert np.isfinite(r.boxes.xyxy).all()


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_c2_ghost_resnet_module_parity():
    """C2 / GhostConv / GhostBottleneck / ResNetLayer vs reference torch
    modules (ref: block.py C2:266, GhostBottleneck:441, ResNetLayer:555;
    conv.py GhostConv:331)."""
    add_reference_to_path()
    import torch
    from ultralytics.nn.modules.block import C2 as RefC2
    from ultralytics.nn.modules.block import GhostBottleneck as RefGB
    from ultralytics.nn.modules.block import ResNetLayer as RefRL
    from ultralytics.nn.modules.conv import GhostConv as RefGC

    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.modules import C2, Ctx, GhostBottleneck, GhostConv, ResNetLayer
    from yolo_tpu.nn.torch_import import state_dict_to_params

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 16, 16, 16)).astype(np.float32)

    cases = [
        (RefC2(16, 32, n=2), C2(16, 32, n=2)),
        (RefGC(16, 32, 3, 1), GhostConv(16, 32, 3, 1)),
        (RefGB(16, 32, 3, 2), GhostBottleneck(16, 32, 3, 2)),
        (RefRL(16, 8, 2, False, 2), ResNetLayer(16, 8, 2, False, 2)),
        (RefRL(3, 16, 1, True, 1), ResNetLayer(3, 16, 1, True, 1)),
    ]
    for ref, ours in cases:
        torch.manual_seed(1)
        ref.eval()
        cin = 3 if getattr(ours, "is_first", False) else 16
        xi = x[..., :cin]
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items() if "num_batches" not in k}
        params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))
        with torch.no_grad():
            y_t = ref(torch.tensor(xi.transpose(0, 3, 1, 2))).numpy()
        ctx = Ctx(train=False, dtype=jnp.float32)
        y_j = np.asarray(jax.jit(lambda p, z: ours(p, z, ctx))(params, jnp.asarray(xi)))
        y_j = y_j.transpose(0, 3, 1, 2)
        assert y_t.shape == y_j.shape, (type(ref).__name__, y_t.shape, y_j.shape)
        assert np.allclose(y_t, y_j, atol=2e-3), (type(ref).__name__, np.abs(y_t - y_j).max())


def test_every_shipped_model_yaml_builds():
    """Every model yaml shipped in yolo_tpu/cfg/models builds standalone —
    no reference checkout required (the inventory is a superset of the
    reference's cfg/models tree minus nothing)."""
    from pathlib import Path

    from yolo_tpu.nn.tasks import model_class_for
    from yolo_tpu.utils import yaml_load

    root = Path(__file__).resolve().parents[1] / "yolo_tpu" / "cfg" / "models"
    fails = []
    for f in sorted(root.rglob("*.yaml")):
        cfg = yaml_load(f)
        cfg["scale"] = cfg.get("scale") or (sorted(cfg["scales"])[0] if cfg.get("scales") else "")
        try:
            model_class_for(cfg)(dict(cfg))
        except Exception as e:
            fails.append((f.name, f"{type(e).__name__}: {e}"))
    assert not fails, fails


def test_torchvision_resnet18_cls_forward():
    """yolo11-cls-resnet18 (native TorchVision resnet18 backbone) runs a
    jitted classification forward at the expected logit shape."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.tasks import model_class_for
    from yolo_tpu.utils import yaml_load

    from pathlib import Path

    f = Path(__file__).resolve().parents[1] / "yolo_tpu" / "cfg" / "models" / "11" / "yolo11-cls-resnet18.yaml"
    cfg = yaml_load(f)
    cfg["nc"] = 7
    model = model_class_for(cfg)(dict(cfg))
    params = model.init(seed=0)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    y = jax.jit(lambda p, z: model.predict(p, z))(params, x)
    assert y.shape == (2, 7)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_every_reference_model_yaml_builds():
    """Completeness sweep: every model yaml shipped by the reference builds
    through our graph compiler (the generic TorchVision wrapper is the one
    documented exception — it loads torch-hub backbones)."""
    from pathlib import Path

    from yolo_tpu.nn.tasks import model_class_for
    from yolo_tpu.utils import yaml_load

    fails = []
    for f in sorted(Path("/root/reference/ultralytics/cfg/models").rglob("*.yaml")):
        cfg = yaml_load(f)
        cfg["scale"] = cfg.get("scale") or (sorted(cfg["scales"])[0] if cfg.get("scales") else "")
        try:
            model_class_for(cfg)(dict(cfg))
        except NotImplementedError as e:
            if "TorchVision" in str(e):
                continue
            fails.append((f.name, str(e)))
        except Exception as e:
            fails.append((f.name, f"{type(e).__name__}: {e}"))
    assert not fails, fails
