"""YOLOv9/YOLOv10 model families: build/forward + parity with reference torch."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.nn.tasks import DetectionModel


def test_yolov9t_builds_and_forwards():
    import jax
    import jax.numpy as jnp

    m = DetectionModel("yolov9t.yaml")
    p = m.init(0)
    y = jax.jit(m.predict)(p, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert y.shape == (1, 84, 84)
    assert 1.8e6 < m.param_count(p) < 2.6e6


def test_yolov10n_end2end_predict():
    import jax
    import jax.numpy as jnp

    m = DetectionModel("yolov10n.yaml")
    p = m.init(0)
    y = jax.jit(m.predict)(p, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert y.shape == (1, 84, 6)  # (B, max_det≤A, [x, y, w, h, conf, cls])


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolov9t_parity_with_reference():
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import DetectionModel as TDM

    from yolo_tpu.nn.torch_import import state_dict_to_params
    from yolo_tpu.utils import PKG_DIR

    t = TDM("/root/reference/ultralytics/cfg/models/v9/yolov9t.yaml", verbose=False)
    t.eval()
    ours = DetectionModel(str(PKG_DIR / "cfg" / "models" / "v9" / "yolov9t.yaml"))
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        y_t = t(torch.from_numpy(img))[0].numpy()
    import jax
    import jax.numpy as jnp

    y_j = np.asarray(jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=5e-2), np.abs(y_t[:, :4] - y_j[:, :4]).max()
    assert np.allclose(y_t[:, 4:], y_j[:, 4:], atol=2e-3)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yolov10n_one2one_decode_parity():
    """Compare the decoded one2one tensor (pre-postprocess) against torch — the
    flattened-topk postprocess tie-orders differently on a random net, so the
    deterministic comparison is the decode; postprocess equivalence is checked
    separately on distinct scores."""
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import DetectionModel as TDM

    from yolo_tpu.nn.modules import Ctx
    from yolo_tpu.nn.torch_import import state_dict_to_params
    from yolo_tpu.utils import PKG_DIR

    t = TDM("/root/reference/ultralytics/cfg/models/v10/yolov10n.yaml", verbose=False)
    t.eval()
    ours = DetectionModel(str(PKG_DIR / "cfg" / "models" / "v10" / "yolov10n.yaml"))
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)

    # torch: capture head inputs, run one2one branch + _inference manually
    head = t.model[-1]
    captured = {}

    def hook(module, args):
        captured["xs"] = [a.clone() for a in args[0]]

    h = head.register_forward_pre_hook(hook)
    with torch.no_grad():
        t(torch.from_numpy(img))
    h.remove()
    xs = captured["xs"]
    with torch.no_grad():
        one2one = [torch.cat((head.one2one_cv2[i](xs[i]), head.one2one_cv3[i](xs[i])), 1) for i in range(head.nl)]
        head.shape = None  # force anchor rebuild
        y_t = head._inference(one2one).numpy()  # (1, 4+nc, A)

    import jax
    import jax.numpy as jnp

    def our_decode(p, x):
        ctx = Ctx(train=False, dtype=jnp.float32)
        feats = []
        # walk the graph but grab head inputs
        mdl = ours
        y = {}
        xx = x
        for spec in mdl.layers[:-1]:
            f = spec.f
            x_in = [xx if j == -1 else y[j] for j in f] if isinstance(f, list) else (xx if f == -1 else y[f])
            xx = spec.module(p["model"][str(spec.i)], x_in, ctx, "")
            if spec.i in mdl.save:
                y[spec.i] = xx
        head_spec = mdl.layers[-1]
        xs_j = [y[j] for j in head_spec.f]
        hp = p["model"][str(head_spec.i)]
        outs = mdl.head.one2one_forward(hp, xs_j, ctx)
        return mdl.head.decode(hp, outs, xywh=False)  # end2end boxes are xyxy

    y_j = np.asarray(jax.jit(our_decode)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert y_t.shape == y_j.shape
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=5e-2), np.abs(y_t[:, :4] - y_j[:, :4]).max()
    assert np.allclose(y_t[:, 4:], y_j[:, 4:], atol=2e-3)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_v10_postprocess_matches_reference():
    """Two-stage (anchor, class) top-k == reference Detect.postprocess on
    distinct random scores."""
    add_reference_to_path()
    import torch
    from ultralytics.nn.modules.head import Detect as RefDetect

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    B, A, nc = 2, 100, 5
    preds = np.concatenate(
        [rng.uniform(0, 600, (B, A, 4)), rng.permutation(np.linspace(0.01, 0.99, B * A * nc)).reshape(B, A, nc)], -1
    ).astype(np.float32)
    max_det = 20
    ref = RefDetect.postprocess(torch.tensor(preds), max_det, nc).numpy()

    # ours, extracted from v10Detect.decode_end2end's final stage
    boxes, scores = jnp.asarray(preds[..., :4]), jnp.asarray(preds[..., 4:])
    _, top_idx = jax.lax.top_k(scores.max(-1), max_det)
    b_sel = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    s_sel = jnp.take_along_axis(scores, top_idx[..., None], axis=1)
    flat_scores, flat_idx = jax.lax.top_k(s_sel.reshape(B, -1), max_det)
    anchor_of = flat_idx // nc
    cls = (flat_idx % nc).astype(jnp.float32)
    b_final = jnp.take_along_axis(b_sel, anchor_of[..., None], axis=1)
    out = np.asarray(jnp.concatenate([b_final, flat_scores[..., None], cls[..., None]], -1))

    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()


@pytest.mark.heavy
def test_v10_end2end_training(tmp_path):
    """v10 dual-branch training via E2EDetectLoss (ref: loss.py E2EDetectLoss
    :775 — one2many topk=10 + one2one topk=1)."""
    import cv2

    from yolo_tpu import YOLO

    root = tmp_path / "ds"
    for sub in ("images/train", "labels/train"):
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        cv2.rectangle(img, (20, 20), (44, 44), (250, 250, 250), -1)
        cv2.imwrite(str(root / "images/train" / f"{i}.jpg"), img)
        (root / "labels/train" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    (root / "d.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: t\n")

    m = YOLO("yolov10n.yaml")
    m.train(data=str(root / "d.yaml"), epochs=2, imgsz=64, batch=2, workers=1, mosaic=0.0,
            project=str(tmp_path), name="v10", val=False, plots=False, amp=False)
    import csv

    rows = list(csv.DictReader(open(tmp_path / "v10" / "results.csv")))
    assert len(rows) == 2
    # dual branches are logged separately (ref E2EDetectLoss returns concatenated comps)
    assert all(np.isfinite(float(r["train/box_o2m_loss"])) and np.isfinite(float(r["train/box_o2o_loss"])) for r in rows)
