"""Segmentation model: build/forward, mask assembly, and numeric parity of the
full Segment forward against the reference torch model."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.nn.tasks import SegmentationModel


def test_seg_model_builds_and_forwards():
    import jax
    import jax.numpy as jnp

    m = SegmentationModel("yolov8n-seg.yaml")
    params = m.init(0)
    preds, protos = jax.jit(m.predict)(params, jnp.zeros((2, 64, 64, 3), jnp.float32))
    assert preds.shape == (2, 4 + 80 + 32, 84)
    assert protos.shape == (2, 16, 16, 32)
    n = m.param_count(params)
    assert 3.0e6 < n < 4.0e6  # yolov8n-seg ≈ 3.4M


def test_process_mask_crops_and_upsamples():
    import jax.numpy as jnp

    from yolo_tpu.ops.masks import process_mask

    rng = np.random.default_rng(0)
    protos = rng.normal(0, 1, (16, 16, 32)).astype(np.float32)
    coefs = rng.normal(0, 1, (3, 32)).astype(np.float32)
    boxes = np.array([[8, 8, 40, 40], [0, 0, 64, 64], [50, 50, 60, 60]], np.float32)
    masks = np.asarray(process_mask(jnp.asarray(protos), jnp.asarray(coefs), jnp.asarray(boxes), (64, 64)))
    assert masks.shape == (3, 64, 64)
    assert masks[0, 0, 0] == 0.0  # outside box 0
    assert masks[0, 20, 20] > 0.0 or masks[0].max() >= 0  # inside can be any prob
    assert (masks >= 0).all() and (masks <= 1).all()


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_segment_parity_with_reference():
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import SegmentationModel as TorchSeg

    from yolo_tpu.nn.torch_import import state_dict_to_params
    from yolo_tpu.utils import PKG_DIR

    t = TorchSeg("/root/reference/ultralytics/cfg/models/v8/yolov8n-seg.yaml", verbose=False)
    t.eval()
    ours = SegmentationModel(str(PKG_DIR / "cfg" / "models" / "v8" / "yolov8n-seg.yaml"))
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_t = t(torch.from_numpy(img))
    # eval output: (cat([dets, mc], 1), (feats, mc, protos))
    y_t = out_t[0].numpy()
    protos_t = out_t[1][2].numpy()  # (1, 32, 16, 16)

    import jax
    import jax.numpy as jnp

    y_j, protos_j = jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    y_j = np.asarray(y_j)
    protos_j = np.asarray(protos_j).transpose(0, 3, 1, 2)
    assert y_t.shape == y_j.shape
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=5e-2)
    assert np.allclose(y_t[:, 4:84], y_j[:, 4:84], atol=1e-3)  # cls sigmoids
    assert np.allclose(y_t[:, 84:], y_j[:, 84:], atol=5e-3)  # mask coefs
    assert np.allclose(protos_t, protos_j, atol=5e-3), np.abs(protos_t - protos_j).max()


def test_segment_predict_e2e():
    from yolo_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    assert m.task == "segment"
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
    res = m.predict(img, conf=1e-4, imgsz=64, verbose=False)
    r = res[0]
    assert hasattr(r, "masks")
    if len(r.boxes):
        assert r.masks.data.shape == (len(r.boxes), 96, 128)


def test_segment_training_step(tmp_path):
    """Segment trainer: polygons → overlap maps → seg loss; short run stays finite."""
    import cv2

    root = tmp_path / "segds"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.normal(40, 6, (96, 96, 3)).clip(0, 255).astype(np.uint8)
        cx, cy, r = rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7), 0.12
        cv2.circle(img, (int(cx * 96), int(cy * 96)), int(r * 96), (250,) * 3, -1)
        # polygon approximating the circle (normalized)
        ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        poly = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], -1).clip(0, 1)
        cv2.imwrite(str(root / f"images/train/{i}.png"), img)
        (root / f"labels/train/{i}.txt").write_text("0 " + " ".join(f"{v:.4f}" for v in poly.flatten()) + "\n")
    (root / "dataset.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames: {{0: t}}\n")

    from yolo_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    metrics = m.train(
        data=str(root / "dataset.yaml"), epochs=2, imgsz=96, batch=4, workers=1, mosaic=0.0,
        optimizer="AdamW", lr0=0.002, amp=False, val=True,
        project=str(tmp_path / "runs"), name="seg", exist_ok=True,
    )
    import csv

    rows = list(csv.DictReader(open(tmp_path / "runs" / "seg" / "results.csv")))
    assert len(rows) == 2
    for r in rows:
        for k in ("train/box_loss", "train/seg_loss", "train/cls_loss", "train/dfl_loss"):
            assert np.isfinite(float(r[k])), (k, r[k])
    assert m.model.task == "segment" and m.model.nc == 1


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_mask_iou_parity_with_reference():
    add_reference_to_path()
    import torch
    from ultralytics.utils.metrics import mask_iou as ref_mask_iou

    from yolo_tpu.utils.metrics import mask_iou

    rng = np.random.default_rng(6)
    gm = (rng.uniform(0, 1, (4, 1600)) > 0.6).astype(np.float32)
    pm = (rng.uniform(0, 1, (6, 1600)) > 0.6).astype(np.float32)
    ref = ref_mask_iou(torch.tensor(gm), torch.tensor(pm)).numpy()
    ours = mask_iou(gm, pm)
    assert np.allclose(ours, ref, atol=1e-6)


def test_overlap_false_per_instance_masks():
    """overlap_mask=False: per-instance mask tensors through collate + loss
    (ref: v8SegmentationLoss masks[target_gt_idx] path)."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.data.dataset import collate_batch
    from yolo_tpu.nn.modules import Ctx
    from yolo_tpu.nn.tasks import SegmentationModel
    from yolo_tpu.utils.loss import v8SegmentationLoss
    from yolo_tpu.cfg import get_cfg

    rng = np.random.default_rng(0)
    # two OVERLAPPING instances — the overlap map loses covered pixels, the
    # per-instance encoding must keep both full masks
    tri1 = np.array([[8, 8], [56, 8], [32, 56]], np.float32)
    tri2 = np.array([[16, 16], [60, 20], [40, 60]], np.float32)
    sample = {
        "img": rng.integers(0, 255, (64, 64, 3), np.uint8),
        "cls": np.array([0.0, 0.0], np.float32),
        "bboxes": np.array([[8, 8, 56, 56], [16, 16, 60, 60]], np.float32),
        "segments": [tri1, tri2],
    }
    b_ov = collate_batch([dict(sample)], max_boxes=8, overlap=True)
    b_pi = collate_batch([dict(sample)], max_boxes=8, overlap=False)
    assert b_ov["masks"].shape == (1, 16, 16)
    assert b_pi["masks"].shape == (1, 8, 16, 16)
    # overlapping region: per-instance keeps both, the overlap map only one
    both = (b_pi["masks"][0, 0] > 0) & (b_pi["masks"][0, 1] > 0)
    assert both.sum() > 0

    m = SegmentationModel("yolov8n-seg.yaml", nc=1)
    p = m.init(0)
    loss_fn = v8SegmentationLoss(m, get_cfg())

    def fl(params, batch):
        ctx = Ctx(train=True, dtype=jnp.float32)
        feats = m.forward_features(params, jnp.asarray(batch["img"], jnp.float32) / 255.0, ctx)
        total, comps = loss_fn(feats, {k: jnp.asarray(v) for k, v in batch.items() if k != "meta"})
        return total, comps

    for b in (b_ov, b_pi):
        (total, comps), grads = jax.jit(jax.value_and_grad(fl, has_aux=True))(p, b)
        assert np.isfinite(float(total))
        g = float(jnp.abs(grads["model"]["0"]["conv"]["weight"]).sum())
        assert g > 0
