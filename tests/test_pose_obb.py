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


@pytest.fixture(scope="module")
def tiny_pose_dataset(tmp_path_factory):
    """8 synthetic frames, one bright 'figure' each with 4 keypoints
    (head, center, left-foot, right-foot) — pose-format label rows."""
    import cv2

    root = tmp_path_factory.mktemp("posetiny")
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    W, H = 160, 128
    for i in range(8):
        img = rng.normal(30, 8, (H, W, 3)).clip(0, 255).astype(np.uint8)
        cx, cy = rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7)
        w, h = 0.2, 0.3
        x1, y1, x2, y2 = (cx - w / 2) * W, (cy - h / 2) * H, (cx + w / 2) * W, (cy + h / 2) * H
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), (220, 220, 220), -1)
        kpts = [
            (cx, cy - h / 2 + 0.02, 2),  # head
            (cx, cy, 2),  # center
            (cx - w / 4, cy + h / 2 - 0.02, 2),  # left foot
            (cx + w / 4, cy + h / 2 - 0.02, 1),  # right foot (occluded)
        ]
        for kx, ky, _ in kpts:
            cv2.circle(img, (int(kx * W), int(ky * H)), 2, (40, 40, 40), -1)
        row = f"0 {cx:.4f} {cy:.4f} {w:.4f} {h:.4f} " + " ".join(
            f"{kx:.4f} {ky:.4f} {v}" for kx, ky, v in kpts
        )
        cv2.imwrite(str(img_dir / f"{i}.png"), img)
        (lbl_dir / f"{i}.txt").write_text(row + "\n")
    yaml = root / "dataset.yaml"
    yaml.write_text(
        f"path: {root}\ntrain: images/train\nval: images/train\n"
        "kpt_shape: [4, 3]\nflip_idx: [0, 1, 3, 2]\nnames:\n  0: person\n"
    )
    return str(yaml)


def test_pose_dataset_loads_keypoints(tiny_pose_dataset):
    from yolo_tpu.cfg import get_cfg
    from yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from yolo_tpu.data.dataset import check_det_dataset

    data = check_det_dataset(tiny_pose_dataset)
    assert data["kpt_shape"] == [4, 3]
    cfg = get_cfg(overrides={"imgsz": 160, "mosaic": 1.0})
    ds = build_yolo_dataset(cfg, data["train"], 4, data, mode="train", stride=32)
    assert ds.kpt_shape == (4, 3)
    loader = build_dataloader(ds, batch=4, workers=1, seed=0)
    b = next(iter(loader))
    assert "keypoints" in b and b["keypoints"].shape[1:] == (64, 4, 3)
    vis = b["keypoints"][..., 2] != 0
    assert vis.sum() > 0
    # visible keypoint coords are normalized and inside their boxes (loosely)
    k = b["keypoints"][vis]
    assert (k[:, :2] >= 0).all() and (k[:, :2] <= 1.0 + 1e-6).all()


def test_pose_training_loss_drops(tiny_pose_dataset, tmp_path):
    from yolo_tpu import YOLO

    m = YOLO("yolov8n-pose.yaml")
    assert m.task == "pose"
    metrics = m.train(
        data=tiny_pose_dataset,
        epochs=3,
        imgsz=160,
        batch=4,
        workers=1,
        optimizer="AdamW",
        lr0=0.002,
        warmup_epochs=0.5,
        mosaic=0.0,
        project=str(tmp_path),
        name="pexp",
        val=True,
        plots=False,
        amp=False,
    )
    assert metrics is not None
    # dataset kpt_shape [4,3] overrode the yaml's [17,3]
    assert m.trainer.model.head.kpt_shape == (4, 3)
    import csv

    rows = list(csv.DictReader(open(tmp_path / "pexp" / "results.csv")))
    assert len(rows) == 3
    for comp in ("box", "pose", "kobj", "cls", "dfl"):
        assert np.isfinite(float(rows[-1][f"train/{comp}_loss"]))


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_rotated_nms_parity_with_reference():
    add_reference_to_path()
    import math
    import torch
    from ultralytics.utils.nms import TorchNMS
    from ultralytics.utils.metrics import batch_probiou

    from yolo_tpu.ops.nms import nms_rotated_fixed

    rng = np.random.default_rng(8)
    n = 60
    rb = np.concatenate(
        [rng.uniform(20, 100, (n, 2)), rng.uniform(8, 30, (n, 2)), rng.uniform(0, math.pi / 2, (n, 1))], -1
    ).astype(np.float32)
    scores = rng.uniform(0.05, 0.95, n).astype(np.float32)

    ref_keep = TorchNMS.fast_nms(torch.tensor(rb), torch.tensor(scores), 0.45, iou_func=batch_probiou).numpy()

    import jax.numpy as jnp

    keep_idx, keep_valid = nms_rotated_fixed(jnp.asarray(rb), jnp.asarray(scores), 0.45, max_det=n)
    ours = np.asarray(keep_idx)[np.asarray(keep_valid)]
    assert set(ours.tolist()) == set(ref_keep.tolist()), (sorted(ours.tolist()), sorted(ref_keep.tolist()))


@pytest.fixture(scope="module")
def tiny_obb_dataset(tmp_path_factory):
    """8 synthetic frames with 1-2 rotated bright rectangles, DOTA-format labels
    (cls + 4 normalized corner points)."""
    import cv2

    root = tmp_path_factory.mktemp("obbtiny")
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(9)
    W, H = 160, 160
    for i in range(8):
        img = rng.normal(30, 8, (H, W, 3)).clip(0, 255).astype(np.uint8)
        lines = []
        for _ in range(rng.integers(1, 3)):
            cx, cy = rng.uniform(0.3, 0.7) * W, rng.uniform(0.3, 0.7) * H
            w, h = rng.uniform(0.15, 0.3) * W, rng.uniform(0.08, 0.15) * H
            ang = rng.uniform(0, 180)
            pts = cv2.boxPoints(((cx, cy), (w, h), ang))  # (4, 2) pixel corners
            cv2.fillPoly(img, [pts.astype(np.int32)], (230, 230, 230))
            norm = (pts / np.array([W, H])).clip(0, 1).reshape(-1)
            lines.append("0 " + " ".join(f"{v:.5f}" for v in norm))
        cv2.imwrite(str(img_dir / f"{i}.png"), img)
        (lbl_dir / f"{i}.txt").write_text("\n".join(lines) + "\n")
    yaml = root / "dataset.yaml"
    yaml.write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: object\n")
    return str(yaml)


def test_obb_dataset_loads_xywhr(tiny_obb_dataset):
    from yolo_tpu.cfg import get_cfg
    from yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from yolo_tpu.data.dataset import check_det_dataset

    data = check_det_dataset(tiny_obb_dataset)
    cfg = get_cfg(overrides={"imgsz": 160, "task": "obb"})
    ds = build_yolo_dataset(cfg, data["train"], 4, data, mode="val", stride=32)
    assert ds.task == "obb"
    loader = build_dataloader(ds, batch=4, workers=1, seed=0)
    b = next(iter(loader))
    assert b["bboxes"].shape[-1] == 5  # xywhr
    m = b["mask_gt"] > 0
    rb = b["bboxes"][m]
    assert (rb[:, 2:4] > 0).all()  # positive wh
    assert (rb[:, 4] >= 0).all() and (rb[:, 4] < np.pi / 2 + 1e-6).all()  # angle folded


def test_obb_training_loss_drops(tiny_obb_dataset, tmp_path):
    from yolo_tpu import YOLO

    m = YOLO("yolov8n-obb.yaml")
    assert m.task == "obb"
    m.train(
        data=tiny_obb_dataset,
        epochs=6,
        imgsz=160,
        batch=4,
        workers=1,
        optimizer="AdamW",
        lr0=0.002,
        warmup_epochs=0.5,
        mosaic=0.0,
        project=str(tmp_path),
        name="oexp",
        val=True,
        plots=False,
        amp=False,
    )
    import csv

    rows = list(csv.DictReader(open(tmp_path / "oexp" / "results.csv")))
    assert len(rows) == 6
    for comp in ("box", "cls", "dfl"):
        assert np.isfinite(float(rows[-1][f"train/{comp}_loss"]))
    # micro-train signal: the best later epoch beats epoch 1 on total loss
    # (per-epoch trajectories are sensitive to the seeded augmentation stream)
    def total(r):
        return sum(float(r[f"train/{c}_loss"]) for c in ("box", "cls", "dfl"))

    assert min(total(r) for r in rows[1:]) < total(rows[0])  # rotated loss learns


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_kpt_iou_parity_with_reference():
    add_reference_to_path()
    import torch
    from ultralytics.utils.metrics import kpt_iou as ref_kpt_iou, OKS_SIGMA as REF_SIGMA

    from yolo_tpu.utils.metrics import OKS_SIGMA, kpt_iou

    rng = np.random.default_rng(12)
    N, M, nkpt = 5, 7, 17
    gt = rng.uniform(0, 200, (N, nkpt, 3)).astype(np.float32)
    gt[..., 2] = rng.integers(0, 3, (N, nkpt))
    pred = rng.uniform(0, 200, (M, nkpt, 3)).astype(np.float32)
    area = rng.uniform(500, 5000, N).astype(np.float32)

    ref = ref_kpt_iou(torch.tensor(gt), torch.tensor(pred), area=torch.tensor(area), sigma=REF_SIGMA).numpy()
    ours = kpt_iou(gt, pred, area, OKS_SIGMA)
    assert np.allclose(ours, ref, atol=1e-5), np.abs(ours - ref).max()
