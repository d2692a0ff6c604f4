"""Progress bar + bf16 sanity check (ref: utils/tqdm.py TQDM:18,
utils/checks.py check_amp:735 and its trainer wiring trainer.py:288)."""

import io
import os

import numpy as np
import pytest


# --------------------------------------------------------------------------- #
# TQDM
# --------------------------------------------------------------------------- #
def test_tqdm_iterates_and_renders():
    from yolo_tpu.utils.tqdm import TQDM

    buf = io.StringIO()
    out = list(TQDM(range(7), desc="work", file=buf, mininterval=0.0))
    assert out == list(range(7))
    text = buf.getvalue()
    assert "work" in text and "7/7" in text and "100%" in text


def test_tqdm_manual_and_context():
    from yolo_tpu.utils.tqdm import TQDM

    buf = io.StringIO()
    with TQDM(total=100, unit="B", unit_scale=True, file=buf, mininterval=0.0) as bar:
        bar.update(50_000)
        bar.set_description("download")
        bar.set_postfix(speed="fast")
    text = buf.getvalue()
    assert "download" in text and "k" in text  # unit scaling kicked in
    assert "speed=fast" in text


def test_tqdm_no_total_and_disable():
    from yolo_tpu.utils.tqdm import TQDM

    buf = io.StringIO()
    bar = TQDM(total=None, file=buf, mininterval=0.0, desc="d")
    bar.update(3)
    bar.close()
    assert "3" in buf.getvalue()

    buf2 = io.StringIO()
    for _ in TQDM(range(5), disable=True, file=buf2):
        pass
    assert buf2.getvalue() == ""


def test_tqdm_write_does_not_crash():
    from yolo_tpu.utils.tqdm import TQDM

    buf = io.StringIO()
    TQDM.write("hello", file=buf)
    assert buf.getvalue() == "hello\n"


# --------------------------------------------------------------------------- #
# check_amp
# --------------------------------------------------------------------------- #
class _FakeModel:
    """Duck-types model.predict(params, x, dtype=...) for check_amp."""

    def __init__(self, bf16_breaks: bool):
        self.bf16_breaks = bf16_breaks

    def predict(self, params, x, dtype=None):
        import jax.numpy as jnp

        B = x.shape[0]
        base = jnp.ones((B, 5, 16), jnp.float32)
        if self.bf16_breaks and dtype == jnp.bfloat16:
            return base + 100.0  # wildly divergent halved path
        return base


def test_check_amp_pass_and_fail():
    from yolo_tpu.utils.checks import check_amp

    assert check_amp(_FakeModel(bf16_breaks=False), params={}) is True
    assert check_amp(_FakeModel(bf16_breaks=True), params={}) is False


def test_trainer_amp_fallback(monkeypatch, tmp_path):
    """Trainer's train() runs the sanity check and flips args.amp→False when it
    fails (ref: trainer.py:288 falls back on failed check_amp)."""
    import cv2

    monkeypatch.delenv("YOLO_TPU_SKIP_AMP_CHECK", raising=False)
    import yolo_tpu.utils.checks as checks_mod

    seen = {}

    def fake_check(model, params):
        seen["called"] = True
        return False

    monkeypatch.setattr(checks_mod, "check_amp", fake_check)

    # 2-image throwaway dataset — train() needs a loader before the guard runs
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"{i}.png"), np.full((64, 64, 3), 30, np.uint8))
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.1 0.1\n")
    yaml = tmp_path / "d.yaml"
    yaml.write_text(f"path: {tmp_path}\ntrain: images/train\nval: images/train\nnames:\n  0: t\n")

    from yolo_tpu.engine.trainer import DetectionTrainer

    class Stop(Exception):
        pass

    # the guard sits just before _build_step — stop there, no training needed
    monkeypatch.setattr(
        DetectionTrainer, "_build_step", lambda self, mesh: (_ for _ in ()).throw(Stop())
    )
    tr = DetectionTrainer(
        overrides={"model": "yolov8n.yaml", "data": str(yaml), "amp": True,
                   "epochs": 1, "imgsz": 64, "batch": 2, "workers": 0, "plots": False}
    )
    assert tr.args.amp is True
    with pytest.raises(Stop):
        tr.train()
    assert seen.get("called") and tr.args.amp is False


def test_autodevice_select_idle(capsys):
    """TPUInfo ranks devices by free HBM; CPU backends fall back to stable order."""
    from yolo_tpu.utils.autodevice import TPUInfo, select_idle_device

    info = TPUInfo()
    assert len(info.device_stats) >= 1
    assert {"index", "name", "memory_total", "memory_used", "memory_free"} <= set(info.device_stats[0])
    info.print_status()  # must not crash without memory stats
    picked = select_idle_device(count=1)
    assert len(picked) == 1
    import jax

    assert picked[0] in jax.devices()
    # over-asking warns and returns what exists
    many = info.select_idle_device(count=10_000)
    assert len(many) == len(jax.devices())
