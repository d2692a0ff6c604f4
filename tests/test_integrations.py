"""Tracker integrations attach via guarded SDK imports and receive trainer
telemetry (ref: utils/callbacks/{wb,mlflow,clearml,comet,dvc}.py pattern)."""

import sys
import types

import numpy as np


def test_integrations_skip_without_sdks():
    from yolo_tpu.utils.integrations import attach

    cbs = attach({})
    # none of the SDKs are installed here → nothing attached, no crash
    assert all(not v for v in cbs.values()) or cbs == {}


def test_dvclive_stub_receives_metrics(monkeypatch):
    calls = {"metrics": [], "steps": 0, "ended": 0}

    class FakeLive:
        def __init__(self, save_dvc_exp=True):
            pass

        def log_metric(self, k, v):
            calls["metrics"].append((k, float(v)))

        def next_step(self):
            calls["steps"] += 1

        def end(self):
            calls["ended"] += 1

    fake = types.ModuleType("dvclive")
    fake.Live = FakeLive
    monkeypatch.setitem(sys.modules, "dvclive", fake)

    from yolo_tpu.utils.callbacks import run_callbacks
    from yolo_tpu.utils.integrations import attach

    cbs = attach({})
    assert cbs.get("on_fit_epoch_end"), "dvclive callbacks did not attach"

    class T:  # minimal trainer duck-type
        class args:
            project = "p"
            name = "n"

        epoch = 0
        metrics = {"mAP50": 0.5}
        _last_row = {"train/box_loss": 1.25, "epoch": 0}

    run_callbacks(cbs, "on_pretrain_routine_start", T())
    run_callbacks(cbs, "on_fit_epoch_end", T())
    run_callbacks(cbs, "on_train_end", T())
    assert ("train/box_loss", 1.25) in calls["metrics"]
    assert ("metrics/mAP50", 0.5) in calls["metrics"]
    assert calls["steps"] == 1 and calls["ended"] == 1


def test_neptune_stub_receives_metrics(monkeypatch):
    """Neptune adapter (ref: callbacks/neptune.py) logs params + appended scalars."""
    calls = {"params": None, "appended": [], "stopped": 0}

    class FakeSeries:
        def __init__(self, key):
            self.key = key

        def append(self, value=None, step=None):
            calls["appended"].append((self.key, float(value), step))

        def upload(self, path):
            calls["appended"].append((self.key, "upload", path))

    class FakeRun:
        def __init__(self):
            self.store = {}

        def __getitem__(self, k):
            return FakeSeries(k)

        def __setitem__(self, k, v):
            calls["params"] = (k, v)

        def stop(self):
            calls["stopped"] += 1

    fake = types.ModuleType("neptune")
    fake.init_run = lambda **kw: FakeRun()
    monkeypatch.setitem(sys.modules, "neptune", fake)

    from yolo_tpu.utils.callbacks import run_callbacks
    from yolo_tpu.utils.integrations import attach

    cbs = attach({})

    class T:
        class args:
            project = "p"
            name = "n"

        epoch = 2
        metrics = {"mAP50": 0.7}
        _last_row = {"train/box_loss": 0.5, "epoch": 2}

        class wdir:
            @staticmethod
            def __truediv__(other):
                raise AssertionError

    t = T()
    from pathlib import Path

    t.wdir = Path("/nonexistent")
    run_callbacks(cbs, "on_pretrain_routine_start", t)
    run_callbacks(cbs, "on_fit_epoch_end", t)
    run_callbacks(cbs, "on_train_end", t)
    assert calls["params"][0] == "Configuration/Hyperparameters"
    assert ("train/box_loss", 0.5, 3) in calls["appended"]
    assert ("metrics/mAP50", 0.7, 3) in calls["appended"]
    assert calls["stopped"] == 1


def test_raytune_stub_reports_in_session(monkeypatch):
    """Ray Tune adapter (ref: callbacks/raytune.py) reports metrics+epoch only
    inside an active tune session."""
    reports = []

    # modern Ray surface (2.38+): ray.tune.report + ray.train.get_context()
    ray = types.ModuleType("ray")
    tune_mod = types.ModuleType("ray.tune")
    train = types.ModuleType("ray.train")
    tune_mod.report = lambda d: reports.append(d)
    trial = {"id": "trial_0"}
    train.get_context = lambda: types.SimpleNamespace(get_trial_id=lambda: trial["id"])
    ray.tune = tune_mod
    ray.train = train
    for name, mod in {"ray": ray, "ray.tune": tune_mod, "ray.train": train}.items():
        monkeypatch.setitem(sys.modules, name, mod)

    from yolo_tpu.utils.callbacks import run_callbacks
    from yolo_tpu.utils.integrations import attach

    cbs = attach({})

    class T:
        class args:
            project = "p"
            name = "n"

        epoch = 4
        metrics = {"fitness": 0.9}
        _last_row = {"train/box_loss": 0.1, "epoch": 4}

    run_callbacks(cbs, "on_fit_epoch_end", T())
    assert reports and reports[0]["epoch"] == 5 and reports[0]["metrics/fitness"] == 0.9
    # outside a trial: no report
    trial["id"] = None
    run_callbacks(cbs, "on_fit_epoch_end", T())
    assert len(reports) == 1


def test_model_tune_use_ray_requires_ray():
    """Model.tune(use_ray=True) routes to run_ray_tune and guards the import
    (ref: engine/model.py tune:835 → utils/tuner.py run_ray_tune)."""
    import pytest

    from yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    with pytest.raises(ModuleNotFoundError, match="[Rr]ay"):
        m.tune(use_ray=True, data="nonexistent.yaml", iterations=1)


def test_platform_callback_gated_and_captures(tmp_path, monkeypatch):
    """platform integration (ref: callbacks/platform.py): off by default,
    enabled via the persisted settings flag; starts console capture to
    DEFAULT_LOG_PATH and logs SystemLogger metrics per epoch."""
    import yolo_tpu.utils.integrations as integ
    from yolo_tpu.utils.callbacks import run_callbacks

    # default-off: attach() without the flag must not register platform hooks
    monkeypatch.setattr(integ, "_FACTORIES", {"platform": integ._platform_callbacks})
    cbs = integ.attach({})
    assert not cbs.get("on_pretrain_routine_start")

    # flag on → hooks attach and drive capture + metrics
    monkeypatch.setattr(
        "yolo_tpu.utils.settings.get_settings", lambda: {"platform": True}
    )
    monkeypatch.chdir(tmp_path)  # DEFAULT_LOG_PATH is cwd-relative
    cbs = integ.attach({})
    assert cbs.get("on_pretrain_routine_start") and cbs.get("on_train_end")

    class T:
        pass

    t = T()
    run_callbacks(cbs, "on_pretrain_routine_start", t)
    try:
        print("platform-capture-canary")
        metrics = t.system_logger.get_metrics()
    finally:
        run_callbacks(cbs, "on_train_end", t)
    assert {"cpu", "ram", "disk", "network", "tpus"} <= set(metrics)
    assert metrics["disk"]["used_gb"] > 0
    log = (tmp_path / "train.log").read_text()
    assert "platform-capture-canary" in log
