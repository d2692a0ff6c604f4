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
