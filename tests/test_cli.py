"""CLI entrypoint tests (ref: tests/test_cli.py pattern — task×mode k=v parsing)."""

import os

import numpy as np
import pytest

from yolo_tpu.cfg import check_cfg, entrypoint, get_cfg, parse_key_value_pair, smart_value


def test_smart_value_typing():
    assert smart_value("none") is None
    assert smart_value("True") is True
    assert smart_value("false") is False
    assert smart_value("0.25") == 0.25
    assert smart_value("640") == 640
    assert smart_value("[640,512]") == [640, 512]
    assert smart_value("yolov8n.yaml") == "yolov8n.yaml"


def test_parse_key_value_pair():
    assert parse_key_value_pair("conf=0.3") == ("conf", 0.3)
    assert parse_key_value_pair("model=foo.yaml") == ("model", "foo.yaml")
    with pytest.raises(SyntaxError):
        parse_key_value_pair("conf=")


def test_get_cfg_rejects_unknown_keys():
    with pytest.raises(SyntaxError) as e:
        get_cfg(overrides={"conff": 0.5})
    assert "conf" in str(e.value)  # fuzzy suggestion offered


def test_check_cfg_type_validation():
    with pytest.raises(ValueError):
        check_cfg({"conf": 1.5})  # fraction key out of range
    with pytest.raises(TypeError):
        check_cfg({"epochs": "ten"})


def test_entrypoint_version_and_help(capsys):
    assert entrypoint(["version"]) is None
    assert entrypoint([]) is None


def test_entrypoint_checks():
    assert entrypoint(["checks"]) is None


def test_entrypoint_predict_smoke(tmp_path):
    import cv2

    img = np.full((64, 64, 3), 30, np.uint8)
    cv2.circle(img, (32, 32), 5, (250, 250, 250), -1)
    src = tmp_path / "img.png"
    cv2.imwrite(str(src), img)
    results = entrypoint(
        ["detect", "predict", "model=yolov8n.yaml", f"source={src}", "imgsz=64", "conf=0.9", "verbose=False"]
    )
    assert isinstance(results, list) and len(results) == 1


def test_cli_solutions_count(tmp_path, monkeypatch):
    """`yolo solutions count source=<clip>` processes a video end to end
    (ref: cfg/__init__.py handle_yolo_solutions:637)."""
    import cv2

    from yolo_tpu.cfg import entrypoint

    monkeypatch.chdir(tmp_path)
    vid = tmp_path / "c.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for _ in range(4):
        vw.write(np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8))
    vw.release()
    sol = entrypoint(["solutions", "count", f"source={vid}", "model=yolov8n.yaml", "conf=0.9", "imgsz=64"])
    assert sol is not None
    assert (tmp_path / "runs" / "solutions" / "count" / "out.mp4").exists()


def test_cli_solutions_usage():
    from yolo_tpu.cfg import entrypoint

    assert entrypoint(["solutions"]) is None
    assert entrypoint(["solutions", "nope"]) is None


def test_settings_manager(tmp_path, monkeypatch):
    """SettingsManager: defaults, persistence, update, reset, corruption reset
    (ref: utils/__init__.py SettingsManager:1264, cfg handle_yolo_settings:594)."""
    import yolo_tpu.utils.settings as S

    f = tmp_path / "settings.json"
    s = S.SettingsManager(file=f)
    assert f.is_file() and s["settings_version"] == S.SETTINGS_VERSION
    s.update({"runs_dir": str(tmp_path / "r")})
    s.save()
    s2 = S.SettingsManager(file=f)
    assert s2["runs_dir"] == str(tmp_path / "r")
    try:
        s2.update({"bogus_key": 1})
        raise AssertionError("unknown key accepted")
    except KeyError:
        pass
    s2.reset()
    assert S.SettingsManager(file=f)["runs_dir"] == s2.defaults["runs_dir"]
    f.write_text("{not json")  # corrupted file resets instead of raising
    s3 = S.SettingsManager(file=f)
    assert s3["settings_version"] == S.SETTINGS_VERSION

    # CLI surface routes through the persistent manager
    monkeypatch.setattr(S, "_SETTINGS", None)
    monkeypatch.setattr(S, "SETTINGS_FILE", f)
    from yolo_tpu.cfg import handle_yolo_settings

    out = handle_yolo_settings([f"weights_dir={tmp_path / 'w'}"])
    assert out["weights_dir"] == str(tmp_path / "w")
    assert S.SettingsManager(file=f)["weights_dir"] == str(tmp_path / "w")


def test_cli_cfg_copycfg_hub(tmp_path, monkeypatch, capsys):
    """`yolo cfg`, `yolo copy-cfg`, and the hub login/logout specials
    (ref cfg/__init__.py :863 cfg printer, copy_default_cfg, handle_yolo_hub)."""
    import importlib

    prev = os.environ.get("YOLO_TPU_CONFIG_DIR", "/tmp/yolo_tpu_test_config")
    monkeypatch.setenv("YOLO_TPU_CONFIG_DIR", str(tmp_path / "cfgdir"))
    import yolo_tpu.utils.settings as S

    importlib.reload(S)
    monkeypatch.chdir(tmp_path)
    from yolo_tpu.cfg import entrypoint

    entrypoint(["cfg"])  # prints the default config — must not raise
    entrypoint(["copy-cfg"])
    assert (tmp_path / "default_copy.yaml").exists()
    entrypoint(["hub", "login", "k123"])
    assert S.get_settings().get("api_key") == "k123"
    from yolo_tpu.hub import Auth

    assert Auth().api_key == "k123"  # persisted key feeds sessions
    try:
        entrypoint(["logout"])
        assert S.get_settings().get("api_key") == ""
    finally:
        # restore the suite-wide isolation dir (conftest) — deleting the var
        # would reload the REAL user config into later tests
        monkeypatch.setenv("YOLO_TPU_CONFIG_DIR", prev)
        importlib.reload(S)
