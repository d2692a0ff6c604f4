"""Config system: default.yaml + typed overrides + CLI parsing.

Mirrors the reference's behavior (ref: ultralytics/cfg/__init__.py: get_cfg:279,
check_cfg:327, smart_value:783, entrypoint:828) with the same key surface; the
implementation is fresh.
"""

from __future__ import annotations

import difflib
import shutil
import sys

import numpy as np
from pathlib import Path
from types import SimpleNamespace

from yolo_tpu.utils import DEFAULT_CFG_PATH, LOGGER, IterableSimpleNamespace, colorstr, increment_path, yaml_load

# Typed key groups (validation mirrors reference check_cfg:327) -----------------
CFG_FLOAT_KEYS = frozenset({"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time", "workspace", "batch"})
CFG_FRACTION_KEYS = frozenset(
    {
        "dropout", "lrf", "momentum", "weight_decay", "warmup_momentum", "warmup_bias_lr",
        "hsv_h", "hsv_s", "hsv_v", "translate", "scale", "perspective", "flipud", "fliplr",
        "bgr", "mosaic", "mixup", "cutmix", "copy_paste", "conf", "iou", "fraction", "erasing", "lr0",
    }
)
CFG_INT_KEYS = frozenset(
    {
        "epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio", "max_det",
        "vid_stride", "line_width", "nbs", "save_period", "opset", "n_devices",
    }
)
CFG_BOOL_KEYS = frozenset(
    {
        "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
        "overlap_mask", "val", "save_json", "half", "dnn", "plots", "show", "save_txt",
        "save_conf", "save_crop", "save_frames", "show_labels", "show_conf", "visualize",
        "augment", "agnostic_nms", "retina_masks", "show_boxes", "keras", "optimize",
        "dynamic", "simplify", "nms", "profile", "multi_scale", "stream_buffer", "donate",
        "remat",
    }
)

TASKS = {"detect", "segment", "classify", "pose", "obb"}
MODES = {"train", "val", "predict", "export", "track", "benchmark", "tune"}

DEFAULT_CFG_DICT = {k: (None if v == "None" else v) for k, v in yaml_load(DEFAULT_CFG_PATH).items()}
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)


def cfg2dict(cfg) -> dict:
    """Convert a cfg (path / str / dict / namespace) to a plain dict."""
    if isinstance(cfg, (str, Path)):
        cfg = yaml_load(cfg)
    elif isinstance(cfg, SimpleNamespace):
        cfg = vars(cfg)
    return dict(cfg)


def check_cfg(cfg: dict, hard: bool = True):
    """Type/value-check config entries in place (mirrors reference semantics)."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS and not isinstance(v, (int, float)):
            if hard:
                raise TypeError(f"'{k}={v}' must be an int or float")
            cfg[k] = float(v)
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                if hard:
                    raise TypeError(f"'{k}={v}' must be an int or float")
                cfg[k] = v = float(v)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"'{k}={v}' must be between 0.0 and 1.0")
        elif k in CFG_INT_KEYS and not isinstance(v, int):
            if hard:
                raise TypeError(f"'{k}={v}' must be an int")
            cfg[k] = int(v)
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            if hard:
                raise TypeError(f"'{k}={v}' must be a bool")
            cfg[k] = bool(v)


def check_dict_alignment(base: dict, custom: dict, e=None):
    """Raise with fuzzy suggestions when a custom key isn't in the base config."""
    mismatched = [k for k in custom if k not in base]
    if mismatched:
        msgs = []
        for x in mismatched:
            matches = difflib.get_close_matches(x, list(base), n=3, cutoff=0.5)
            matches = [f"{m}={base[m]}" if base.get(m) is not None else m for m in matches]
            msgs.append(f"'{x}' is not a valid key. Similar: {matches}")
        raise SyntaxError("\n".join(msgs)) from e


def get_cfg(cfg=DEFAULT_CFG_DICT, overrides: dict | None = None) -> IterableSimpleNamespace:
    """Merge base cfg and overrides into a validated namespace."""
    cfg = cfg2dict(cfg)
    if overrides:
        overrides = cfg2dict(overrides)
        overrides.pop("save_dir", None)
        check_dict_alignment(cfg, overrides)
        cfg = {**cfg, **overrides}
    for k in ("project", "name"):  # str-ify numeric project/name
        if k in cfg and isinstance(cfg[k], (int, float)):
            cfg[k] = str(cfg[k])
    if cfg.get("name") == "model" and cfg.get("model"):
        cfg["name"] = str(cfg["model"]).split(".")[0]
    check_cfg(cfg)
    return IterableSimpleNamespace(**cfg)


def get_save_dir(args, name: str | None = None) -> Path:
    """Compute the run save directory (ref: cfg/__init__.py:389)."""
    if getattr(args, "save_dir", None):
        return Path(args.save_dir)
    if args.project:
        project = Path(args.project)
    else:
        # persisted runs_dir from `yolo settings` (ref get_save_dir:389 uses
        # SETTINGS runs_dir); defaults to ./runs
        try:
            from yolo_tpu.utils.settings import get_settings

            runs = Path(get_settings().get("runs_dir") or "runs")
        except Exception:
            runs = Path("runs")
        project = runs / args.task
    name = name or args.name or f"{args.mode}"
    return increment_path(Path(project) / name, exist_ok=getattr(args, "exist_ok", False))


def smart_value(v: str):
    """Convert a CLI string to its most natural python type."""
    low = v.lower()
    if low == "none":
        return None
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        import ast

        return ast.literal_eval(v)
    except Exception:
        return v


def parse_key_value_pair(pair: str):
    """Parse one 'key=value' CLI token."""
    k, v = pair.split("=", 1)
    k, v = k.strip(), v.strip()
    if not v:
        raise SyntaxError(f"missing value for '{k}='")
    return k, smart_value(v)


def find_model_yaml(name: str) -> Path | None:
    """Resolve a model yaml name to a file under yolo_tpu/cfg/models/**."""
    p = Path(name)
    if p.exists():
        return p
    models_dir = Path(DEFAULT_CFG_PATH).parent / "models"
    hits = sorted(models_dir.rglob(p.name))
    return hits[0] if hits else None


def entrypoint(argv: list[str] | None = None):
    """CLI: ``yolo <task> <mode> k=v ...`` (ref: cfg/__init__.py:828)."""
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        LOGGER.info(f"usage: yolo TASK MODE ARGS\n  tasks: {TASKS}\n  modes: {MODES}\n  args: k=v pairs overriding cfg/default.yaml")
        return None

    overrides = {}
    task, mode = None, None
    for a in args:
        if "=" in a:
            k, v = parse_key_value_pair(a)
            if k == "cfg":  # custom config file
                overrides.update(yaml_load(v))
            else:
                overrides[k] = v
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        elif a in ("help", "-h", "--help"):
            return entrypoint([])
        elif a == "version":
            from yolo_tpu import __version__

            LOGGER.info(__version__)
            return None
        elif a == "settings":
            return handle_yolo_settings(args[args.index(a) + 1 :])
        elif a == "checks":
            from yolo_tpu.utils.checks import collect_system_info

            LOGGER.info(collect_system_info())
            return None
        elif a == "solutions":
            return handle_yolo_solutions(args[args.index(a) + 1 :])
        elif a == "cfg":  # bare `yolo cfg`: print the default config (ref :863)
            LOGGER.info(Path(__file__).with_name("default.yaml").read_text())
            return None
        elif a == "copy-cfg":  # copy default.yaml to cwd for editing (ref copy_default_cfg)
            dst = Path.cwd() / "default_copy.yaml"
            dst.write_text(Path(__file__).with_name("default.yaml").read_text())
            LOGGER.info(f"{dst} copied — edit and use with: yolo cfg={dst} <task> <mode>")
            return None
        elif a in ("hub", "login", "logout"):
            return handle_yolo_hub(args[args.index(a) :])
        else:
            check_dict_alignment(DEFAULT_CFG_DICT, {a: ""})

    mode = mode or overrides.pop("mode", None) or DEFAULT_CFG.mode or "predict"
    if mode not in MODES:
        raise ValueError(f"invalid mode '{mode}', valid: {MODES}")
    task = task or overrides.pop("task", None)

    model = overrides.pop("model", DEFAULT_CFG.model) or "yolov8n.yaml"
    name = str(model).lower()
    # family routing (ref: cfg/__init__.py entrypoint model dispatch)
    if "yolo_nas" in name:
        from yolo_tpu import NAS as model_cls

        yolo = model_cls(model)
    elif "world" in name:
        from yolo_tpu import YOLOWorld as model_cls

        yolo = model_cls(model)
    elif "yoloe" in name:
        from yolo_tpu import YOLOE as model_cls

        yolo = model_cls(model)
    else:
        from yolo_tpu import YOLO

        yolo = YOLO(model, task=task)
    return getattr(yolo, mode)(**overrides)


SOLUTIONS_MAP = {
    "count": "ObjectCounter",
    "heatmap": "Heatmap",
    "speed": "SpeedEstimator",
    "queue": "QueueManager",
    "blur": "ObjectBlurrer",
    "crop": "ObjectCropper",
    "trackzone": "TrackZone",
    "visioneye": "VisionEye",
    "isegment": "InstanceSegmentation",
    "inference": "WebInference",
}


def handle_yolo_settings(args: list[str]):
    """`yolo settings [reset | key=value ...]` — view/update/reset the persisted
    user settings JSON (ref: cfg/__init__.py handle_yolo_settings:594)."""
    from yolo_tpu.utils.settings import get_settings

    settings = get_settings()
    if args:
        if args[0] == "reset":
            settings.reset()
            LOGGER.info("Settings reset successfully")
        elif any("=" not in a for a in args):
            # `yolo settings show` (or any bare word) → print, don't traceback
            LOGGER.info("usage: yolo settings [reset | key=value ...] — current settings:")
        else:
            new = dict(parse_key_value_pair(a) for a in args)
            check_dict_alignment(dict(settings), new)
            settings.update(new)
            settings.save()
            for k, v in new.items():
                LOGGER.info(f"Updated '{k}={v}'")
    LOGGER.info("\n".join(f"{k}={v}" for k, v in settings.items()))
    return settings


def handle_yolo_hub(args: list[str]):
    """`yolo hub login [KEY] | hub logout | login | logout` — persist/clear the
    hub api key (ref: cfg/__init__.py handle_yolo_hub:585 → hub.login/logout);
    the key feeds hub.Auth / HUBTrainingSession (YOLO_TPU_HUB_KEY also works)."""
    from yolo_tpu.utils.settings import get_settings

    cmd = args[1] if args and args[0] == "hub" and len(args) > 1 else (args[0] if args else "")
    rest = args[2:] if args and args[0] == "hub" else args[1:]
    settings = get_settings()
    if cmd == "login":
        key = rest[0] if rest else ""
        if not key:
            LOGGER.info("usage: yolo login API_KEY")
            return None
        settings.update({"api_key": key})
        settings.save()
        from yolo_tpu.hub import Auth

        ok = Auth(api_key=key).authenticate()
        LOGGER.info("logged in" + ("" if ok else " (recorded locally; hub endpoint unreachable)"))
    elif cmd == "logout":
        settings.update({"api_key": ""})
        settings.save()
        LOGGER.info("logged out — api_key cleared")
    else:
        LOGGER.info("usage: yolo hub login API_KEY | yolo hub logout")
    return None


def handle_yolo_solutions(args: list[str]):
    """`yolo solutions NAME source=... k=v` (ref: cfg/__init__.py
    handle_yolo_solutions:637): stream a video/camera source through a
    solution, writing the annotated output next to runs/solutions."""
    import yolo_tpu.solutions as S

    if not args or args[0] not in SOLUTIONS_MAP:
        LOGGER.info(f"usage: yolo solutions NAME k=v — names: {sorted(SOLUTIONS_MAP)}")
        return None
    name = args[0]
    kv = dict(parse_key_value_pair(a) for a in args[1:] if "=" in a)
    source = kv.pop("source", None)
    if name == "inference":
        port = int(kv.pop("port", 8080))  # pop BEFORE construction — not a WebInference kwarg
        wi = S.WebInference(model=kv.pop("model", "yolov8n.yaml"), source=source or 0, **kv)
        wi.serve(port=port)
        return wi
    sol = getattr(S, SOLUTIONS_MAP[name])(**kv)
    if source is None:
        LOGGER.info("pass source=<video|camera-id>")
        return sol
    import cv2

    cap = cv2.VideoCapture(int(source) if str(source).isdigit() else str(source))
    save_dir = Path("runs") / "solutions" / name
    save_dir.mkdir(parents=True, exist_ok=True)
    writer = None
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        out = sol.process(frame)
        img = out if isinstance(out, np.ndarray) else getattr(out, "plot_im", frame)
        if writer is None:
            writer = cv2.VideoWriter(str(save_dir / "out.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 30, (img.shape[1], img.shape[0]))
        writer.write(img)
        n += 1
    cap.release()
    if writer:
        writer.release()
    LOGGER.info(f"solutions/{name}: {n} frames -> {save_dir / 'out.mp4'}")
    return sol


def copy_default_cfg():
    """Copy default.yaml to cwd as default_copy.yaml for user editing."""
    new_file = Path.cwd() / (DEFAULT_CFG_PATH.name.replace(".yaml", "_copy.yaml"))
    shutil.copy2(DEFAULT_CFG_PATH, new_file)
    LOGGER.info(f"{colorstr('green', 'copied')} {DEFAULT_CFG_PATH} -> {new_file}")
    return new_file
