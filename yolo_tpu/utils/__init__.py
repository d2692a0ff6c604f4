"""Core utilities: logging, YAML IO, namespaces, profiling.

TPU-native counterpart of the reference's ``ultralytics/utils/__init__.py``
(LOGGER :391-462, YAML :506, IterableSimpleNamespace :277) — re-designed, not ported.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import yaml

# Root paths -----------------------------------------------------------------
PKG_DIR = Path(__file__).resolve().parents[1]  # yolo_tpu/
ROOT = PKG_DIR.parent  # repo root
DEFAULT_CFG_PATH = PKG_DIR / "cfg" / "default.yaml"

RANK = int(os.getenv("RANK", -1))
VERBOSE = str(os.getenv("YOLO_VERBOSE", True)).lower() == "true"

# Logging ---------------------------------------------------------------------


def set_logging(name: str = "yolo_tpu", verbose: bool = True) -> logging.Logger:
    """Configure and return the package logger (rank-aware like the reference)."""
    level = logging.INFO if verbose and RANK in {-1, 0} else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        logger.addHandler(handler)
    logger.propagate = False
    return logger


LOGGER = set_logging(verbose=VERBOSE)


def colorstr(*input):
    """Colorize a string with ANSI codes, e.g. colorstr('blue', 'bold', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_red": "\033[91m", "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bright_blue": "\033[94m", "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


# YAML ------------------------------------------------------------------------


def yaml_load(file, append_filename: bool = False) -> dict:
    """Load a YAML file into a dict (optionally record its path under 'yaml_file')."""
    path = Path(file)
    with open(path, errors="ignore", encoding="utf-8") as f:
        data = yaml.safe_load(f.read()) or {}
    if append_filename:
        data["yaml_file"] = str(path)
    return data


def yaml_save(file, data: dict | None = None, header: str = ""):
    """Save a dict to a YAML file, converting non-serializable values to str."""
    data = data or {}
    path = Path(file)
    path.parent.mkdir(parents=True, exist_ok=True)
    clean = {}
    for k, v in data.items():
        if isinstance(v, Path):
            v = str(v)
        elif isinstance(v, (np.integer,)):
            v = int(v)
        elif isinstance(v, (np.floating,)):
            v = float(v)
        elif v is not None and not isinstance(v, (bool, int, float, str, list, dict, tuple)):
            v = str(v)
        clean[k] = v
    with open(path, "w", errors="ignore", encoding="utf-8") as f:
        if header:
            f.write(header)
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


def yaml_print(data):
    """Pretty-print a dict/namespace as YAML."""
    d = vars(data) if isinstance(data, SimpleNamespace) else data
    LOGGER.info(yaml.safe_dump(d, sort_keys=False, allow_unicode=True))


# Namespaces -------------------------------------------------------------------


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that supports iteration over (key, value) and dict-like get."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


# Profiling --------------------------------------------------------------------


class Profile:
    """Context-manager / decorator timer.

    TPU analogue of the reference's CUDA-synchronized ``Profile`` (utils/ops.py:18):
    callers pass outputs through ``block`` so XLA async dispatch is flushed before
    the clock stops.
    """

    def __init__(self, t: float = 0.0):
        self.t = t  # accumulated seconds
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt

    def __str__(self):
        return f"Elapsed time is {self.t} s"

    @staticmethod
    def block(x):
        """Block on a jax pytree so timing includes device execution."""
        try:
            import jax

            jax.block_until_ready(x)
        except Exception:
            pass
        return x


class TryExcept:
    """Context manager / decorator that logs exceptions instead of raising."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """Increment a path, e.g. runs/exp → runs/exp2, runs/exp3 … (ref: utils/files.py)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        base, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{base}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path
