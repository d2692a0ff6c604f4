"""Filesystem helpers + unicode-safe image IO.

Reference counterparts: ultralytics/utils/files.py (WorkingDirectory:15,
spaces_in_path:58, increment_path:109, file_age/date/size:157-179,
get_latest_run:181) and ultralytics/utils/patches.py imread/imwrite:20-71 —
cv2.imread/imwrite fail on non-ASCII paths (the reference repo's own assets
carry Chinese filenames), so IO goes through np.fromfile + imdecode/imencode.
"""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np


def imread(filename, flags=None):
    """Unicode-path-safe cv2.imread (ref: patches.py imread:20)."""
    import cv2

    flags = cv2.IMREAD_COLOR if flags is None else flags
    try:
        buf = np.fromfile(str(filename), np.uint8)
    except OSError:
        return None
    if buf.size == 0:
        return None
    return cv2.imdecode(buf, flags)


def imwrite(filename, img, params=None) -> bool:
    """Unicode-path-safe cv2.imwrite (ref: patches.py imwrite:47)."""
    import cv2

    try:
        ok, buf = cv2.imencode(Path(str(filename)).suffix or ".png", img, params or [])
        if not ok:
            return False
        buf.tofile(str(filename))
        return True
    except Exception:
        return False


class WorkingDirectory(contextlib.ContextDecorator):
    """cd into a directory for the scope of a with-block or decorated call
    (ref: files.py WorkingDirectory:15)."""

    def __init__(self, new_dir):
        self.dir = str(new_dir)
        self.cwd = None

    def __enter__(self):
        self.cwd = os.getcwd()
        os.chdir(self.dir)
        return self

    def __exit__(self, *exc):
        os.chdir(self.cwd)


@contextlib.contextmanager
def spaces_in_path(path):
    """Yield a temp copy of `path` without spaces, syncing changes back on
    exit (ref: files.py spaces_in_path:58 — some external tools choke on
    spaces)."""
    path = Path(path)
    if " " not in str(path):
        yield path
        return
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp) / path.name.replace(" ", "_")
        if path.is_dir():
            shutil.copytree(path, tmp_path)
        elif path.is_file():
            tmp_path.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(path, tmp_path)
        try:
            yield tmp_path
        finally:
            if tmp_path.is_dir():
                shutil.copytree(tmp_path, path, dirs_exist_ok=True)
            elif tmp_path.is_file():
                shutil.copy2(tmp_path, path)


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp → runs/exp2, exp3, ... (ref: files.py increment_path:109)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 10_000):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def file_age(path=__file__) -> int:
    """Days since last modification (ref: files.py file_age:157)."""
    return int((time.time() - Path(path).stat().st_mtime) // 86400)


def file_date(path=__file__) -> str:
    """'YYYY-M-D' of last modification (ref: files.py file_date:163)."""
    t = time.localtime(Path(path).stat().st_mtime)
    return f"{t.tm_year}-{t.tm_mon}-{t.tm_mday}"


def file_size(path) -> float:
    """Size in MB; directories recurse (ref: files.py file_size:169)."""
    path = Path(path)
    mb = 1 << 20
    if path.is_file():
        return path.stat().st_size / mb
    if path.is_dir():
        return sum(f.stat().st_size for f in path.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent last.npz under search_dir, for resume= (ref: files.py
    get_latest_run:181 — the torch version looks for last.pt)."""
    ckpts = glob.glob(f"{search_dir}/**/last*.npz", recursive=True)
    return max(ckpts, key=os.path.getctime) if ckpts else ""
