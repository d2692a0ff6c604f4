"""Git metadata without the git binary (ref: ultralytics/utils/git.py GitRepo:9).

Reads HEAD / packed-refs / config straight off disk so provenance (branch,
commit, origin) is available for run logging even in restricted environments
with no `git` executable.
"""

from __future__ import annotations

import re
from functools import cached_property
from pathlib import Path


class GitRepo:
    """Lazily resolved branch/commit/origin metadata for the repo containing `path`."""

    def __init__(self, path: Path | str = Path(__file__).resolve()):
        p = Path(path)
        self.root = next((d for d in [p] + list(p.parents) if (d / ".git").exists()), None)
        self.gitdir = self._resolve_gitdir(self.root) if self.root else None

    @staticmethod
    def _resolve_gitdir(root: Path) -> Path | None:
        """`.git` may be the directory itself or a worktree pointer file."""
        g = root / ".git"
        if g.is_dir():
            return g
        if g.is_file():
            text = g.read_text(errors="ignore").strip()
            if text.startswith("gitdir:"):
                return (root / text.split(":", 1)[1].strip()).resolve()
        return None

    def _read(self, rel: str) -> str | None:
        p = self.gitdir / rel if self.gitdir else None
        return p.read_text(errors="ignore").strip() if p and p.exists() else None

    @property
    def is_repo(self) -> bool:
        return self.gitdir is not None

    @cached_property
    def head(self) -> str | None:
        """Raw HEAD contents: 'ref: refs/heads/<branch>' or a detached SHA."""
        return self._read("HEAD")

    @cached_property
    def branch(self) -> str | None:
        h = self.head
        if h and h.startswith("ref:"):
            ref = h.split(":", 1)[1].strip()
            return ref.split("refs/heads/", 1)[-1] if "refs/heads/" in ref else ref
        return None

    def _ref_commit(self, ref: str) -> str | None:
        """SHA for a ref — loose file first, then packed-refs."""
        loose = self._read(ref)
        if loose:
            return loose.splitlines()[0].strip()
        packed = self._read("packed-refs")
        if packed:
            for line in packed.splitlines():
                line = line.strip()
                if line.endswith(" " + ref):
                    return line.split(" ", 1)[0]
        return None

    @cached_property
    def commit(self) -> str | None:
        h = self.head
        if not h:
            return None
        if h.startswith("ref:"):
            return self._ref_commit(h.split(":", 1)[1].strip())
        return h.splitlines()[0].strip()  # detached HEAD

    @cached_property
    def origin(self) -> str | None:
        """URL of the 'origin' remote from gitdir/config."""
        cfg = self._read("config")
        if not cfg:
            return None
        in_origin = False
        for line in cfg.splitlines():
            line = line.strip()
            if line.startswith("["):
                in_origin = bool(re.match(r'\[remote\s+"origin"\]', line))
            elif in_origin and line.startswith("url"):
                return line.split("=", 1)[1].strip()
        return None
