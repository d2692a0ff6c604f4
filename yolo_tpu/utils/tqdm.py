"""Zero-dependency progress bar (ref: ultralytics/utils/tqdm.py:18 `TQDM`).

The reference ships its own dependency-free TQDM clone and uses it everywhere a
loop is user-visible (trainer epochs, validator batches, dataset caching,
downloads). This is an original implementation of the same public surface:

    for x in TQDM(items, desc="val"): ...
    with TQDM(total=n, unit="B", unit_scale=True) as bar: bar.update(chunk)

Behavioral contract kept from the reference:
- wraps an iterable OR is driven manually via ``update(n)``;
- single-line carriage-return redraw on a TTY, throttled to ``mininterval``;
- on a non-TTY (CI logs), redraws are rare (every ``NONINTERACTIVE_INTERVAL``
  seconds) and each lands on its own line so logs stay readable;
- unicode block bar, smoothed rate, elapsed<remaining ETA, unit scaling (k/M/G);
- ``set_description`` / ``set_postfix`` / ``write`` / context manager / ``close``.
"""

from __future__ import annotations

import os
import sys
import time

__all__ = ["TQDM"]

_BLOCKS = " ▏▎▍▌▋▊▉█"  # 1/8th fills


def _fmt_interval(seconds: float) -> str:
    """mm:ss, or h:mm:ss past the hour."""
    s = max(int(seconds), 0)
    h, rem = divmod(s, 3600)
    m, s = divmod(rem, 60)
    return f"{h:d}:{m:02d}:{s:02d}" if h else f"{m:02d}:{s:02d}"


class TQDM:
    """Minimal self-contained progress bar with a tqdm-compatible surface."""

    NONINTERACTIVE_INTERVAL = 30.0  # seconds between redraws when piped to a log

    def __init__(
        self,
        iterable=None,
        desc: str = "",
        total: int | None = None,
        disable: bool = False,
        unit: str = "it",
        unit_scale: bool = False,
        unit_divisor: int = 1000,
        leave: bool = True,
        mininterval: float = 0.1,
        initial: int = 0,
        bar_format: str | None = None,
        file=None,
        **_: object,  # absorb tqdm kwargs we don't model (ncols, colour, ...)
    ):
        self.iterable = iterable
        self.desc = desc
        if total is None and iterable is not None:
            try:
                total = len(iterable)
            except TypeError:
                total = None
        self.total = total
        self.disable = disable or os.environ.get("YOLO_TPU_NOPROGRESS") == "1"
        self.unit = unit
        self.unit_scale = unit_scale
        self.unit_divisor = unit_divisor
        self.leave = leave
        self.file = file or sys.stderr
        self._tty = bool(getattr(self.file, "isatty", lambda: False)())
        self.mininterval = mininterval if self._tty else self.NONINTERACTIVE_INTERVAL
        self.n = initial
        self.postfix = ""
        self.bar_format = bar_format
        self.closed = False
        self._start = time.perf_counter()
        self._last_t = self._start
        self._last_n = initial
        self._rate = 0.0  # exponentially smoothed it/s
        self._drew = False

    # ------------------------------------------------------------------ fmt
    def _scale(self, num: float) -> str:
        if not self.unit_scale:
            return f"{int(num)}" if float(num).is_integer() else f"{num:.1f}"
        for prefix in ("", "k", "M", "G", "T"):
            if abs(num) < self.unit_divisor:
                return f"{num:.1f}{prefix}" if prefix else f"{num:.0f}"
            num /= self.unit_divisor
        return f"{num:.1f}P"

    def _bar(self, frac: float, width: int = 12) -> str:
        eighths = int(max(0.0, min(1.0, frac)) * width * 8)
        full, part = divmod(eighths, 8)
        body = "█" * full + (_BLOCKS[part] if part else "")
        return body.ljust(width)

    def _render(self) -> str:
        elapsed = time.perf_counter() - self._start
        rate = self._rate or (self.n / elapsed if elapsed > 0 else 0.0)
        rate_s = f"{self._scale(rate)}{self.unit}/s" if rate else f"?{self.unit}/s"
        desc = f"{self.desc}: " if self.desc else ""
        post = f" {self.postfix}" if self.postfix else ""
        if self.total:
            frac = self.n / self.total
            eta = (self.total - self.n) / rate if rate > 0 else 0.0
            return (
                f"{desc}{frac * 100:3.0f}%|{self._bar(frac)}| "
                f"{self._scale(self.n)}/{self._scale(self.total)} "
                f"[{_fmt_interval(elapsed)}<{_fmt_interval(eta)}, {rate_s}]{post}"
            )
        return f"{desc}{self._scale(self.n)}{self.unit} [{_fmt_interval(elapsed)}, {rate_s}]{post}"

    # ------------------------------------------------------------------ io
    def _display(self, final: bool = False) -> None:
        if self.disable:
            return
        now = time.perf_counter()
        if not final and (now - self._last_t) < self.mininterval:
            return
        dt, dn = now - self._last_t, self.n - self._last_n
        if dt > 1e-3 and dn >= 0:
            inst = dn / dt
            self._rate = inst if not self._rate else 0.7 * self._rate + 0.3 * inst
        self._last_t, self._last_n = now, self.n
        line = self._render()
        try:
            if self._tty:
                self.file.write(f"\r\x1b[K{line}")
                if final and self.leave:
                    self.file.write("\n")
            else:
                self.file.write(line + "\n")
            self.file.flush()
        except (ValueError, OSError):  # closed stream (interpreter teardown)
            self.disable = True
        self._drew = True

    # ------------------------------------------------------------------ api
    def update(self, n: int = 1) -> None:
        if not self.closed:
            self.n += n
            self._display()

    def set_description(self, desc: str | None) -> None:
        self.desc = desc or ""
        self._display()

    def set_postfix(self, **kwargs) -> None:
        self.postfix = ", ".join(f"{k}={v}" for k, v in kwargs.items())
        self._display()

    def refresh(self) -> None:
        self._display(final=False)

    def clear(self) -> None:
        if self._tty and not self.disable:
            try:
                self.file.write("\r\x1b[K")
                self.file.flush()
            except (ValueError, OSError):
                pass

    @staticmethod
    def write(s: str, file=None, end: str = "\n") -> None:
        """Print a message without corrupting an active single-line bar."""
        f = file or sys.stderr
        try:
            if getattr(f, "isatty", lambda: False)():
                f.write("\r\x1b[K")
            f.write(s + end)
            f.flush()
        except (ValueError, OSError):
            pass

    def close(self) -> None:
        if self.closed:
            return
        self.closed = True
        if self._drew or self._tty:
            self._display(final=True)
        elif not self.disable:
            # piped run that finished inside the first interval: one summary line
            self._display(final=True)

    def __enter__(self) -> "TQDM":
        return self

    def __exit__(self, *args) -> None:
        self.close()

    def __iter__(self):
        if self.iterable is None:
            raise TypeError("TQDM needs an iterable to be iterated")
        try:
            for item in self.iterable:
                yield item
                self.update(1)
        finally:
            self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
