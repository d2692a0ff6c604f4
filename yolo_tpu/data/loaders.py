"""Inference-source loaders incl. threaded multi-stream video.

Reference counterparts: data/loaders.py LoadStreams:54 (one daemon thread per
source, per-stream frame buffers), LoadImagesAndVideos:309, LoadPilAndNumpy:492,
LoadTensor:566; data/build.py load_inference_source:267.

Multi-stream note (SURVEY §2 parallelism): streams stay isolated per-thread on
host; the device sees them as one stacked batch, which is how independent video
streams shard across chips (batch axis) in the TPU design.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path

import numpy as np

from yolo_tpu.utils import LOGGER


class LoadStreams:
    """Threaded reader over N video sources, yielding synchronized frame lists.

    Each source gets a daemon thread pushing the latest frame(s) into its
    buffer; iteration pops one frame per source (blocking until available).
    """

    def __init__(self, sources, vid_stride: int = 1, buffer: bool = False):
        import cv2

        self.buffer = buffer  # True: keep all frames; False: most recent only
        self.vid_stride = vid_stride
        sources = [sources] if isinstance(sources, (str, int)) else list(sources)
        self.sources = sources
        n = len(sources)
        self.caps = []
        self.imgs: list[list] = [[] for _ in range(n)]
        self.fps = [30.0] * n
        self.frames = [0] * n
        self.threads = []
        self.running = True
        self.shape = [None] * n
        for i, s in enumerate(sources):
            cap = cv2.VideoCapture(int(s) if str(s).isdigit() else str(s))
            if not cap.isOpened():
                raise ConnectionError(f"failed to open stream {s}")
            self.caps.append(cap)
            self.fps[i] = cap.get(cv2.CAP_PROP_FPS) or 30.0
            self.frames[i] = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or float("inf")
            ok, im = cap.read()
            if not ok:
                raise ConnectionError(f"failed to read from {s}")
            self.imgs[i].append(im)
            self.shape[i] = im.shape
            t = threading.Thread(target=self._update, args=(i, cap), daemon=True)
            self.threads.append(t)
            t.start()
        LOGGER.info(f"LoadStreams: {n} stream(s) at {[int(f) for f in self.fps]} fps")

    def _update(self, i: int, cap):
        import cv2

        n = 0
        while self.running and cap.isOpened() and n < self.frames[i]:
            if len(self.imgs[i]) < 30:
                n += 1
                cap.grab()
                if n % self.vid_stride == 0:
                    ok, im = cap.retrieve()
                    if not ok:
                        break
                    if self.buffer:
                        self.imgs[i].append(im)
                    else:
                        self.imgs[i] = [im]
            else:
                time.sleep(0.01)
        # do NOT flip self.running here: that is the loop condition of every
        # OTHER stream's capture thread — one short/faulty stream must not
        # stop healthy ones (iteration ends in __next__ when this stream's
        # buffer drains and its thread is dead, like the reference)

    def __iter__(self):
        self.count = -1
        return self

    def __next__(self):
        self.count += 1
        images = []
        for i in range(len(self.sources)):
            waited = 0.0
            while not self.imgs[i]:
                if not self.running or not self.threads[i].is_alive():
                    raise StopIteration  # this stream is done and drained
                time.sleep(0.005)
                waited += 0.005
                if waited > 5.0:
                    raise StopIteration
            images.append(self.imgs[i].pop(0) if self.buffer else self.imgs[i].pop())
            if not self.buffer:
                self.imgs[i].clear()
        return self.sources, images, [""] * len(images)

    def close(self):
        self.running = False
        for t in self.threads:
            t.join(timeout=1.0)
        for cap in self.caps:
            cap.release()

    def __len__(self):
        return len(self.sources)


class LoadImagesAndVideos:
    """Sequential file loader over images + videos (ref :309)."""

    def __init__(self, path, vid_stride: int = 1):
        from yolo_tpu.engine.predictor import IMG_FORMATS, VID_FORMATS

        p = Path(path)
        if p.is_dir():
            files = sorted(f for f in p.rglob("*") if f.suffix.lower().lstrip(".") in IMG_FORMATS | VID_FORMATS)
        elif p.exists():
            files = [p]
        else:
            files = sorted(Path(p.parent).glob(p.name))
            if not files:
                raise FileNotFoundError(f"source not found: {path}")
        self.files = files
        self.vid_stride = vid_stride
        self._vid_formats = VID_FORMATS

    def __iter__(self):
        import cv2

        for f in self.files:
            if f.suffix.lower().lstrip(".") in self._vid_formats:
                cap = cv2.VideoCapture(str(f))
                idx = 0
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    if idx % self.vid_stride == 0:
                        yield str(f), frame, idx
                    idx += 1
                cap.release()
            else:
                from yolo_tpu.utils.files import imread
                im = imread(str(f))
                if im is None:
                    LOGGER.warning(f"unreadable image {f}")
                    continue
                yield str(f), im, 0

    def __len__(self):
        return len(self.files)


class LoadScreenshots:
    """Live screen-capture source (ref: data/loaders.py LoadScreenshots:229;
    `yolo predict source=screen`). Spec: "screen [N] [left top width height]".
    Uses the `mss` package when present; raises with guidance otherwise."""

    def __init__(self, source: str = "screen"):
        try:
            import mss
        except ImportError as e:
            raise ImportError("screen capture needs the 'mss' package (pip install mss)") from e
        parts = str(source).split()[1:]
        self.screen = 0
        left = top = width = height = None
        if len(parts) == 1:
            self.screen = int(parts[0])
        elif len(parts) == 4:
            left, top, width, height = (int(x) for x in parts)
        elif len(parts) == 5:
            self.screen, left, top, width, height = (int(x) for x in parts)
        self.sct = mss.mss()
        mon = self.sct.monitors[self.screen]
        self.monitor = {
            "left": mon["left"] + (left or 0),
            "top": mon["top"] + (top or 0),
            "width": width or mon["width"],
            "height": height or mon["height"],
        }
        self.mode = "stream"
        self.frame = 0

    def __iter__(self):
        import numpy as np

        while True:
            im = np.asarray(self.sct.grab(self.monitor))[..., :3]  # BGRA → BGR
            self.frame += 1
            yield f"screen{self.screen}", im, self.frame


class LoadTensor:
    """In-memory batched array source (ref: data/loaders.py LoadTensor:566).

    Accepts numpy/jax arrays shaped (B, H, W, 3) uint8 BGR (our NHWC native
    layout) or torch-style (B, 3, H, W) floats in [0, 1] — the latter is
    converted so downstream preprocessing sees the same contract."""

    def __init__(self, im0):
        import numpy as np

        im = np.asarray(im0)
        if im.ndim == 3:
            im = im[None]
        if im.ndim != 4:
            raise ValueError(f"LoadTensor expects 3/4-D input, got shape {im.shape}")
        if im.shape[1] in (1, 3) and im.shape[-1] not in (1, 3):  # NCHW → NHWC
            im = im.transpose(0, 2, 3, 1)
        if im.dtype != np.uint8:
            if im.max() > 1.0 + 1e-3:
                raise ValueError("float inputs must be normalized to [0, 1] (ref LoadTensor:_single_check)")
            im = (im * 255).round().astype(np.uint8)
        if im.shape[-1] == 1:
            im = im.repeat(3, -1)
        self.im0 = im
        self.bs = im.shape[0]
        self.mode = "image"

    def __iter__(self):
        for i, im in enumerate(self.im0):
            yield f"image{i}.jpg", im, 0

    def __len__(self):
        return self.bs


def load_inference_source(source, vid_stride: int = 1, stream_buffer: bool = False):
    """Route a source spec to its loader (ref: data/build.py:267).

    This is the single routing authority — the predictor's frame iterator
    delegates here for every non-trivial source type, so webcams (int or str),
    screen specs, tensor batches (numpy/jax/torch), stream lists, files, dirs
    and globs all behave identically from the API and the CLI."""
    import numpy as np

    # exactly "screen" or "screen <args>" — NOT any path that merely starts
    # with the word (e.g. "screenshots/img.png" is a file)
    if isinstance(source, str) and (source == "screen" or source.startswith("screen ")):
        return LoadScreenshots(source)
    if isinstance(source, np.ndarray) and source.ndim == 4:
        return LoadTensor(source)
    if type(source).__module__.startswith(("jax", "torch")) and getattr(source, "ndim", 0) == 4:
        return LoadTensor(np.asarray(source))
    if isinstance(source, int):  # webcam index (the CLI's smart_value yields int 0)
        return LoadStreams(str(source), vid_stride=vid_stride, buffer=stream_buffer)
    if isinstance(source, (list, tuple)) and all(isinstance(s, str) and ("://" in s or str(s).isdigit()) for s in source):
        return LoadStreams(source, vid_stride=vid_stride, buffer=stream_buffer)
    if isinstance(source, str) and ("://" in source or source.isdigit()):
        return LoadStreams(source, vid_stride=vid_stride, buffer=stream_buffer)
    return LoadImagesAndVideos(source, vid_stride=vid_stride)
