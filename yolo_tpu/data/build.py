"""Batch builders: threaded prefetching host loader feeding the device.

Reference counterpart: data/build.py build_dataloader:180 (torch InfiniteDataLoader
+ workers). TPU design: a small thread pool decodes/augments on host while the
device runs the previous step — classic input pipeline overlap; batches are
fixed-shape numpy, converted to device arrays by the consumer.
"""

from __future__ import annotations

import queue
import random
import threading

import numpy as np

from yolo_tpu.data.dataset import YOLODataset, collate_batch


def build_yolo_dataset(cfg, img_path, batch: int, data: dict, mode: str = "train", stride: int = 32):
    """Construct a YOLODataset from resolved config + dataset dict."""
    return YOLODataset(
        img_path,
        imgsz=cfg.imgsz if isinstance(cfg.imgsz, int) else max(cfg.imgsz),
        augment=mode == "train",
        hyp=cfg,
        stride=stride,
        single_cls=cfg.single_cls,
        fraction=cfg.fraction if mode == "train" else 1.0,
        cache=(getattr(cfg, "cache", None) or None),  # "ram"/True adds image caching; the label cache is unconditional
        names=data.get("names"),
        kpt_shape=data.get("kpt_shape"),
        flip_idx=data.get("flip_idx"),
        task=getattr(cfg, "task", "detect") or "detect",
    )


class DataLoader:
    """Epoch-based threaded loader with deterministic shuffling."""

    def __init__(self, dataset: YOLODataset, batch_size: int = 16, shuffle: bool = True, workers: int = 4, seed: int = 0, max_boxes: int = 64, drop_last: bool = True, process_fn=None, overlap_mask: bool = True, mask_ratio: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.seed = seed
        self.max_boxes = max_boxes
        self.overlap_mask = overlap_mask
        self.mask_ratio = mask_ratio
        self.drop_last = drop_last
        self.epoch = 0
        self.process_fn = process_fn or (lambda b: b)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _index_order(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self):
        idx = self._index_order()
        batches = [idx[i : i + self.batch_size] for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        out_q: queue.Queue = queue.Queue(maxsize=self.workers * 2)
        stop = threading.Event()

        def producer(worker_id: int):
            rng = random.Random(self.seed * 1000003 + self.epoch * 131 + worker_id)
            try:
                for bi in range(worker_id, len(batches), self.workers):
                    if stop.is_set():
                        return
                    samples = []
                    for j in batches[bi]:
                        if hasattr(self.dataset.transforms, "__call__"):
                            s = self.dataset.transforms(self.dataset.load_raw(j), rng) if _accepts_rng(self.dataset.transforms) else self.dataset[j]
                        else:
                            s = self.dataset[j]
                        samples.append(s)
                    out_q.put((bi, self.process_fn(collate_batch(samples, self.max_boxes, overlap=self.overlap_mask, mask_ratio=self.mask_ratio))))
                out_q.put((None, None))
            except BaseException as e:  # surface in the consumer — a silent dead
                # producer would hang the training loop forever on out_q.get()
                out_q.put(("error", e))

        threads = [threading.Thread(target=producer, args=(w,), daemon=True) for w in range(self.workers)]
        for t in threads:
            t.start()
        try:
            done = 0
            buffered = {}
            next_bi = 0
            emitted = 0
            total = len(batches)
            while emitted < total:
                bi, batch = out_q.get()
                if bi == "error":
                    raise RuntimeError("DataLoader worker failed") from batch
                if bi is None:
                    done += 1
                    if done == len(threads) and emitted < total:
                        continue
                    continue
                buffered[bi] = batch
                # emit in order for determinism
                while next_bi in buffered:
                    yield buffered.pop(next_bi)
                    next_bi += 1
                    emitted += 1
        finally:
            stop.set()


def _accepts_rng(fn) -> bool:
    import inspect

    try:
        sig = inspect.signature(fn.__call__ if not inspect.isfunction(fn) else fn)
        return "rng" in sig.parameters
    except (TypeError, ValueError):
        return False


def _derive_max_boxes(dataset) -> int:
    """Static per-image label capacity from the dataset's own stats.

    The reference uses dynamic shapes, so nothing is ever cut; with fixed
    shapes a too-small cap silently truncates ground truth (labels beyond it
    became invisible FNs). Pad to the dataset's densest image (+headroom for
    mosaic concatenation), rounded to 8, floored at 64 and capped at 256 —
    the (B, N, A) assigner tensors scale linearly in N, so an unbounded cap
    would blow HBM on dense datasets. collate_batch warns if it still cuts.
    """
    try:
        mx = max((len(l["cls"]) for l in getattr(dataset, "labels", [])), default=0)
    except Exception:
        mx = 0
    if not mx:
        return 64
    derived = -(-int(mx * 2) // 8) * 8  # 2x headroom for mosaic/copy-paste growth
    return int(min(max(64, derived), 256))


def build_dataloader(dataset, batch: int, workers: int = 4, shuffle: bool = True, seed: int = 0, max_boxes: int | None = None, drop_last: bool = True, overlap_mask: bool = True, mask_ratio: int = 4):
    """Factory mirroring the reference name (ref: data/build.py:180)."""
    if max_boxes is None:
        max_boxes = _derive_max_boxes(dataset)
    return DataLoader(dataset, batch_size=batch, shuffle=shuffle, workers=workers, seed=seed, max_boxes=max_boxes, drop_last=drop_last, overlap_mask=overlap_mask, mask_ratio=mask_ratio)
