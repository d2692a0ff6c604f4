"""DOTA aerial-image tiling: split huge images + OBB labels into windows.

Counterpart of the reference splitter (ref: ultralytics/data/split_dota.py
bbox_iof:20, load_yolo_dota:67, get_windows:103, get_window_obj:156,
crop_and_save:170, split_trainval:265, split_test:304). The reference computes
polygon-window intersection areas with shapely; this build replaces that with
an exact Sutherland-Hodgman convex clip (DOTA OBBs are rotated rectangles) so
the tool carries no extra dependency.
"""

from __future__ import annotations

import itertools
from glob import glob
from math import ceil
from pathlib import Path

import numpy as np

from yolo_tpu.data.split import img2label_paths
from yolo_tpu.utils import LOGGER
from yolo_tpu.utils.tqdm import TQDM


def _clip_polygon_area(poly: np.ndarray, rect) -> float:
    """Area of a convex polygon clipped to an axis-aligned rectangle.

    Sutherland-Hodgman against the four half-planes, then the shoelace formula.
    poly: (K, 2); rect: (x1, y1, x2, y2).
    """
    x1, y1, x2, y2 = rect
    # (inside predicate, intersection parameter) per clip edge
    edges = (
        lambda p: p[0] >= x1,
        lambda p: p[1] >= y1,
        lambda p: p[0] <= x2,
        lambda p: p[1] <= y2,
    )
    axes = (0, 1, 0, 1)
    bounds = (x1, y1, x2, y2)

    pts = [tuple(p) for p in poly]
    for inside, axis, bound in zip(edges, axes, bounds):
        if not pts:
            return 0.0
        out = []
        for i, cur in enumerate(pts):
            prev = pts[i - 1]
            cur_in, prev_in = inside(cur), inside(prev)
            if cur_in != prev_in:
                # intersection with the clip line axis == bound
                t = (bound - prev[axis]) / (cur[axis] - prev[axis])
                ix = (prev[0] + t * (cur[0] - prev[0]), prev[1] + t * (cur[1] - prev[1]))
                out.append(ix)
            if cur_in:
                out.append(cur)
        pts = out
    if len(pts) < 3:
        return 0.0
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    return float(abs(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))) / 2.0)


def _polygon_area(poly: np.ndarray) -> float:
    xs, ys = poly[:, 0], poly[:, 1]
    return float(abs(np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))) / 2.0)


def bbox_iof(polygon1: np.ndarray, bbox2: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Intersection-over-foreground of quad polygons vs axis-aligned windows.

    Args:
        polygon1: (N, 8) quads [x1 y1 x2 y2 x3 y3 x4 y4].
        bbox2: (M, 4) windows [x1, y1, x2, y2].

    Returns:
        (N, M) IoF = area(poly ∩ window) / area(poly).
    """
    polys = polygon1.reshape(-1, 4, 2).astype(np.float64)
    boxes = np.asarray(bbox2, dtype=np.float64).reshape(-1, 4)

    # cheap reject: polygon AABB vs window overlap
    lt = polys.min(axis=1)
    rb = polys.max(axis=1)
    inter_lt = np.maximum(lt[:, None, :], boxes[None, :, :2])
    inter_rb = np.minimum(rb[:, None, :], boxes[None, :, 2:])
    wh = np.clip(inter_rb - inter_lt, 0, None)
    candidates = (wh[..., 0] * wh[..., 1]) > 0

    areas = np.maximum(np.array([_polygon_area(p) for p in polys]), eps)
    out = np.zeros((len(polys), len(boxes)))
    for i, j in zip(*np.nonzero(candidates)):
        out[i, j] = _clip_polygon_area(polys[i], boxes[j]) / areas[i]
    return out


def load_yolo_dota(data_root: str, split: str = "train") -> list:
    """Load `images/<split>` + `labels/<split>` into annotation dicts
    (ori_size (h, w), label (N, 9) normalized, filepath)."""
    import cv2

    assert split in {"train", "val"}, f"split must be 'train' or 'val', not {split}"
    im_dir = Path(data_root) / "images" / split
    assert im_dir.exists(), f"can't find {im_dir}"
    im_files = sorted(glob(str(im_dir / "*")))
    lb_files = img2label_paths(im_files)
    annos = []
    for im_file, lb_file in zip(im_files, lb_files):
        h, w = cv2.imread(im_file).shape[:2]
        lines = [x.split() for x in Path(lb_file).read_text().strip().splitlines() if x]
        lb = np.array(lines, dtype=np.float32) if lines else np.zeros((0, 9), np.float32)
        annos.append(dict(ori_size=(h, w), label=lb, filepath=im_file))
    return annos


def get_windows(im_size, crop_sizes=(1024,), gaps=(200,), im_rate_thr: float = 0.6,
                eps: float = 0.01) -> np.ndarray:
    """Sliding-window coordinates over an (H, W) image.

    Windows step by crop_size - gap; the last window is pulled flush with the
    border; windows whose in-image fraction is below `im_rate_thr` are dropped
    (unless none pass, in which case the best ones are kept).
    """
    h, w = im_size
    windows = []
    for crop_size, gap in zip(crop_sizes, gaps):
        assert crop_size > gap, f"invalid crop_size/gap pair [{crop_size} {gap}]"
        step = crop_size - gap

        xn = 1 if w <= crop_size else ceil((w - crop_size) / step + 1)
        xs = [step * i for i in range(xn)]
        if len(xs) > 1 and xs[-1] + crop_size > w:
            xs[-1] = w - crop_size
        yn = 1 if h <= crop_size else ceil((h - crop_size) / step + 1)
        ys = [step * i for i in range(yn)]
        if len(ys) > 1 and ys[-1] + crop_size > h:
            ys[-1] = h - crop_size

        start = np.array(list(itertools.product(xs, ys)), dtype=np.int64)
        windows.append(np.concatenate([start, start + crop_size], axis=1))
    windows = np.concatenate(windows, axis=0)

    clipped = windows.copy()
    clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
    clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
    im_areas = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
    win_areas = (windows[:, 2] - windows[:, 0]) * (windows[:, 3] - windows[:, 1])
    im_rates = im_areas / win_areas
    if not (im_rates > im_rate_thr).any():
        im_rates[np.abs(im_rates - im_rates.max()) < eps] = 1
    return windows[im_rates > im_rate_thr]


def get_window_obj(anno: dict, windows: np.ndarray, iof_thr: float = 0.7) -> list:
    """Assign each label row to the windows it overlaps by >= iof_thr.
    NOTE: denormalizes anno['label'] in place (matching the reference)."""
    h, w = anno["ori_size"]
    label = anno["label"]
    if len(label):
        label[:, 1::2] *= w
        label[:, 2::2] *= h
        iofs = bbox_iof(label[:, 1:], windows)
        return [label[iofs[:, i] >= iof_thr] for i in range(len(windows))]
    return [np.zeros((0, 9), dtype=np.float32) for _ in range(len(windows))]


def crop_and_save(anno: dict, windows: np.ndarray, window_objs: list, im_dir: str,
                  lb_dir: str, allow_background_images: bool = True) -> None:
    """Write each window's image crop + re-normalized labels.
    Patch names follow the DOTA-devkit convention `stem__size__x___y`."""
    import cv2

    im = cv2.imread(anno["filepath"])
    name = Path(anno["filepath"]).stem
    for i, window in enumerate(windows):
        x_start, y_start, x_stop, y_stop = window.tolist()
        new_name = f"{name}__{x_stop - x_start}__{x_start}___{y_start}"
        patch = im[y_start:y_stop, x_start:x_stop]
        ph, pw = patch.shape[:2]

        label = window_objs[i]
        if len(label) or allow_background_images:
            cv2.imwrite(str(Path(im_dir) / f"{new_name}.jpg"), patch)
        if len(label):
            label = label.copy()
            label[:, 1::2] -= x_start
            label[:, 2::2] -= y_start
            label[:, 1::2] /= pw
            label[:, 2::2] /= ph
            with open(Path(lb_dir) / f"{new_name}.txt", "w", encoding="utf-8") as f:
                for lb in label:
                    coords = " ".join(f"{c:.6g}" for c in lb[1:])
                    f.write(f"{int(lb[0])} {coords}\n")


def split_images_and_labels(data_root: str, save_dir: str, split: str = "train",
                            crop_sizes=(1024,), gaps=(200,)) -> None:
    """Tile one split's images + labels into `save_dir/{images,labels}/<split>`."""
    save_dir = Path(save_dir)
    im_dir = save_dir / "images" / split
    im_dir.mkdir(parents=True, exist_ok=True)
    lb_dir = save_dir / "labels" / split
    lb_dir.mkdir(parents=True, exist_ok=True)

    annos = load_yolo_dota(data_root, split=split)
    for anno in TQDM(annos, total=len(annos), desc=split):
        windows = get_windows(anno["ori_size"], crop_sizes, gaps)
        window_objs = get_window_obj(anno, windows)
        crop_and_save(anno, windows, window_objs, str(im_dir), str(lb_dir))


def split_trainval(data_root: str, save_dir: str, crop_size: int = 1024,
                   gap: int = 200, rates=(1.0,)) -> None:
    """Tile train+val at one or more scales (`rates` multiply crop_size/gap)."""
    crop_sizes = [int(crop_size / r) for r in rates]
    gaps = [int(gap / r) for r in rates]
    for split in ("train", "val"):
        split_images_and_labels(data_root, save_dir, split, crop_sizes, gaps)


def split_test(data_root: str, save_dir: str, crop_size: int = 1024,
               gap: int = 200, rates=(1.0,)) -> None:
    """Tile the (unlabeled) test split."""
    import cv2

    crop_sizes = [int(crop_size / r) for r in rates]
    gaps = [int(gap / r) for r in rates]
    save_im = Path(save_dir) / "images" / "test"
    save_im.mkdir(parents=True, exist_ok=True)

    im_dir = Path(data_root) / "images" / "test"
    assert im_dir.exists(), f"can't find {im_dir}"
    for im_file in TQDM(sorted(glob(str(im_dir / "*"))), desc="test"):
        im = cv2.imread(im_file)
        h, w = im.shape[:2]
        windows = get_windows((h, w), crop_sizes, gaps)
        name = Path(im_file).stem
        for window in windows:
            x_start, y_start, x_stop, y_stop = window.tolist()
            new_name = f"{name}__{x_stop - x_start}__{x_start}___{y_start}"
            cv2.imwrite(str(save_im / f"{new_name}.jpg"), im[y_start:y_stop, x_start:x_stop])
    LOGGER.info(f"test tiles saved to {save_im}")
