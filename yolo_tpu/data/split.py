"""Dataset splitting helpers (ref: ultralytics/data/split.py
split_classify_dataset:13, autosplit:99)."""

from __future__ import annotations

import random
import shutil
from pathlib import Path

from yolo_tpu.utils import LOGGER
from yolo_tpu.utils.tqdm import TQDM

IMG_SUFFIXES = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}


def img2label_paths(img_paths) -> list:
    """Map .../images/xxx.jpg -> .../labels/xxx.txt (standard YOLO layout)."""
    import os

    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(str(p).rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for p in img_paths]


def split_classify_dataset(source_dir, train_ratio: float = 0.8) -> Path:
    """Split a class-per-folder classification dataset into
    `<source>_split/{train,val}/<class>/` copies."""
    source_path = Path(source_dir)
    split_path = Path(f"{source_path}_split")
    train_path, val_path = split_path / "train", split_path / "val"
    for p in (split_path, train_path, val_path):
        p.mkdir(exist_ok=True)

    class_dirs = [d for d in source_path.iterdir() if d.is_dir()]
    total = sum(len(list(d.glob("*.*"))) for d in class_dirs)
    LOGGER.info(f"Splitting {source_path} ({len(class_dirs)} classes, {total} images) "
                f"into {train_ratio:.0%} train, {1 - train_ratio:.0%} val...")

    for class_dir in class_dirs:
        (train_path / class_dir.name).mkdir(exist_ok=True)
        (val_path / class_dir.name).mkdir(exist_ok=True)
        files = list(class_dir.glob("*.*"))
        random.shuffle(files)
        split_idx = int(len(files) * train_ratio)
        for img in files[:split_idx]:
            shutil.copy2(img, train_path / class_dir.name / img.name)
        for img in files[split_idx:]:
            shutil.copy2(img, val_path / class_dir.name / img.name)

    LOGGER.info(f"Split complete in {split_path}")
    return split_path


def autosplit(path, weights=(0.9, 0.1, 0.0), annotated_only: bool = False) -> None:
    """Randomly assign every image under `path` to train/val/test and write
    `autosplit_{train,val,test}.txt` image lists next to it (seeded, so the
    split is reproducible — same contract as the reference)."""
    path = Path(path)
    files = sorted(x for x in path.rglob("*.*") if x.suffix[1:].lower() in IMG_SUFFIXES)
    n = len(files)
    random.seed(0)
    indices = random.choices([0, 1, 2], weights=weights, k=n)

    txt = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for x in txt:
        if (path.parent / x).exists():
            (path.parent / x).unlink()

    LOGGER.info(f"Autosplitting images from {path}"
                + ", using *.txt labeled images only" * annotated_only)
    for i, img in TQDM(zip(indices, files), total=n):
        if not annotated_only or Path(img2label_paths([str(img)])[0]).exists():
            with open(path.parent / txt[i], "a", encoding="utf-8") as f:
                f.write(f"./{img.relative_to(path.parent).as_posix()}\n")
