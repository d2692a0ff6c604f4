"""Filesystem helpers + unicode-safe image IO (ref: utils/files.py:15-187,
utils/patches.py imread/imwrite:20-71)."""

import numpy as np


def test_unicode_image_io(tmp_path):
    from yolo_tpu.utils.files import imread, imwrite

    img = np.random.default_rng(0).integers(0, 255, (16, 20, 3)).astype(np.uint8)
    p = tmp_path / "红外目标 测试.png"  # non-ASCII + space, like the reference's assets
    assert imwrite(p, img)
    back = imread(p)
    assert back is not None and back.shape == img.shape and (back == img).all()
    assert imread(tmp_path / "missing.png") is None


def test_dataset_loads_unicode_paths(tmp_path):
    """The data pipeline reads non-ASCII filenames (reference repo ships
    Chinese-named assets; plain cv2.imread returns None on them on some
    platforms)."""
    import cv2

    from yolo_tpu.cfg import get_cfg
    from yolo_tpu.data.build import build_yolo_dataset

    img_dir = tmp_path / "images/train"
    lbl_dir = tmp_path / "labels/train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    from yolo_tpu.utils.files import imwrite

    for i, name in enumerate(["无人机1", "b"]):
        imwrite(img_dir / f"{name}.png", np.full((32, 32, 3), 40, np.uint8))
        (lbl_dir / f"{name}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    data = {"path": str(tmp_path), "train": str(img_dir), "names": {0: "t"}, "nc": 1}
    args = get_cfg(overrides={"imgsz": 32, "mosaic": 0.0, "mixup": 0.0, "cutmix": 0.0, "copy_paste": 0.0})
    ds = build_yolo_dataset(args, str(img_dir), 2, data, mode="val", stride=32)
    item = ds[0]
    assert item["img"].shape[-1] == 3


def test_increment_path_and_misc(tmp_path):
    from yolo_tpu.utils.files import file_size, get_latest_run, increment_path

    d = tmp_path / "exp"
    d.mkdir()
    p2 = increment_path(d)
    assert p2.name == "exp2"
    assert increment_path(d, exist_ok=True) == d

    (tmp_path / "w").mkdir()
    f = tmp_path / "w" / "last_run.npz"
    f.write_bytes(b"x" * 2048)
    assert get_latest_run(str(tmp_path)).endswith("last_run.npz")
    assert file_size(f) > 0


def test_working_directory_and_spaces(tmp_path):
    import os

    from yolo_tpu.utils.files import WorkingDirectory, spaces_in_path

    sub = tmp_path / "sub"
    sub.mkdir()
    cwd = os.getcwd()
    with WorkingDirectory(sub):
        assert os.getcwd() == str(sub)
    assert os.getcwd() == cwd

    f = tmp_path / "a file.txt"
    f.write_text("hi")
    with spaces_in_path(f) as clean:
        assert " " not in clean.name and clean.read_text() == "hi"
