"""Dataset tooling: converters, splitters, DOTA tiling, auto-annotation.

Covers yolo_tpu/data/{converter,split,split_dota,annotator}.py against the
reference implementations (ref: ultralytics/data/{converter,split,split_dota,
annotator}.py) — class-map and segment-merge golden parity via the reference
oracle, plus behavioral tests on synthetic datasets.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available


# ---- COCO class maps ---------------------------------------------------------

@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_coco_class_maps_match_reference():
    add_reference_to_path()
    from ultralytics.data.converter import coco80_to_coco91_class as ref80to91
    from ultralytics.data.converter import coco91_to_coco80_class as ref91to80

    from yolo_tpu.data.converter import coco80_to_coco91_class, coco91_to_coco80_class

    assert coco91_to_coco80_class() == ref91to80()
    assert coco80_to_coco91_class() == ref80to91()


def test_coco_class_maps_are_inverse():
    from yolo_tpu.data.converter import coco80_to_coco91_class, coco91_to_coco80_class

    m91to80 = coco91_to_coco80_class()
    m80to91 = coco80_to_coco91_class()
    assert len(m91to80) == 91 and len(m80to91) == 80
    for c80, c91 in enumerate(m80to91):
        assert m91to80[c91 - 1] == c80


# ---- merge_multi_segment -----------------------------------------------------

@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_merge_multi_segment_golden():
    add_reference_to_path()
    from ultralytics.data.converter import merge_multi_segment as ref_merge

    from yolo_tpu.data.converter import merge_multi_segment

    rng = np.random.default_rng(3)
    for n_parts in (2, 3, 4):
        segments = [
            (rng.uniform(0, 100, size=(int(rng.integers(4, 9)), 2)) + 120 * i).reshape(-1).tolist()
            for i in range(n_parts)
        ]
        ours = np.concatenate(merge_multi_segment([list(s) for s in segments]), axis=0)
        theirs = np.concatenate(ref_merge([list(s) for s in segments]), axis=0)
        np.testing.assert_allclose(ours, theirs, err_msg=f"n_parts={n_parts}")


# ---- convert_coco -------------------------------------------------------------

def _mini_coco_json(path: Path):
    data = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "height": 100, "width": 200},
            {"id": 2, "file_name": "b.jpg", "height": 50, "width": 50},
        ],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 20, 40, 30],
             "segmentation": [[10, 20, 50, 20, 50, 50, 10, 50]], "iscrowd": 0},
            {"image_id": 1, "category_id": 3, "bbox": [100, 10, 20, 20],
             "segmentation": [], "iscrowd": 0},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
             "segmentation": [], "iscrowd": 1},  # crowd -> dropped
            {"image_id": 2, "category_id": 90, "bbox": [5, 5, 20, 10],
             "segmentation": [], "iscrowd": 0},
        ],
        "categories": [],
    }
    (path / "instances_val.json").write_text(json.dumps(data))


def test_convert_coco_boxes(tmp_path):
    from yolo_tpu.data.converter import convert_coco

    src = tmp_path / "annotations"
    src.mkdir()
    _mini_coco_json(src)
    out = convert_coco(labels_dir=str(src), save_dir=str(tmp_path / "conv"))

    a = (out / "labels" / "val" / "a.txt").read_text().strip().splitlines()
    assert len(a) == 2  # crowd dropped
    c0, cx, cy, w, h = map(float, a[0].split())
    assert c0 == 0  # category 1 -> class 0
    np.testing.assert_allclose([cx, cy, w, h], [30 / 200, 35 / 100, 40 / 200, 30 / 100])
    c1 = float(a[1].split()[0])
    assert c1 == 2  # category 3 -> class 2

    b = (out / "labels" / "val" / "b.txt").read_text().strip().splitlines()
    # category 90 ('toothbrush', id 90) -> 80-class index 79
    assert float(b[0].split()[0]) == 79


def test_convert_coco_segments(tmp_path):
    from yolo_tpu.data.converter import convert_coco

    src = tmp_path / "annotations"
    src.mkdir()
    _mini_coco_json(src)
    out = convert_coco(labels_dir=str(src), save_dir=str(tmp_path / "conv"), use_segments=True)
    a = (out / "labels" / "val" / "a.txt").read_text().strip().splitlines()
    first = list(map(float, a[0].split()))
    # cls + 4 normalized polygon points
    assert first[0] == 0 and len(first) == 1 + 8
    np.testing.assert_allclose(first[1:3], [10 / 200, 20 / 100])


# ---- mask png -> YOLO seg -----------------------------------------------------

def test_convert_segment_masks(tmp_path):
    import cv2

    from yolo_tpu.data.converter import convert_segment_masks_to_yolo_seg

    masks = tmp_path / "masks"
    masks.mkdir()
    m = np.zeros((80, 120), np.uint8)
    cv2.rectangle(m, (10, 20), (50, 60), 1, -1)   # class 0
    cv2.circle(m, (90, 40), 15, 2, -1)            # class 1
    cv2.imwrite(str(masks / "img1.png"), m)

    out = tmp_path / "labels"
    convert_segment_masks_to_yolo_seg(str(masks), str(out), classes=80)
    rows = (out / "img1.txt").read_text().strip().splitlines()
    classes = sorted(int(r.split()[0]) for r in rows)
    assert classes == [0, 1]
    for r in rows:
        vals = list(map(float, r.split()[1:]))
        assert len(vals) >= 6 and all(0 <= v <= 1 for v in vals)


# ---- DOTA conversion + tiling --------------------------------------------------

def _mini_dota(tmp_path: Path, size=(120, 160)):
    import cv2

    root = tmp_path / "DOTA"
    for phase in ("train", "val"):
        (root / "images" / phase).mkdir(parents=True)
        (root / "labels" / f"{phase}_original").mkdir(parents=True)
        img = np.full((*size, 3), 60, np.uint8)
        cv2.imwrite(str(root / "images" / phase / "img1.png"), img)
        (root / "labels" / f"{phase}_original" / "img1.txt").write_text(
            "10 20 60 20 60 50 10 50 plane 0\n"
            "80 30 120 30 120 70 80 70 small-vehicle 0\n"
        )
    return root


def test_convert_dota_to_yolo_obb(tmp_path):
    from yolo_tpu.data.converter import convert_dota_to_yolo_obb

    root = _mini_dota(tmp_path)
    convert_dota_to_yolo_obb(str(root))
    rows = (root / "labels" / "train" / "img1.txt").read_text().strip().splitlines()
    assert len(rows) == 2
    r0 = rows[0].split()
    assert int(r0[0]) == 0  # plane
    np.testing.assert_allclose(float(r0[1]), 10 / 160, rtol=1e-5)
    np.testing.assert_allclose(float(r0[2]), 20 / 120, rtol=1e-5)
    assert int(rows[1].split()[0]) == 10  # small-vehicle


def test_bbox_iof_exact():
    from yolo_tpu.data.split_dota import bbox_iof

    # axis-aligned square fully inside window -> 1; half inside -> 0.5
    poly = np.array([[0, 0, 10, 0, 10, 10, 0, 10]], dtype=float)
    windows = np.array([[0, 0, 20, 20], [5, 0, 30, 20], [50, 50, 60, 60]], dtype=float)
    iof = bbox_iof(poly, windows)
    np.testing.assert_allclose(iof[0], [1.0, 0.5, 0.0], atol=1e-9)

    # rotated square (diamond) centered at (10,10), halved by x>=10
    diamond = np.array([[10, 0, 20, 10, 10, 20, 0, 10]], dtype=float)
    iof = bbox_iof(diamond, np.array([[10, 0, 30, 20]], dtype=float))
    np.testing.assert_allclose(iof[0, 0], 0.5, atol=1e-9)


def test_get_windows_cover_and_threshold():
    from yolo_tpu.data.split_dota import get_windows

    # image smaller than the crop -> one window pinned at origin
    w = get_windows((100, 150), crop_sizes=(1024,), gaps=(200,))
    assert w.shape == (1, 4) and w[0].tolist() == [0, 0, 1024, 1024]

    # large image: windows tile with the expected step and stay flush
    w = get_windows((1500, 2000), crop_sizes=(1024,), gaps=(200,))
    assert (w[:, 2] - w[:, 0] == 1024).all() and (w[:, 3] - w[:, 1] == 1024).all()
    assert w[:, 0].min() == 0 and w[:, 2].max() == 2000 and w[:, 3].max() == 1500


def test_split_trainval_tiles(tmp_path):
    from yolo_tpu.data.converter import convert_dota_to_yolo_obb
    from yolo_tpu.data.split_dota import split_trainval

    root = _mini_dota(tmp_path, size=(120, 160))
    convert_dota_to_yolo_obb(str(root))
    out = tmp_path / "tiled"
    split_trainval(str(root), str(out), crop_size=100, gap=20)
    tiles = sorted((out / "images" / "train").glob("*.jpg"))
    labels = sorted((out / "labels" / "train").glob("*.txt"))
    assert tiles and labels
    # every label row is a valid normalized OBB
    for lb in labels:
        for row in lb.read_text().strip().splitlines():
            vals = row.split()
            assert len(vals) == 9
            assert all(-0.2 <= float(v) <= 1.2 for v in vals[1:])


# ---- splitters -----------------------------------------------------------------

def test_autosplit(tmp_path):
    import cv2

    from yolo_tpu.data.split import autosplit

    imgs = tmp_path / "ds" / "images"
    imgs.mkdir(parents=True)
    lbls = tmp_path / "ds" / "labels"
    lbls.mkdir(parents=True)
    for i in range(20):
        cv2.imwrite(str(imgs / f"im{i:02d}.jpg"), np.zeros((8, 8, 3), np.uint8))
        if i < 10:
            (lbls / f"im{i:02d}.txt").write_text("0 0.5 0.5 0.2 0.2\n")

    autosplit(imgs, weights=(0.8, 0.2, 0.0))
    train = (imgs.parent / "autosplit_train.txt").read_text().strip().splitlines()
    val = (imgs.parent / "autosplit_val.txt").read_text().strip().splitlines()
    assert len(train) + len(val) == 20
    assert all(line.startswith("./images/") for line in train + val)

    # annotated_only keeps only the 10 labeled images
    autosplit(imgs, weights=(1.0, 0.0, 0.0), annotated_only=True)
    train = (imgs.parent / "autosplit_train.txt").read_text().strip().splitlines()
    assert len(train) == 10


def test_split_classify_dataset(tmp_path):
    import cv2

    from yolo_tpu.data.split import split_classify_dataset

    src = tmp_path / "cls"
    for c in ("cats", "dogs"):
        (src / c).mkdir(parents=True)
        for i in range(10):
            cv2.imwrite(str(src / c / f"{i}.jpg"), np.zeros((8, 8, 3), np.uint8))

    out = split_classify_dataset(src, train_ratio=0.8)
    assert out == tmp_path / "cls_split"
    for c in ("cats", "dogs"):
        assert len(list((out / "train" / c).glob("*.jpg"))) == 8
        assert len(list((out / "val" / c).glob("*.jpg"))) == 2


# ---- auto_annotate -------------------------------------------------------------

def test_auto_annotate_writes_labels(tmp_path, monkeypatch):
    """Wiring test with stub detector/SAM (no weights): detections become
    SAM-box prompts become polygon label rows."""
    import cv2

    from yolo_tpu.data.annotator import auto_annotate

    data = tmp_path / "imgs"
    data.mkdir()
    img = np.zeros((64, 64, 3), np.uint8)
    cv2.rectangle(img, (16, 16), (48, 48), (255, 255, 255), -1)
    cv2.imwrite(str(data / "one.jpg"), img)

    class StubBoxes:
        cls = np.array([0.0])
        xyxy = np.array([[16.0, 16.0, 48.0, 48.0]])

    class StubResult:
        boxes = StubBoxes()
        orig_img = img
        path = str(data / "one.jpg")

    class StubDet:
        def predict(self, *a, **k):
            return iter([StubResult()])

    class StubMasks:
        xyn = [np.array([[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]])]

    class StubSeg:
        masks = StubMasks()

    class StubSAM:
        def predict(self, img, bboxes=None, multimask_output=True):
            assert bboxes is not None and len(bboxes) == 1
            return StubSeg()

    out = auto_annotate(data, det_model=StubDet(), sam_model=StubSAM())
    txt = (out / "one.txt").read_text().strip()
    vals = txt.split()
    assert vals[0] == "0" and len(vals) == 1 + 8
