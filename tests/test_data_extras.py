"""Data-layer extras: photometric augs, LoadTensor/LoadScreenshots routing,
GroundingDataset (ref: data/augment.py Albumentations:1876,
data/loaders.py:229,566, data/dataset.py GroundingDataset:420)."""

import json
import random

import numpy as np
import pytest


def test_random_photometric_recipe():
    from yolo_tpu.data.augment import random_photometric

    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    out = random_photometric(img.copy(), p=1.0, rng=random.Random(3))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != img).any()  # every transform fired at p=1
    # p=0 is the identity
    same = random_photometric(img.copy(), p=0.0, rng=random.Random(3))
    assert (same == img).all()
    # gray branch leaves all channels equal
    g = random_photometric(img.copy(), p=1.0, rng=random.Random(0))


def test_load_tensor_variants():
    from yolo_tpu.data.loaders import LoadTensor

    # NCHW float [0,1]
    lt = LoadTensor(np.random.rand(2, 3, 32, 32).astype(np.float32))
    items = list(lt)
    assert len(items) == 2 and items[0][1].shape == (32, 32, 3) and items[0][1].dtype == np.uint8
    # NHWC uint8 passthrough
    lt = LoadTensor(np.zeros((1, 16, 24, 3), np.uint8))
    assert next(iter(lt))[1].shape == (16, 24, 3)
    # un-normalized floats rejected (ref LoadTensor._single_check)
    with pytest.raises(ValueError):
        LoadTensor(np.full((1, 3, 8, 8), 255.0, np.float32))


def test_load_inference_source_routes_tensor():
    from yolo_tpu.data.loaders import LoadTensor, load_inference_source

    src = load_inference_source(np.zeros((2, 32, 32, 3), np.uint8))
    assert isinstance(src, LoadTensor)


def test_grounding_dataset(tmp_path):
    import cv2

    from yolo_tpu.data.dataset import GroundingDataset

    img = np.random.default_rng(0).integers(0, 255, (64, 96, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "im0.jpg"), img)
    ann = {
        "images": [{"id": 1, "file_name": "im0.jpg", "height": 64, "width": 96,
                    "caption": "a small aircraft near a cloud"}],
        "annotations": [
            {"image_id": 1, "bbox": [10, 10, 20, 12], "iscrowd": 0, "tokens_positive": [[8, 16]]},
            {"image_id": 1, "bbox": [50, 30, 14, 10], "iscrowd": 0, "tokens_positive": [[24, 29]]},
            {"image_id": 1, "bbox": [0, 0, 5, 5], "iscrowd": 1, "tokens_positive": [[0, 1]]},  # crowd skipped
        ],
    }
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    ds = GroundingDataset(str(tmp_path), str(tmp_path / "ann.json"), imgsz=64)
    assert len(ds) == 1
    lb = ds.labels[0]
    assert lb["texts"] == [["aircraft"], ["cloud"]]
    assert lb["cls"].tolist() == [0.0, 1.0]
    # center-xywh normalization (ref cache_labels box math)
    assert np.allclose(lb["bboxes"][0], [20 / 96, 16 / 64, 20 / 96, 12 / 64], atol=1e-6)
    item = ds[0]
    assert "texts" in item and item["img"].shape[0] == 64


def test_shipped_dataset_yaml_registry():
    """Bare dataset names resolve against the shipped cfg/datasets registry
    (ref: data/utils.py check_det_dataset's DATASETS_DIR lookup)."""
    from yolo_tpu.data.dataset import check_det_dataset

    d = check_det_dataset("coco8.yaml")
    assert d["nc"] == 80 and d["names"][0] == "person" and d["names"][79] == "toothbrush"
    p = check_det_dataset("coco8-pose.yaml")
    assert list(p["kpt_shape"]) == [17, 3] and len(p["flip_idx"]) == 17
    o = check_det_dataset("dota8.yaml")
    assert o["nc"] == 15
    ir = check_det_dataset("ir-small-target.yaml")
    assert ir["nc"] == 1 and ir["names"][0] == "aircraft"


def _write_img(path, w=32, h=32):
    import cv2
    import numpy as np

    cv2.imwrite(str(path), np.full((h, w, 3), 90, np.uint8))


def test_single_cls_invalidates_label_cache(tmp_path):
    """Toggling single_cls must not serve the other mode's cached class ids."""
    from yolo_tpu.data.dataset import YOLODataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    _write_img(tmp_path / "images" / "a.jpg")
    (tmp_path / "labels" / "a.txt").write_text("3 0.5 0.5 0.2 0.2\n")
    d_multi = YOLODataset(str(tmp_path / "images"), imgsz=32)
    assert d_multi.labels[0]["cls"][0] == 3.0
    d_single = YOLODataset(str(tmp_path / "images"), imgsz=32, single_cls=True)
    assert d_single.labels[0]["cls"][0] == 0.0  # stale cache served 3.0 before


def test_list_file_paths_resolve_relative_to_list(tmp_path, monkeypatch):
    """./-style entries in a list txt resolve against the txt's parent, not cwd."""
    from yolo_tpu.data.dataset import YOLODataset

    ds = tmp_path / "ds"
    (ds / "images").mkdir(parents=True)
    (ds / "labels").mkdir()
    _write_img(ds / "images" / "a.jpg")
    (ds / "labels" / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    (ds / "train.txt").write_text("./images/a.jpg\n")
    monkeypatch.chdir(tmp_path)  # cwd != list parent
    d = YOLODataset(str(ds / "train.txt"), imgsz=32)
    assert len(d) == 1 and d.load_raw(0)["img"] is not None


def test_triangle_polygon_parses_as_segment(tmp_path):
    """A 3-point polygon row (7 fields) is a segment, not a garbage box."""
    from yolo_tpu.data.dataset import YOLODataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    _write_img(tmp_path / "images" / "a.jpg")
    (tmp_path / "labels" / "a.txt").write_text("0 0.2 0.2 0.8 0.2 0.5 0.9\n")
    d = YOLODataset(str(tmp_path / "images"), imgsz=32, task="segment", cache=False)
    lb = d.labels[0]
    assert lb["segments"] is not None and lb["segments"][0] is not None
    assert lb["segments"][0].shape == (3, 2)
    np.testing.assert_allclose(lb["bboxes"][0], [0.5, 0.55, 0.6, 0.7], atol=1e-6)  # polygon-tight xywh


def test_mosaic4_obb_with_background_tile():
    """A background tile (obb=None) must not drop the obb key for the mosaic."""
    from yolo_tpu.data.augment import mosaic4

    rng = np.random.default_rng(0)
    corners = np.array([[[4, 4], [12, 4], [12, 12], [4, 12]]], np.float32)
    labeled = {
        "img": np.full((32, 32, 3), 50, np.uint8),
        "bboxes": np.array([[4, 4, 12, 12]], np.float32),
        "cls": np.array([0.0], np.float32),
        "obb": corners,
    }
    background = {
        "img": np.full((32, 32, 3), 20, np.uint8),
        "bboxes": np.zeros((0, 4), np.float32),
        "cls": np.zeros((0,), np.float32),
        "obb": None,
    }
    import random as pyrandom

    out = mosaic4([labeled, background, dict(labeled), dict(background)], 32, pyrandom.Random(0))
    assert "obb" in out and len(out["obb"]) == len(out["bboxes"])


def test_copy_paste_clips_out_of_bounds_donor():
    """Donor boxes extending past the donor frame must not crash the blit."""
    import random as pyrandom

    from yolo_tpu.data.augment import copy_paste

    labels = {
        "img": np.full((64, 64, 3), 30, np.uint8),
        "bboxes": np.zeros((0, 4), np.float32),
        "cls": np.zeros((0,), np.float32),
    }
    donor = {
        "img": np.full((64, 64, 3), 200, np.uint8),
        "bboxes": np.array([[50.0, 50.0, 80.0, 80.0]], np.float32),  # extends past 64
        "cls": np.array([1.0], np.float32),
    }
    out = copy_paste(labels, donor, p=1.0, rng=pyrandom.Random(0))
    assert len(out["bboxes"]) in (0, 1)  # no ValueError; clipped patch pasted or skipped


def test_copy_paste_keeps_segments_aligned():
    """Segment-task labels: pasted instances must extend the segments list
    (a shorter list crashes random_perspective's keep-mask; None entries would
    silently drop the pasted instances)."""
    import random as pyrandom

    from yolo_tpu.data.augment import copy_paste, random_perspective

    labels = {
        "img": np.full((64, 64, 3), 30, np.uint8),
        "bboxes": np.array([[2.0, 2.0, 10.0, 10.0]], np.float32),
        "cls": np.array([0.0], np.float32),
        "segments": [np.array([[2, 2], [10, 2], [10, 10], [2, 10]], np.float32)],
    }
    donor = {
        "img": np.full((64, 64, 3), 200, np.uint8),
        "bboxes": np.array([[20.0, 20.0, 40.0, 40.0]], np.float32),
        "cls": np.array([1.0], np.float32),
    }
    out = copy_paste(labels, donor, p=1.0, rng=pyrandom.Random(3))
    assert len(out["bboxes"]) == 2  # the paste actually happened
    assert len(out["segments"]) == len(out["bboxes"]) == len(out["cls"])
    # and the full aug chain stays consistent (this crashed pre-fix)
    out = random_perspective(out, degrees=0, translate=0.1, scale=0.1, rng=pyrandom.Random(0))
    assert len(out["segments"]) == len(out["bboxes"]) == len(out["cls"])
