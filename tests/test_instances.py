"""Bboxes/Instances container semantics."""

import numpy as np
import pytest

from yolo_tpu.utils.instance import Bboxes, Instances


def test_bboxes_format_roundtrip():
    b = Bboxes(np.array([[10, 20, 30, 60]], np.float32), "xyxy")
    b.convert("xywh")
    assert np.allclose(b.bboxes, [[20, 40, 20, 40]])
    b.convert("ltwh")
    assert np.allclose(b.bboxes, [[10, 20, 20, 40]])
    b.convert("xyxy")
    assert np.allclose(b.bboxes, [[10, 20, 30, 60]])
    assert b.areas()[0] == pytest.approx(800)


def test_bboxes_concat_and_index():
    a = Bboxes(np.array([[0, 0, 10, 10]], np.float32), "xyxy")
    b = Bboxes(np.array([[5, 5, 10, 10]], np.float32), "xywh")
    c = Bboxes.concatenate([a, b])
    assert len(c) == 2 and c.format == "xyxy"
    assert np.allclose(c[1].bboxes, [[0, 0, 10, 10]])


def test_instances_flip_and_scale():
    inst = Instances(np.array([[0.5, 0.5, 0.2, 0.4]], np.float32), bbox_format="xywh", normalized=True)
    inst.denormalize(100, 200)
    inst.convert_bbox("xyxy")
    assert np.allclose(inst.bboxes, [[40, 60, 60, 140]])
    inst.fliplr(100)
    assert np.allclose(inst.bboxes, [[40, 60, 60, 140]])  # symmetric box
    inst.flipud(200)
    assert np.allclose(inst.bboxes, [[40, 60, 60, 140]])
    inst.add_padding(10, 20)
    assert np.allclose(inst.bboxes, [[50, 80, 70, 160]])
    inst.clip(60, 100)
    assert np.allclose(inst.bboxes, [[50, 80, 60, 100]])
    good = inst.remove_zero_area_boxes()
    assert good.all()
