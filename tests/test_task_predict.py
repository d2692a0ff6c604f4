"""Predict-mode routing for the non-detect tasks through the facade
(ref: models/yolo/{classify,pose,obb}/predict.py): pose keypoints must ride
the NMS extra channel with nc explicit (NOT be parsed as class scores), OBB
must go through rotated probiou NMS and come back as xywhr `.obb`, classify
must return `.probs` with no NMS at all — plus the Results plot/save_txt
surfaces for each."""

import os
import tempfile

import numpy as np

import yolo_tpu

IMG = np.random.default_rng(0).integers(0, 255, (64, 96, 3), np.uint8)


def test_pose_predict_keypoints():
    m = yolo_tpu.YOLO("yolov8n-pose.yaml")
    r = m.predict(IMG, conf=0.001, imgsz=(64, 96), verbose=False)[0]
    assert r.keypoints is not None
    n = len(r)
    assert r.keypoints.data.shape == (n, 17, 3)
    # keypoint xy are inverse-letterboxed into original-image coords
    if n:
        assert r.keypoints.data[..., 0].max() <= IMG.shape[1]
        assert r.keypoints.data[..., 1].max() <= IMG.shape[0]
    # conf must come from the nc class channels, not the 51 kpt channels:
    # every reported confidence is a plausible sigmoid score
    assert (np.asarray(r.boxes.conf) <= 1.0).all()
    r.plot()  # draws skeleton without error


def test_obb_predict_rotated():
    m = yolo_tpu.YOLO("yolov8n-obb.yaml")
    r = m.predict(IMG, conf=1e-6, imgsz=(64, 96), verbose=False)[0]
    assert getattr(r, "obb", None) is not None
    assert r.obb.data.shape[-1] == 7  # cx, cy, w, h, angle, conf, cls
    assert len(r) == len(r.obb)  # __len__ counts obb results
    r.plot()  # rotated quads
    with tempfile.TemporaryDirectory() as d:
        f = os.path.join(d, "t.txt")
        r.save_txt(f)
        lines = [ln for ln in open(f) if ln.strip()]
        assert len(lines) == len(r)
        if lines:
            assert len(lines[0].split()) == 9  # cls + 8 corner coords


def test_classify_predict_probs():
    m = yolo_tpu.YOLO("yolov8n-cls.yaml")
    r = m.predict(IMG, conf=0.25, imgsz=(64, 96), verbose=False)[0]
    assert getattr(r, "probs", None) is not None
    p = r.probs
    assert 0 <= p.top1 < m.model.nc
    assert len(p.top5) == 5
    np.testing.assert_allclose(p.data.sum(), 1.0, rtol=1e-3)  # softmaxed
    r.plot()  # top-5 text block
    with tempfile.TemporaryDirectory() as d:
        f = os.path.join(d, "t.txt")
        r.save_txt(f)
        assert sum(1 for _ in open(f)) == 5


def test_detect_plot_flags():
    """show_conf / show_boxes flow from args into Results.plot."""
    m = yolo_tpu.YOLO("yolov8-small.yaml")
    r = m.predict(IMG, conf=0.001, imgsz=(64, 96), verbose=False)[0]
    base = r.plot(boxes=True)
    blank = r.plot(boxes=False)
    if len(r):  # drawing must change pixels only when boxes are on
        assert (base != blank).any()
    assert (blank == r.plot(boxes=False)).all()


def test_obb_tracking_ids_persist():
    """OBB results track on xywhr with probiou association; ids persist and
    angles ride through (ref: trackers/track.py is_obb branch,
    byte_tracker.py STrack angle)."""
    from yolo_tpu.engine.results import OBBoxes, Results
    from yolo_tpu.trackers.track import attach_tracker

    img = np.zeros((200, 200, 3), np.uint8)

    def frame(dx):
        r = Results(img, "f.jpg", {0: "plane"}, boxes=None)
        r.obb = OBBoxes(
            np.array(
                [[50 + dx, 50, 30, 10, 0.5, 0.9, 0], [150 + dx, 150, 20, 8, -0.3, 0.8, 0]],
                np.float32,
            ),
            img.shape[:2],
        )
        return r

    class _M:
        pass

    m = _M()
    out1 = attach_tracker(m, [frame(0)], persist=True, tracker_cfg="bytetrack.yaml")[0]
    out2 = attach_tracker(m, [frame(3)], persist=True, tracker_cfg="bytetrack.yaml")[0]
    assert len(out1) == len(out2) == 2
    assert out1.obb.is_track and out2.obb.is_track
    assert list(out1.obb.id) == list(out2.obb.id)
    np.testing.assert_allclose(out2.obb.xywhr[:, 4], [0.5, -0.3], atol=1e-6)
    out2.plot()  # rotated quads with id labels


def test_segment_retina_masks():
    """retina_masks=True produces native-resolution masks that agree with the
    default two-step path (ref: segment/predict.py process_mask_native)."""
    m = yolo_tpu.YOLO("yolov8n-seg.yaml")
    r0 = m.predict(IMG, conf=1e-6, imgsz=(64, 96), verbose=False)[0]
    m2 = yolo_tpu.YOLO("yolov8n-seg.yaml")
    m2.params = m.params
    r1 = m2.predict(IMG, conf=1e-6, imgsz=(64, 96), retina_masks=True, verbose=False)[0]
    assert len(r0) == len(r1)
    assert r0.masks.data.shape == r1.masks.data.shape == (len(r0),) + IMG.shape[:2]
    if len(r0):
        a, b = r0.masks.data, r1.masks.data
        inter = (a & b).sum()
        union = (a | b).sum()
        assert union == 0 or inter / union > 0.7  # same masks, crisper edges


def test_summary_covers_all_result_kinds():
    """summary()/to_json include probs / obb corners / keypoints / mask
    segments / track ids (ref Results.summary:788)."""
    from yolo_tpu.engine.results import Keypoints, Masks, OBBoxes, Probs, Results

    img = np.zeros((40, 60, 3), np.uint8)

    r = Results(img, "x", {0: "a", 1: "b"}, boxes=None)
    r.probs = Probs(np.array([0.1, 0.9], np.float32))
    s = r.summary()
    assert s == [{"name": "b", "class": 1, "confidence": 0.9}]

    r = Results(img, "x", {0: "t"}, boxes=None)
    r.obb = OBBoxes(np.array([[30, 20, 10, 6, 0.3, 7.0, 0.8, 0]], np.float32)[:, [0, 1, 2, 3, 4, 5, 6, 7]], img.shape[:2])
    s = r.summary()
    assert s[0]["track_id"] == 7 and "x4" in s[0]["box"]

    boxes = np.array([[5, 5, 20, 20, 0.9, 0]], np.float32)
    r = Results(img, "x", {0: "t"}, boxes=boxes)
    mk = np.zeros((1, 40, 60), bool); mk[0, 8:18, 8:18] = True
    r.masks = Masks(mk, img.shape[:2])
    r.keypoints = Keypoints(np.array([[[10, 10, 1.0], [12, 14, 0.8]]], np.float32), img.shape[:2])
    s = r.summary(normalize=True)
    assert "segments" in s[0] and "keypoints" in s[0]
    assert max(s[0]["segments"]["x"]) <= 1.0
    assert len(s[0]["keypoints"]["x"]) == 2
    r.to_json()
