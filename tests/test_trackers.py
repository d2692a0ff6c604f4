"""MOT tracker tests: Kalman filter parity with the reference, ByteTrack behavior
on synthetic streams, and golden parity of the full BYTETracker."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available


def synth_stream(n_frames=40, drop=(15, 22)):
    """Two targets moving linearly; target 0 drops out during `drop` window."""
    frames = []
    for f in range(n_frames):
        dets = []
        if not (drop[0] <= f < drop[1]):
            dets.append(([100 + 4 * f, 200.0, 30.0, 20.0], 0.9, 0))
        dets.append(([400 - 3 * f + 0.01 * f * f, 300.0, 40.0, 24.0], 0.85, 0))
        frames.append(dets)
    return frames


def _args(**over):
    from yolo_tpu.utils import IterableSimpleNamespace

    base = dict(
        tracker_type="bytetrack", track_high_thresh=0.25, track_low_thresh=0.1,
        new_track_thresh=0.25, track_buffer=30, match_thresh=0.8, fuse_score=True,
        gmc_method="sparseOptFlow", proximity_thresh=0.5, appearance_thresh=0.8, with_reid=False,
    )
    base.update(over)
    return IterableSimpleNamespace(**base)


def test_kalman_xyah_parity_with_reference():
    if not reference_available():
        pytest.skip("no reference")
    add_reference_to_path()
    from ultralytics.trackers.utils.kalman_filter import KalmanFilterXYAH as RefKF

    from yolo_tpu.trackers.kalman_filter import KalmanFilterXYAH

    ours, ref = KalmanFilterXYAH(), RefKF()
    z0 = np.array([100.0, 200.0, 1.5, 20.0])
    m1, c1 = ours.initiate(z0)
    m2, c2 = ref.initiate(z0)
    assert np.allclose(m1, m2) and np.allclose(c1, c2)
    for i in range(5):
        m1, c1 = ours.predict(m1, c1)
        m2, c2 = ref.predict(m2, c2)
        z = z0 + [4.0 * i, -2.0 * i, 0, 0.1 * i]
        m1, c1 = ours.update(m1, c1, z)
        m2, c2 = ref.update(m2, c2, z)
        assert np.allclose(m1, m2, atol=1e-8) and np.allclose(c1, c2, atol=1e-8)
    # vectorized multi_predict == scalar predict
    means = np.stack([m1, m1 + 1])
    covs = np.stack([c1, c1 * 1.1])
    mm, cc = ours.multi_predict(means.copy(), covs.copy())
    ms, cs = ours.predict(means[0].copy(), covs[0].copy())
    assert np.allclose(mm[0], ms) and np.allclose(cc[0], cs)


def test_bytetracker_track_continuity():
    from yolo_tpu.trackers.byte_tracker import BYTETracker

    tracker = BYTETracker(_args(), frame_rate=30)
    ids_t0 = []
    for f, dets in enumerate(synth_stream()):
        boxes = np.array([d[0] for d in dets], np.float32)
        scores = np.array([d[1] for d in dets], np.float32)
        cls = np.array([d[2] for d in dets], np.float32)
        out = tracker.update(boxes, scores, cls)
        for row in out:
            if abs(row[1] + row[3] - 2 * 200.0) < 60:  # target 0 row (y≈200)
                ids_t0.append((f, int(row[4])))
    # target 0's id must be stable before the dropout and re-acquired after
    pre = {i for f, i in ids_t0 if f < 15}
    post = {i for f, i in ids_t0 if f >= 22}
    assert len(pre) == 1
    assert pre == post, "track id must survive a 7-frame dropout via lost-state reactivation"


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_bytetracker_golden_parity():
    """Same det stream → identical ids/boxes as the reference BYTETracker."""
    add_reference_to_path()
    from types import SimpleNamespace

    from ultralytics.trackers.byte_tracker import BYTETracker as RefTracker

    from yolo_tpu.trackers.byte_tracker import BYTETracker

    class FakeBoxes:
        """Duck-type of ultralytics Boxes for RefTracker.update."""

        def __init__(self, xywh, conf, cls):
            self.xywh = xywh
            self.conf = conf
            self.cls = cls

        def __len__(self):
            return len(self.conf)

        def __getitem__(self, idx):
            return FakeBoxes(self.xywh[idx], self.conf[idx], self.cls[idx])

    ours = BYTETracker(_args(), frame_rate=30)
    ref = RefTracker(_args(), frame_rate=30)

    rng = np.random.default_rng(0)
    for f, dets in enumerate(synth_stream(n_frames=35)):
        boxes = np.array([d[0] for d in dets], np.float32) + rng.normal(0, 0.3, (len(dets), 4)).astype(np.float32)
        scores = np.array([d[1] for d in dets], np.float32)
        cls = np.array([d[2] for d in dets], np.float32)
        out_a = ours.update(boxes.copy(), scores.copy(), cls.copy())
        out_b = ref.update(FakeBoxes(boxes.copy(), scores.copy(), cls.copy()))
        assert out_a.shape == np.asarray(out_b).shape, (f, out_a, out_b)
        if len(out_a):
            a = out_a[np.argsort(out_a[:, 4])]
            b = np.asarray(out_b)[np.argsort(np.asarray(out_b)[:, 4])]
            assert np.allclose(a[:, :5], b[:, :5], atol=1e-3), (f, a, b)


def test_track_glue_assigns_ids():
    from yolo_tpu.engine.results import Results
    from yolo_tpu.trackers.track import attach_tracker

    class M:
        pass

    model = M()
    results = []
    img = np.zeros((480, 640, 3), np.uint8)
    for f in range(5):
        boxes = np.array([[100 + 5 * f, 200, 140 + 5 * f, 230, 0.9, 0]], np.float32)
        results.append(Results(img, f"f{f}", {0: "t"}, boxes=boxes))
    tracked = attach_tracker(model, results, persist=True)
    ids = [r.boxes.id for r in tracked if len(r.boxes)]
    assert all(i is not None for i in ids)
    flat = {int(i[0]) for i in ids if i is not None and len(i)}
    assert len(flat) == 1  # one stable id


def test_botsort_reid_encoder_path():
    """BOTSORT with a model-backed ReID encoder (ref: bot_sort.py ReID:252):
    crops embed through Model.embed and appearance costs gate matching."""
    from types import SimpleNamespace

    from yolo_tpu.trackers.bot_sort import BOTSORT

    args = SimpleNamespace(
        tracker_type="botsort", track_high_thresh=0.25, track_low_thresh=0.1,
        new_track_thresh=0.25, track_buffer=30, match_thresh=0.8, fuse_score=True,
        gmc_method="none", proximity_thresh=0.5, appearance_thresh=0.8,
        with_reid=True, model="yolov8n.yaml",
    )
    t = BOTSORT(args, frame_rate=30)
    assert t.encoder is not None
    img = np.random.default_rng(0).integers(0, 255, (128, 160, 3), np.uint8)
    for f in range(3):
        boxes = np.array([[40 + 2 * f, 60, 30, 24]], np.float32)
        out = t.update(boxes, np.array([0.9], np.float32), np.array([0], np.float32), img=img)
    assert len(out) == 1
    trk = t.tracked_stracks[0]
    assert getattr(trk, "smooth_feat", None) is not None
    assert abs(float(np.linalg.norm(trk.smooth_feat)) - 1.0) < 1e-3


def test_botsort_reid_feats_follow_conf_split():
    """Review finding: feats must be subset like the detections across the
    high/low-conf split, and the track glue must pass the frame through so
    ReID/GMC see pixels."""
    import numpy as np

    from yolo_tpu.trackers.bot_sort import BOTSORT
    from yolo_tpu.trackers.track import load_tracker_cfg

    cfg = load_tracker_cfg("botsort.yaml")
    cfg.with_reid = True
    cfg.model = "auto"  # reuse detection feats
    t = BOTSORT(args=cfg, frame_rate=30)
    img = np.zeros((64, 64, 3), np.uint8)
    # det 1 is low-conf → only dets 0 and 2 reach the first stage; their feats
    # must be f0 and f2 (not f0 and f1)
    boxes = np.array([[10, 10, 8, 8], [30, 30, 8, 8], [50, 50, 8, 8]], np.float32)
    scores = np.array([0.9, 0.2, 0.8], np.float32)
    cls = np.zeros(3, np.float32)
    f = np.eye(3, 8, dtype=np.float32)  # distinguishable embeddings
    t.update(boxes, scores, cls, img=img, feats=f)
    by_pos = {round(float(tr.tlwh[0])): tr for tr in t.tracked_stracks}
    assert 6 in by_pos and 46 in by_pos  # tlwh x = cx - w/2
    assert np.argmax(np.abs(by_pos[6].curr_feat)) == 0
    assert np.argmax(np.abs(by_pos[46].curr_feat)) == 2


def test_byte_tracker_zero_detections():
    """Empty detection sets are a valid update call (reshape(0,-1) crashed)."""
    from yolo_tpu.trackers.byte_tracker import BYTETracker
    from yolo_tpu.trackers.track import load_tracker_cfg

    t = BYTETracker(args=load_tracker_cfg(None), frame_rate=30)
    out = t.update(np.zeros((0, 4), np.float32), np.zeros((0,), np.float32), np.zeros((0,), np.float32))
    assert out.shape[0] == 0
    # and normal frames still work afterwards (new tracks after frame 1
    # start unconfirmed, so the track emits from its second hit)
    for _ in range(2):
        out = t.update(np.array([[50, 50, 10, 10]], np.float32), np.array([0.9], np.float32), np.array([0], np.float32))
    assert out.shape[0] == 1


def _rich_stream(n_frames=60, seed=3, n_targets=5):
    """Multi-target scene with dropouts, low-conf dips (second-stage rescue),
    late joiners and departures — targets kept well separated so greedy and
    optimal assignment agree (the batched twin's documented contract)."""
    rng = np.random.default_rng(seed)
    starts = rng.uniform([60, 60], [560, 420], (n_targets, 2))
    vels = rng.uniform(-4, 4, (n_targets, 2))
    frames = []
    for f in range(n_frames):
        dets = []
        for t in range(n_targets):
            if t == 2 and 20 <= f < 28:
                continue  # full dropout → lost + re-acquire
            if t == 3 and f < 10:
                continue  # late joiner
            if t == 4 and f > 45:
                continue  # departure
            cx, cy = starts[t] + vels[t] * f
            if not (20 < cx < 620 and 20 < cy < 490):
                continue
            conf = 0.9 if not (t == 1 and 30 <= f < 36) else 0.18  # low-conf dip → stage-2 rescue
            w, h = 26 + 2 * t, 18 + t
            dets.append(([cx, cy, w, h], conf, t % 3))
        frames.append(dets)
    return frames


def test_batched_byte_twin_golden_parity():
    """The jitted slot-table ByteTrack step reproduces the object
    implementation frame-exactly across dropouts, low-conf rescues, births and
    expiries (rows compared id-sorted; the host list order is an artifact of
    its python list plumbing)."""
    from yolo_tpu.trackers.batched import BatchedBYTETracker
    from yolo_tpu.trackers.byte_tracker import BYTETracker

    host = BYTETracker(_args(), frame_rate=30)
    dev = BatchedBYTETracker(_args(), frame_rate=30, n_max=64, d_max=16)
    rng = np.random.default_rng(1)
    for f, dets in enumerate(_rich_stream()):
        boxes = np.array([d[0] for d in dets], np.float32).reshape(-1, 4)
        boxes = boxes + rng.normal(0, 0.25, boxes.shape).astype(np.float32)
        scores = np.array([d[1] for d in dets], np.float32)
        cls = np.array([d[2] for d in dets], np.float32)
        a = host.update(boxes.copy(), scores.copy(), cls.copy())
        b = dev.update(boxes.copy(), scores.copy(), cls.copy())
        assert a.shape == b.shape, (f, a, b)
        if len(a):
            a = a[np.argsort(a[:, 4])]
            b = b[np.argsort(b[:, 4])]
            np.testing.assert_allclose(a, b, atol=2e-2, err_msg=f"frame {f}")


def test_batched_byte_twin_scan_matches_stepwise():
    """scan_frames (one on-device lax.scan over the chunk) == per-frame update."""
    from yolo_tpu.trackers.batched import BatchedBYTETracker

    frames = _rich_stream(n_frames=40, seed=7)
    D = 16
    T = len(frames)
    xywh = np.zeros((T, D, 4), np.float32)
    sc = np.zeros((T, D), np.float32)
    cl = np.zeros((T, D), np.float32)
    mask = np.zeros((T, D), bool)
    for f, dets in enumerate(frames):
        for i, (b, s, c) in enumerate(dets[:D]):
            xywh[f, i], sc[f, i], cl[f, i], mask[f, i] = b, s, c, True

    step = BatchedBYTETracker(_args(), frame_rate=30, n_max=64, d_max=D)
    rows_stepwise = [step.update(xywh[f][mask[f]], sc[f][mask[f]], cl[f][mask[f]]) for f in range(T)]

    scan = BatchedBYTETracker(_args(), frame_rate=30, n_max=64, d_max=D)
    outs = scan.scan_frames(xywh, sc, cl, mask)
    for f in range(T):
        keep = np.flatnonzero(outs["emit"][f])
        keep = keep[np.argsort(outs["track_id"][f][keep])]
        got = np.concatenate(
            [outs["xyxy"][f][keep],
             outs["track_id"][f][keep, None], outs["score"][f][keep, None],
             outs["cls"][f][keep, None], outs["det_idx"][f][keep, None]], axis=1,
        ) if len(keep) else np.zeros((0, 8), np.float32)
        np.testing.assert_allclose(rows_stepwise[f], got, atol=1e-4, err_msg=f"frame {f}")


def test_device_tracker_default_routing(monkeypatch):
    """The batched device twin is the DEFAULT model.track bytetrack path on TPU
    backends (VERDICT r4 next#3); YOLO_TPU_DEVICE_TRACKER is the override in
    both directions; non-TPU backends default to the host STrack loop."""
    import yolo_tpu.trackers.track as tmod
    from yolo_tpu.trackers.batched import BatchedBYTETracker
    from yolo_tpu.trackers.byte_tracker import BYTETracker

    # default ON when the backend reports tpu, OFF otherwise
    monkeypatch.setattr(tmod, "_device_tracker_default", lambda: True)
    assert isinstance(tmod.create_tracker("bytetrack.yaml"), BatchedBYTETracker)
    # kill switch wins over a TPU backend
    monkeypatch.setenv("YOLO_TPU_DEVICE_TRACKER", "0")
    assert isinstance(tmod.create_tracker("bytetrack.yaml"), BYTETracker)
    monkeypatch.delenv("YOLO_TPU_DEVICE_TRACKER")
    monkeypatch.setattr(tmod, "_device_tracker_default", lambda: False)
    assert isinstance(tmod.create_tracker("bytetrack.yaml"), BYTETracker)
    # botsort never routes through the byte twin regardless of backend
    monkeypatch.setattr(tmod, "_device_tracker_default", lambda: True)
    assert not isinstance(tmod.create_tracker("botsort.yaml"), BatchedBYTETracker)


def test_device_tracker_glue_optin(monkeypatch):
    """YOLO_TPU_DEVICE_TRACKER=1 routes model.track's bytetrack through the
    batched device twin; track rows match the host tracker route."""
    import yolo_tpu
    from yolo_tpu.trackers.track import create_tracker

    monkeypatch.setenv("YOLO_TPU_DEVICE_TRACKER", "1")
    dev = create_tracker("bytetrack.yaml")
    from yolo_tpu.trackers.batched import BatchedBYTETracker

    assert isinstance(dev, BatchedBYTETracker)
    monkeypatch.setenv("YOLO_TPU_DEVICE_TRACKER", "0")
    host = create_tracker("bytetrack.yaml")
    rng = np.random.default_rng(0)
    for f in range(20):
        boxes = np.array([[100 + 2 * f, 100, 20, 14], [300, 200 - f, 24, 18]], np.float32)
        boxes += rng.normal(0, 0.2, boxes.shape).astype(np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        cls = np.array([0, 1], np.float32)
        a = host.update(boxes.copy(), scores.copy(), cls.copy())
        b = dev.update(boxes.copy(), scores.copy(), cls.copy())
        assert a.shape == b.shape
        if len(a):
            a = a[np.argsort(a[:, 4])]
            b = b[np.argsort(b[:, 4])]
            np.testing.assert_allclose(a, b, atol=2e-2, err_msg=f"frame {f}")
