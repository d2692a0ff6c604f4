"""Mesh sharding + multi-stream inference over the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_mesh_and_batch_sharding():
    import jax

    from yolo_tpu.parallel import get_mesh, replicate, shard_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = get_mesh(8)
    batch = {"img": np.zeros((16, 8, 8, 3), np.uint8), "cls": np.zeros((16, 4), np.float32)}
    dev = shard_batch(batch, mesh)
    assert len(dev["img"].sharding.device_set) == 8
    params = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_multi_stream_runner_sharded():
    import jax

    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.parallel import get_mesh
    from yolo_tpu.parallel.streams import MultiStreamRunner

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = get_mesh(8)
    model = DetectionModel("yolov8n.yaml")
    params = model.fuse(model.init(0))
    runner = MultiStreamRunner(model, params, n_streams=8, frame_hw=(64, 64), conf=0.9, mesh=mesh)
    frames = np.random.default_rng(0).integers(0, 255, (8, 64, 64, 3), np.uint8)
    results = runner.step(frames)
    assert len(results) == 8
    # per-stream trackers are isolated: inject detections into stream 3 only
    runner.trackers[3].update([[10, 10, 30, 30, 0.9]])
    assert runner.trackers[3].stats["total_tracks_created"] == 1
    assert runner.trackers[0].stats["total_tracks_created"] == 0


def test_stream_run_loop():
    import jax

    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.parallel.streams import MultiStreamRunner

    model = DetectionModel("yolov8n.yaml")
    params = model.fuse(model.init(0))
    runner = MultiStreamRunner(model, params, n_streams=2, frame_hw=(64, 64), conf=0.9)

    def frames():
        for _ in range(3):
            yield np.zeros((64, 64, 3), np.uint8)

    steps = list(runner.run([frames(), frames()], max_steps=5))
    assert len(steps) == 3  # exhausted after 3 frames per stream


def test_multistream_run_accepts_generator():
    """run() materializes the iterable of per-stream iterators — a generator
    was consumed by the first step and crashed np.stack on the second."""
    import numpy as np

    from yolo_tpu.parallel.streams import MultiStreamRunner

    class _Detless(MultiStreamRunner):
        def __init__(self):  # bypass model compile; step() uses _fn + trackers
            self.n_streams = 2
            self.conf = 0.5
            self.params = None
            self._fn = lambda p, frames: {
                "boxes": np.zeros((len(frames), 4, 4), np.float32),
                "scores": np.zeros((len(frames), 4), np.float32),
                "cls": np.zeros((len(frames), 4), np.float32),
                "valid": np.zeros((len(frames), 4), bool),
            }
            from yolo_tpu.kalman.multi_tracker import EnhancedMultiTargetTracker

            self.trackers = [EnhancedMultiTargetTracker() for _ in range(2)]

    r = _Detless()
    frames = [np.zeros((8, 8, 1), np.uint8)] * 3
    steps = list(r.run(iter(f) for f in (frames, frames)))
    assert len(steps) == 3
