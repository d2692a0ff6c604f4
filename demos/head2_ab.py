#!/usr/bin/env python3
"""On-chip A/B: channel-major fused head kernel (ops/pallas_head2.py) vs the
XLA conv walk, full fused detect+track @ chunk 512, 640x512 gray, bf16.

Variants: dense XLA (shipping default), kernel on P2 only, kernel on P2+P3,
kernel on all levels. Same harness discipline as demos/sparse_ab.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.getenv("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_clip
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.pipeline import FusedDetectTrack

    chunk = int(os.getenv("BENCH_CHUNK", "512"))
    h, w = 512, 640
    model = DetectionModel("yolov8-small.yaml")
    params = model.fuse(model.init(0))
    clip = make_clip(6 * chunk, h, w)

    kw = dict(
        frame_hw=(h, w), channels=1, chunk=chunk, conf=0.15, iou=0.6,
        max_lost_frames=150, min_hits=1, iou_threshold=0.1, n_max=64, d_max=16,
    )

    def measure(pipe):
        bufs = [pipe.put_frames(clip[i * chunk : (i + 1) * chunk]) for i in range(6)]
        _ = [np.asarray(b[0, 0, 0]) for b in bufs]
        state, st = pipe.state, pipe.stats
        for b in bufs[:2]:
            state, st, _p = pipe._fused(pipe.params, state, st, b)
            _ = int(np.asarray(st["frames"]))
        fps = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            for b in bufs:
                state, st, _p = pipe._fused(pipe.params, state, st, b)
            _ = int(np.asarray(st["frames"]))
            fps = max(fps, 6 * chunk / (time.perf_counter() - t0))
        pipe.state, pipe.stats = state, st
        return fps

    variants = [
        ("dense XLA walk (default)", {}, None),
        ("head2 kernel P2 only", {"pallas_head2": True}, "0"),
        ("head2 kernel P2+P3", {"pallas_head2": True}, "0,1"),
        ("head2 kernel all levels", {"pallas_head2": True}, ""),
        ("dense XLA walk (repeat)", {}, None),
    ]
    for name, extra, lv in variants:
        if lv is not None:
            os.environ["YOLO_TPU_PALLAS_HEAD2_LEVELS"] = lv
        try:
            ft = FusedDetectTrack(model, params, **extra, **kw)
            fps = measure(ft)
            print(json.dumps({"variant": name, "fps": round(fps, 1)}), flush=True)
            del ft
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:300]}), flush=True)
        finally:
            os.environ.pop("YOLO_TPU_PALLAS_HEAD2_LEVELS", None)

    # on-chip correctness: kernel route vs dense on one chunk
    ftd = FusedDetectTrack(model, params, **kw)
    ftk = FusedDetectTrack(model, params, pallas_head2=True, **kw)
    od = ftd.process_chunk(clip[:chunk])
    ok = ftk.process_chunk(clip[:chunk])
    agree = bool(
        (od["track_num"] == ok["track_num"]).all()
        and (od["status"] == ok["status"]).all()
        and np.allclose(od["bbox"], ok["bbox"], atol=0.5)
    )
    print(json.dumps({"on_chip_parity": agree}))


if __name__ == "__main__":
    main()
