#!/usr/bin/env python3
"""On-chip A/B: sparse box head (Detect.sparse_candidates) vs the dense parts
route, full fused detect+track @ chunk 512, 640x512 gray, bf16.

Same harness discipline as demos/pallas_ab.py: double warm (compile + one-time
executable staging through the dev tunnel), element-download barriers, best of
2 timed passes per variant, both variants measured in the same invocation so
tunnel drift can't masquerade as a win.
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

    runs = []
    for name, sparse in [("dense parts (r4 default)", False), ("sparse box head", True), ("dense parts (repeat)", False)]:
        ft = FusedDetectTrack(model, params, sparse_head=sparse, **kw)
        fps = measure(ft)
        runs.append({"variant": name, "fps": round(fps, 1)})
        print(json.dumps(runs[-1]), flush=True)
        del ft

    # correctness on chip: same chunk through both, compare stats + tables
    ftd = FusedDetectTrack(model, params, sparse_head=False, **kw)
    fts = FusedDetectTrack(model, params, sparse_head=True, **kw)
    od = ftd.process_chunk(clip[:chunk])
    osp = fts.process_chunk(clip[:chunk])
    agree = bool(
        (od["track_num"] == osp["track_num"]).all()
        and (od["status"] == osp["status"]).all()
        and np.allclose(od["bbox"], osp["bbox"], atol=0.5)
    )
    print(json.dumps({"on_chip_parity": agree}))


if __name__ == "__main__":
    main()
