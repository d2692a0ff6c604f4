#!/usr/bin/env python3
"""Inference chunk-capacity curve (VERDICT r4 next#8): fused detect+track fps
and compiled HBM footprint vs chunk size, as a committed artifact so the
chunk=512 default survives hardware/driver drift. The sweep previously lived
only as comments in bench.py.

Writes demos/artifacts/chunk_curve_r5.txt: chunk | fps | ms/chunk | temp HBM
(compiled memory_analysis) | notes. Knob: BENCH_CHUNK in bench.py.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.getenv("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_clip
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.pipeline import FusedDetectTrack

    h, w = 512, 640
    model = DetectionModel("yolov8-small.yaml")
    params = model.fuse(model.init(0))
    chunks = [int(c) for c in os.getenv("CHUNK_SWEEP", "256,384,512,640,768,1024").split(",")]
    clip = make_clip(max(chunks) * 4, h, w)

    rows = []
    for chunk in chunks:
        ft = FusedDetectTrack(
            model, params, frame_hw=(h, w), channels=1, chunk=chunk,
            conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
            n_max=64, d_max=16,
        )
        n_bufs = max(2, (len(clip) // chunk) if chunk >= 768 else 4)
        bufs = [ft.put_frames(clip[i * chunk : (i + 1) * chunk]) for i in range(n_bufs)]
        _ = [np.asarray(b[0, 0, 0]) for b in bufs]
        state, st = ft.state, ft.stats
        for b in bufs[:2]:
            state, st, _p = ft._fused(ft.params, state, st, b)
            _ = int(np.asarray(st["frames"]))
        fps = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            for b in bufs:
                state, st, _p = ft._fused(ft.params, state, st, b)
            _ = int(np.asarray(st["frames"]))
            fps = max(fps, n_bufs * chunk / (time.perf_counter() - t0))
        ft.state, ft.stats = state, st
        # compiled HBM footprint of the fused executable
        temp_mb = arg_mb = out_mb = -1.0
        try:
            lowered = ft._fused.lower(ft.params, ft.state, ft.stats, jax.ShapeDtypeStruct((chunk, h, w, 1), np.uint8))
            ma = lowered.compile().memory_analysis()
            temp_mb = ma.temp_size_in_bytes / 1e6
            arg_mb = ma.argument_size_in_bytes / 1e6
            out_mb = ma.output_size_in_bytes / 1e6
        except Exception:
            pass
        rows.append((chunk, fps, chunk / fps * 1e3, temp_mb, arg_mb, out_mb))
        print(f"chunk {chunk:5d}: {fps:7.1f} fps  {chunk / fps * 1e3:7.1f} ms/chunk  temp {temp_mb:8.1f} MB", flush=True)
        del ft, bufs

    best = max(rows, key=lambda r: r[1])
    lines = [
        "Inference chunk-capacity curve — fused detect+track @640x512 gray bf16 (v5e, 1 chip)",
        time.strftime("date: %Y-%m-%d"),
        "harness: demos/chunk_curve.py (device-resident, preferred-layout staging,",
        "  double warm, best of 2 timed passes over >=2 distinct staged chunks)",
        "",
        f"{'chunk':>6} {'fps':>9} {'ms/chunk':>9} {'temp HBM MB':>12} {'args MB':>9} {'out MB':>8}",
    ]
    for chunk, fps, ms, tmb, amb, omb in rows:
        mark = "  <-- default" if chunk == 512 else (" (knee)" if chunk == best[0] and chunk != 512 else "")
        lines.append(f"{chunk:>6} {fps:>9.1f} {ms:>9.1f} {tmb:>12.1f} {amb:>9.1f} {omb:>8.1f}{mark}")
    lines += [
        "",
        f"best: chunk {best[0]} at {best[1]:.1f} fps; default 512 keeps "
        f"{rows[[r[0] for r in rows].index(512)][1] / best[1] * 100:.1f}% of best at "
        "the smallest activation working set — raise BENCH_CHUNK on hosts with slower dispatch.",
    ]
    out = Path(__file__).parent / "artifacts" / "chunk_curve_r5.txt"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
