#!/usr/bin/env python3
"""Roofline + stage-split analysis of the fused detect+track pipeline on the
real chip (VERDICT r2 next#1).

Answers, with measurements: where does the device time go (conv forward vs
decode+NMS vs Kalman scan vs stats/pack), and how close is each part to its
hardware bound (peak MXU flops vs peak HBM bandwidth)?

Outputs one JSON blob to stdout + a readable table on stderr. Run on the TPU:

    python demos/roofline.py            # chunk=512 default
    BENCH_CHUNK=1024 python demos/roofline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e (per chip): 197 TFLOP/s bf16 / 394 TOP/s int8, 819 GB/s HBM.
PEAK_TFLOPS = float(os.getenv("PEAK_TFLOPS", "197"))
PEAK_GBPS = float(os.getenv("PEAK_GBPS", "819"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.getenv("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from bench import make_clip
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.ops.nms import non_max_suppression_parts
    from yolo_tpu.pipeline import FusedDetectTrack

    chunk = int(os.getenv("BENCH_CHUNK", "512"))
    h, w = 512, 640
    reps = int(os.getenv("REPS", "4"))

    model = DetectionModel("yolov8-small.yaml")
    params = model.fuse(model.init(0))

    ft = FusedDetectTrack(
        model, params, frame_hw=(h, w), channels=1, chunk=chunk,
        conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
        n_max=64, d_max=16,
    )

    clip = make_clip(chunk, h, w)
    dev_frames = jax.device_put(clip)
    _ = np.asarray(dev_frames[0, 0, 0])  # barrier through the tunnel

    # stage programs mirror fused() exactly (same gray-folded params staged by
    # FusedDetectTrack), each cut at a different point, each returning a tiny
    # reduction so nothing big is downloaded
    p_dev = ft.params
    dtype = jnp.bfloat16

    @jax.jit
    def fwd_only(p, frames):
        x = frames.astype(dtype) if ft.norm_folded else frames.astype(dtype) / 255.0
        b, s = model.predict_parts(p, x, dtype=dtype, neck_opt=ft.neck_opt)
        return b.sum() + s.sum()

    @jax.jit
    def fwd_nms(p, frames):
        # anchors-major parts + the fused program's own max_nms, so
        # ms_full - ms_fwdnms isolates the scan/stats (the reference-layout
        # path would pay an extra transpose + 4x top_k and go negative)
        x = frames.astype(dtype) if ft.norm_folded else frames.astype(dtype) / 255.0
        b, s = model.predict_parts(p, x, dtype=dtype, neck_opt=ft.neck_opt)
        det = non_max_suppression_parts(b, s, conf_thres=0.15, iou_thres=0.6, max_det=16, max_nms=ft.max_nms)
        return det["boxes"].sum() + det["scores"].sum()

    def timeit(label, fn, *args, n=reps):
        r = fn(*args)  # compile + warm
        jax.block_until_ready(r)
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / n * 1e3
        log(f"{label:>28}: {ms:9.2f} ms/chunk  ({chunk / ms * 1e3:8.1f} fps)")
        return ms

    log(f"== stage split @ chunk={chunk}, {h}x{w} gray, bf16 ==")
    ms_fwd = timeit("forward only", fwd_only, p_dev, dev_frames)

    ms_fwdnms = timeit("forward + decode/NMS", fwd_nms, p_dev, dev_frames)

    def full(p, state, stats, frames):
        state, stats, packed = ft._fused(p, state, stats, frames)
        return packed

    # full fused: donated state/stats → re-init each call outside the timer.
    # Warm TWICE — the second call pays a one-time executable-staging cost
    # through this environment's relay (~3.5 s once per program).
    ft.reset()
    st, sa = ft.state, ft.stats
    for _ in range(2):
        st, sa, packed = ft._fused(p_dev, st, sa, dev_frames)
        _ = np.asarray(packed[0, 0, 0])  # real barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        st, sa, packed = ft._fused(p_dev, st, sa, dev_frames)
    jax.block_until_ready(packed)
    ms_full = (time.perf_counter() - t0) / reps * 1e3
    log(f"{'full fused (fwd+NMS+scan)':>28}: {ms_full:9.2f} ms/chunk  ({chunk / ms_full * 1e3:8.1f} fps)")

    ms_nms = ms_fwdnms - ms_fwd
    ms_scan = ms_full - ms_fwdnms

    # analytical roofline of the forward
    flops_frame = 0.0
    bytes_acc = 0.0
    try:
        lowered = fwd_only.lower(p_dev, dev_frames)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_frame = float(cost.get("flops", 0.0)) / chunk
        bytes_acc = float(cost.get("bytes accessed", 0.0)) / chunk
    except Exception as e:
        log(f"cost analysis unavailable: {e}")

    achieved_tflops = flops_frame * chunk / ms_fwd / 1e9 if flops_frame else 0.0
    mfu = achieved_tflops / PEAK_TFLOPS
    achieved_gbps = bytes_acc * chunk / ms_fwd / 1e6 if bytes_acc else 0.0
    bwu = achieved_gbps / PEAK_GBPS

    log("\n== forward roofline ==")
    log(f"flops/frame: {flops_frame / 1e9:.2f} GF, XLA bytes-accessed/frame: {bytes_acc / 1e6:.1f} MB")
    log(f"achieved: {achieved_tflops:.1f} TFLOP/s = {mfu * 100:.1f}% MFU; {achieved_gbps:.0f} GB/s = {bwu * 100:.1f}% HBM peak")

    # per-layer roofline (batch small to keep 26 compiles quick; per-frame
    # numbers scale linearly in batch for this conv net)
    per_layer = None
    if os.getenv("PER_LAYER", "1") == "1":
        from yolo_tpu.utils.profilers import profile_per_layer

        log("\n== per-layer (batch 32) ==")
        per_layer = profile_per_layer(
            model, params, imgsz=(h, w), batch=32, dtype=dtype,
            roofline=(PEAK_TFLOPS, PEAK_GBPS), channels=3,
        )

    out = {
        "chunk": chunk,
        "ms_forward": round(ms_fwd, 2),
        "ms_nms": round(ms_nms, 2),
        "ms_scan_stats": round(ms_scan, 2),
        "ms_full": round(ms_full, 2),
        "share_forward": round(ms_fwd / ms_full, 3),
        "share_nms": round(ms_nms / ms_full, 3),
        "share_scan": round(ms_scan / ms_full, 3),
        "gflops_frame": round(flops_frame / 1e9, 2) if flops_frame else None,
        "xla_mbytes_frame": round(bytes_acc / 1e6, 1) if bytes_acc else None,
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu_pct": round(mfu * 100, 1),
        "achieved_gbps": round(achieved_gbps, 0),
        "hbm_pct": round(bwu * 100, 1),
        "fps_full": round(chunk / ms_full * 1e3, 1),
        "fps_forward_only": round(chunk / ms_fwd * 1e3, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
