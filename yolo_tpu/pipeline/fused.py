"""Fused detect+track: one XLA program per video chunk.

The TPU-native end-game of the fork's pipeline (SURVEY §7: "batch frames per
step and scan the Kalman update over time with state carried across steps"):

    frames (T, H, W, C) uint8
      → normalize → yolov8-small(P2) forward → DFL decode → NMS   [batch-parallel]
      → lax.scan(batched Kalman tracker step) over the T frames   [sequential]
      → per-frame track table outputs (tiny)

Transport discipline (the perf contract — a host↔device round-trip through a
serialized transport costs ~100-200 ms of latency, so the steady-state loop
must never synchronize per chunk):

  - ONE upload per chunk (`device_put` of the uint8 frames);
  - ALL per-frame outputs packed into ONE dense (T, N, 12) f32 tensor inside
    the jit, so a chunk's results are a single device buffer;
  - the contract stats (detection/prediction frame counts + state switches,
    ref kalman/aircraft_detection_tracking.py:111-131) are accumulated ON
    DEVICE as part of the carried state — `run_clip` dispatches every chunk
    asynchronously and blocks exactly once at the end, downloading the packed
    buffers and the stats scalars in a single drain.

Tracking semantics = yolo_tpu.kalman.batched (itself output-parity-tested
against the reference's EnhancedMultiTargetTracker).
"""

from __future__ import annotations

import os

import numpy as np

from yolo_tpu.kalman.batched import STATUS_DETECTED, STATUS_NONE, STATUS_PREDICTED, init_state, make_step

_UNSET = object()  # "preferred frame layout not resolved yet" sentinel

# packed (T, N, 12) column layout. track_num rides an f32 column: ids stay
# exact up to 2^24 (~16.7M created tracks per uninterrupted stream) — beyond
# that, reset() the pipeline or consume ids from the on-device state instead.
_COLS = dict(bbox=slice(0, 4), confidence=4, emit=5, status=6, time_since_update=7, track_num=8, velocity=slice(9, 11), det_count=11)


def _unpack(packed: np.ndarray) -> dict:
    """(T, N, 12) f32 → the per-frame output dict (host side)."""
    return {
        "bbox": packed[..., _COLS["bbox"]],
        "confidence": packed[..., _COLS["confidence"]],
        "emit": packed[..., _COLS["emit"]] > 0.5,
        "status": packed[..., _COLS["status"]].astype(np.int32),
        "time_since_update": packed[..., _COLS["time_since_update"]].astype(np.int32),
        "track_num": packed[..., _COLS["track_num"]].astype(np.int32),
        "velocity": packed[..., _COLS["velocity"]],
        "det_count": packed[:, 0, _COLS["det_count"]].astype(np.int32),
    }


def init_stats(n_max: int):
    """Fresh on-device stats accumulator (prev_* carry crosses chunk edges)."""
    import jax.numpy as jnp

    return {
        "frames": jnp.zeros((), jnp.int32),
        "detection_frames": jnp.zeros((), jnp.int32),
        "prediction_frames": jnp.zeros((), jnp.int32),
        "state_changes": jnp.zeros((), jnp.int32),
        "prev_status": jnp.full((n_max,), STATUS_NONE, jnp.int32),
        "prev_nums": jnp.zeros((n_max,), jnp.int32),
    }


class FusedDetectTrack:
    """Chunked fused detect+track over a fixed frame geometry."""

    def __init__(
        self,
        model,
        params,
        frame_hw=(512, 640),
        channels: int = 1,
        chunk: int = 128,
        conf: float = 0.15,
        iou: float = 0.6,
        max_lost_frames: int = 150,
        min_hits: int = 1,
        iou_threshold: float = 0.1,
        n_max: int = 64,
        d_max: int = 16,
        dtype=None,
        int8: bool = False,
        int8_calib=None,
        mesh=None,
        s2d: int = 0,
        max_nms: int = 0,
        pallas_head: bool = False,
        neck_opt: bool | None = None,
        pallas_c2f: bool = False,
        unroll: int | None = None,
        sparse_head: bool | None = None,
        pallas_head2: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.nms import non_max_suppression_logits, non_max_suppression_parts

        if channels == 1:
            # grayscale stem fold: conv(broadcast(x, 3ch), W) == conv(x, sum_c W)
            # exactly — frames stay single-channel end to end (no 3x broadcast
            # materialization in HBM). Runs BEFORE quantization so the int8
            # path folds float weights (summing already-quantized int8 rows
            # could overflow ±127).
            stem = params["model"]["0"]["conv"]
            if "weight" in stem and np.asarray(stem["weight"]).shape[2] == 3:
                params = dict(params)
                params["model"] = dict(params["model"])
                # keep sibling groups (an unfused stem still carries "bn")
                params["model"]["0"] = {
                    **params["model"]["0"],
                    "conv": {**stem, "weight": np.asarray(stem["weight"]).sum(axis=2, keepdims=True)},
                }
        # /255 normalize fold: conv(x/255, W) == conv(x, W/255) exactly (conv is
        # linear; BN after conv commutes too), so the uint8 frames feed the stem
        # as a bare bf16 cast and the full-resolution normalize pass — the
        # single largest input-side HBM consumer in the compiled forward
        # (demos/fwd_analysis.py round 4: ~1 GB/chunk of cast+scale traffic) —
        # never materializes. Skipped for int8 (activation scales calibrate on
        # /255 inputs) and s2d (its pack path normalizes explicitly).
        norm_folded = False
        if not int8 and not s2d:
            stem = params["model"]["0"]["conv"]
            if "weight" in stem:
                params = dict(params)
                params["model"] = dict(params["model"])
                params["model"]["0"] = {
                    **params["model"]["0"],
                    "conv": {**stem, "weight": np.asarray(stem["weight"], np.float32) / 255.0},
                }
                norm_folded = True
        if int8:  # PTQ conv path (nn/quantize.py) — params must be fused
            from yolo_tpu.nn.quantize import calibrate_act_scales, quantize_params

            scales = None
            if int8_calib is not None:
                # static activation scales from a representative frame batch
                # (uint8 (B, H, W, C)) — removes the per-conv dynamic max
                # reduction from the hot path. Calibrate on the (possibly
                # gray-folded) params with matching channel count.
                cal = np.asarray(int8_calib).astype(np.float32) / 255.0
                in_ch = np.asarray(params["model"]["0"]["conv"]["weight"]).shape[2]
                if cal.shape[-1] == 1 and in_ch == 3:
                    cal = np.broadcast_to(cal, cal.shape[:-1] + (3,))
                elif cal.shape[-1] == 3 and in_ch == 1:
                    cal = cal.mean(axis=-1, keepdims=True)
                scales = calibrate_act_scales(model, params, jnp.asarray(cal))
            params = quantize_params(params, act_scales=scales, flow_paths=model.int8_flow_paths())

        if s2d:
            # space-to-depth stem fold (nn/s2d.py): rewrite the two stride-2
            # stem convs onto lane-dense packed layouts — the layout-level fix
            # for the HBM-bound forward's padded small-channel stem traffic
            assert not int8, "s2d and int8 are mutually exclusive (int8 is retired; see nn/quantize.py)"
            assert frame_hw[0] % s2d == 0 and frame_hw[1] % s2d == 0, f"frame {frame_hw} not divisible by s2d={s2d}"
            from yolo_tpu.nn.s2d import fold_stem, validate_stem

            validate_stem(model)  # stride/act are invisible in params — check the modules
            params = {**params, "s2d": fold_stem(params, s2d)}
        # NMS candidate slots: 4x the track capacity. Measured duplicate-
        # anchor fan-in with the demo-trained P2 model is ~1.25 anchors per
        # target at conf 0.15 (10 candidates for 8 planted small targets), so
        # 4x d_max carries a >3x margin at full capacity; exact top_k cost
        # scales hard with K on TPU (51.3 -> 19.0 ms per 1024-frame chunk
        # going 256 -> 64, identical outputs). Scenes with large/defocused
        # targets (higher fan-in) can pass max_nms explicitly.
        if neck_opt is None:
            # shipped default: the Upsample→Concat→C2f fold won the on-chip
            # A/B (5324 vs 5170 fps @512, demos/pallas_ab.py 2026-08-18); it
            # needs fused float params, so auto-off for int8/unfused trees.
            from yolo_tpu.nn.tasks import params_are_fused_float

            neck_opt = not int8 and params_are_fused_float(params)
        self.neck_opt = neck_opt
        self.norm_folded = norm_folded  # stem weights carry the /255; feed bare-cast frames
        self.max_nms = max_nms or max(4 * d_max, 64)
        self.s2d = s2d
        # lazy decode (top-k by score, DFL-decode only the winners) is
        # bit-identical to the parts route (tests/test_fused_pipeline.py) but
        # measured SLOWER on chip at this K (5579 vs 5739 fps @512, d_max=16:
        # the 3 per-level row gathers cost more than the ~2 ms of all-anchor
        # DFL traffic they avoid; a cross-level bins concat is worse still,
        # 5065 fps). Opt-in via YOLO_TPU_LAZY_DECODE=1 for wide-max_nms /
        # many-class configs where the decode-everything side grows.
        from yolo_tpu.nn import modules as _M

        self.lazy_decode = (
            os.getenv("YOLO_TPU_LAZY_DECODE", "0") == "1"
            and not s2d
            and not int8
            and not pallas_head
            and not pallas_c2f
            and type(model.head) is _M.Detect
        )
        # sparse box head (Detect.sparse_candidates): dense cls branch only,
        # cv2 regression + DFL computed on one-hot-gathered 5x5 patches at
        # the top-k anchors. Float-tolerance-exact vs the parts route
        # (tests/test_sparse_head.py incl. on-chip parity in
        # demos/sparse_ab.py). A/B status (demos/sparse_ab.py, v5e, chunk
        # 512): dense 5775 vs sparse 4695 fps — the patch-selection matmuls
        # still cost more than the dense regression maps they avoid; stays
        # opt-in (YOLO_TPU_SPARSE_HEAD=1) until a measured win flips it.
        if sparse_head is None:
            from yolo_tpu.nn.tasks import params_are_fused_float

            sparse_head = (
                os.getenv("YOLO_TPU_SPARSE_HEAD", "0") == "1"
                and not s2d
                and not int8
                and not pallas_head
                and not pallas_c2f
                and not pallas_head2
                and not self.lazy_decode
                and type(model.head) is _M.Detect
                and params_are_fused_float(params)
            )
        self.sparse_head = sparse_head
        self.chunk = chunk
        self.d_max = d_max
        self.n_max = n_max
        self.conf = conf
        # Kalman-scan unroll factor: constructor kwarg wins, else the
        # YOLO_TPU_SCAN_UNROLL env var (read ONCE here, not at trace time —
        # the jit cache would silently pin the first value anyway), else 8.
        if unroll is None:
            raw = os.getenv("YOLO_TPU_SCAN_UNROLL", "8")
            try:
                unroll = int(raw)
            except ValueError:
                raise ValueError(
                    f"YOLO_TPU_SCAN_UNROLL={raw!r} is not an integer; set it to a "
                    "positive scan-unroll factor (default 8)"
                ) from None
        if unroll < 1:
            raise ValueError(f"scan unroll must be >= 1, got {unroll}")
        self.unroll = unroll
        dtype = dtype or jnp.bfloat16
        tracker_step = make_step(n_max, d_max, max_lost_frames, min_hits, iou_threshold)

        gray_folded = channels == 1

        def fused(p, track_state, stats, frames):
            # anchors-major decode parts feed NMS directly — the reference's
            # transposed (B, 4+nc, A) layout never materializes in this program
            if s2d:
                from yolo_tpu.nn.s2d import pack_input

                fr = frames if frames.shape[-1] == 1 else frames[..., ::-1]  # BGR→RGB
                x = pack_input(fr, s2d).astype(dtype) / 255.0  # pack on uint8, cast on the dense layout
                boxes_xywh, scores = model.predict_s2d(p, x, dtype=dtype, parts=True)
            else:
                x = frames.astype(dtype) if norm_folded else frames.astype(dtype) / 255.0
                if frames.shape[-1] == 1 and not gray_folded:
                    x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
                elif frames.shape[-1] != 1:
                    x = x[..., ::-1]  # BGR→RGB
                if self.sparse_head:
                    det = model.predict_sparse_det(
                        p, x, conf_thres=conf, iou_thres=iou, max_det=d_max,
                        max_nms=self.max_nms, dtype=dtype, neck_opt=neck_opt,
                    )
                    boxes_xywh = None
                elif self.lazy_decode:
                    # lazy decode: top-k on scores FIRST, DFL-decode only the
                    # winners (bit-identical outputs; the all-anchor decode
                    # intermediates never materialize — see
                    # ops/nms.non_max_suppression_logits)
                    bins, scores, anc, strd, proj = model.predict_logits(
                        p, x, dtype=dtype, neck_opt=neck_opt
                    )
                    det = non_max_suppression_logits(
                        bins, scores, anc, strd, proj,
                        conf_thres=conf, iou_thres=iou, max_det=d_max, max_nms=self.max_nms,
                    )
                    boxes_xywh = None
                else:
                    boxes_xywh, scores = model.predict_parts(
                        p, x, dtype=dtype, pallas_head=pallas_head, neck_opt=neck_opt,
                        pallas_c2f=pallas_c2f, pallas_head2=pallas_head2,
                    )
            if boxes_xywh is not None:
                det = non_max_suppression_parts(boxes_xywh, scores, conf_thres=conf, iou_thres=iou, max_det=d_max, max_nms=self.max_nms)
            det_boxes = det["boxes"]  # (T, d_max, 4)
            det_mask = det["valid"] & (det["scores"] > conf)  # (T, d_max)

            def body(state, inp):
                boxes, mask = inp
                return tracker_step(state, boxes, mask)

            # unroll=8 amortizes the per-iteration scan overhead of the tiny
            # tracker step (measured 131 → 113 us/step on v5e at chunk 1024;
            # re-swept 2026-08-19 @chunk 512 full-fused: unroll 4→5488,
            # 8→5572, 16→5530, 32→5555 fps — 8 stays the default)
            track_state, outs = jax.lax.scan(body, track_state, (det_boxes, det_mask), unroll=self.unroll)

            T = det_boxes.shape[0]
            status = jnp.where(outs["emit"], outs["status"], STATUS_NONE)  # (T, N)
            nums = outs["track_num"]
            # contract stats on device — per-slot status transitions under the
            # same id, including the edge between the previous chunk and this one
            full_status = jnp.concatenate([stats["prev_status"][None], status])
            full_nums = jnp.concatenate([stats["prev_nums"][None], nums])
            changed = (
                (full_status[1:] != full_status[:-1])
                & (full_status[1:] != STATUS_NONE)
                & (full_status[:-1] != STATUS_NONE)
                & (full_nums[1:] == full_nums[:-1])
            )
            stats = {
                "frames": stats["frames"] + T,
                "detection_frames": stats["detection_frames"] + (status == STATUS_DETECTED).sum(),
                "prediction_frames": stats["prediction_frames"] + (status == STATUS_PREDICTED).sum(),
                "state_changes": stats["state_changes"] + changed.sum(),
                "prev_status": status[-1],
                "prev_nums": nums[-1],
            }

            f32 = jnp.float32
            packed = jnp.concatenate(
                [
                    outs["bbox"].astype(f32),
                    outs["confidence"].astype(f32)[..., None],
                    outs["emit"].astype(f32)[..., None],
                    outs["status"].astype(f32)[..., None],
                    outs["time_since_update"].astype(f32)[..., None],
                    outs["track_num"].astype(f32)[..., None],
                    outs["velocity"].astype(f32),
                    jnp.broadcast_to(det_mask.sum(-1).astype(f32)[:, None, None], (T, self.n_max, 1)),
                ],
                axis=-1,
            )
            return track_state, stats, packed

        # Mesh mode: inputs are COMMITTED to the mesh (params/state replicated,
        # frames batch-sharded) and jit infers the program's shardings from
        # them — explicit in_/out_shardings here measurably defeat buffer
        # donation (measured 3901 → 2272 fps on a 1-device mesh). With a
        # 1-device mesh this is the sharding-overhead control bench.py
        # reports; multi-device stream layouts live in parallel/streams.py
        # (the scan carry is sequential in T, so sharding T over devices is
        # not the scaling story here).
        self.mesh = mesh
        self._fused = jax.jit(fused, donate_argnums=(1, 2))
        # stage params in HBM once — otherwise every chunk re-uploads the whole
        # parameter tree through the (slow) host link, dwarfing the frame upload
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._repl = NamedSharding(mesh, P())
            self._batch_sh = NamedSharding(mesh, P("batch"))
            self.params = jax.device_put(params, self._repl)
        else:
            self._repl = self._batch_sh = None
            self.params = jax.device_put(params)
        self.state = self._place(init_state(n_max))
        self.stats = self._place(init_stats(n_max))
        self._frame_fmt = _UNSET

    def _place(self, tree):
        import jax

        return jax.device_put(tree, self._repl) if self._repl is not None else tree

    def _frame_format(self, frames):
        """The fused executable's preferred device layout for the frame input.

        device_put's default layout for (T, H, W, C) uint8 is C-minor; the
        compiled program consumes frames W-minor (lanes=W, sublanes=H), so
        every chunk paid a full-resolution on-device relayout copy (measured
        671 MB physical per 512-chunk, demos/fwd_analysis.py round 4).
        Uploading straight into the preferred Format removes it. Resolved
        lazily from the jit cache after the first compile; single-device mode
        only (mesh mode shards the batch axis instead)."""
        if self._frame_fmt is not _UNSET:
            return self._frame_fmt
        import jax

        fmt = None
        try:
            lowered = self._fused.lower(self.params, self.state, self.stats, jax.ShapeDtypeStruct(frames.shape, frames.dtype))
            infmt = lowered.compile().input_formats
            fmt = infmt[0][-1]  # last arg = frames
        except Exception:
            fmt = None
        self._frame_fmt = fmt
        return fmt

    def put_frames(self, frames):
        """Stage a frame chunk on the device (batch-sharded when mesh mode;
        uploaded in the executable's preferred layout otherwise)."""
        import jax

        if self._batch_sh is not None:
            return jax.device_put(frames, self._batch_sh)
        fmt = self._frame_format(frames)
        return jax.device_put(frames, fmt) if fmt is not None else jax.device_put(frames)

    def reset(self):
        self.state = self._place(init_state(self.n_max))
        self.stats = self._place(init_stats(self.n_max))

    def process_chunk_device(self, frames: np.ndarray):
        """Dispatch one chunk; returns the packed (T, N, 12) DEVICE buffer
        without any host synchronization."""
        import jax

        assert frames.shape[0] == self.chunk, f"chunk must be {self.chunk}, got {frames.shape[0]}"
        dev = self.put_frames(frames)  # batch-sharded in mesh mode
        self.state, self.stats, packed = self._fused(self.params, self.state, self.stats, dev)
        return packed

    def process_chunk(self, frames: np.ndarray):
        """frames: (T, H, W, C) uint8 with T == chunk → dict of per-frame outputs."""
        return _unpack(np.asarray(self.process_chunk_device(frames)))

    def run_clip(self, clip: np.ndarray, collect_stats: bool = True, collect_outputs: bool = True, prefetch: int = 2):
        """Stream a whole clip; returns (outputs list, contract stats).

        Every chunk is dispatched asynchronously (one upload, one packed device
        output, stats carried on device); uploads are double-buffered on a
        background thread so the H2D transfer of chunk k+1 overlaps the fused
        program of chunk k. The single host synchronization is the drain at
        the end. Stats mirror the reference demo's observable counters (ref:
        kalman/aircraft_detection_tracking.py :111-131).
        """
        import concurrent.futures

        import jax

        T = self.chunk
        n_chunks = len(clip) // T
        if len(clip) % T:
            from yolo_tpu.utils import LOGGER

            LOGGER.warning(
                f"run_clip: dropping the last {len(clip) % T} frames — the fused program "
                f"runs fixed {T}-frame chunks (pad the clip or pick a chunk that divides it)"
            )
        device_outs = []
        # prefetch depth k: chunk k+1 uploads while the main thread is inside
        # the (relay-bound) dispatch of chunk k, and up to `prefetch` chunks
        # are queued so the upload link never idles on dispatch bookkeeping
        depth = max(1, prefetch)
        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
            pending = [pool.submit(self.put_frames, clip[i * T : (i + 1) * T]) for i in range(min(depth, n_chunks))]
            for ci in range(n_chunks):
                dev = pending.pop(0).result()
                if ci + depth < n_chunks:
                    pending.append(pool.submit(self.put_frames, clip[(ci + depth) * T : (ci + depth + 1) * T]))
                self.state, self.stats, packed = self._fused(self.params, self.state, self.stats, dev)
                if collect_outputs:
                    device_outs.append(packed)
                # else: drop the reference — backend may skip materializing
        all_out = [_unpack(np.asarray(p)) for p in device_outs]
        stats = {k: int(np.asarray(v)) for k, v in self.stats.items() if not k.startswith("prev_")} if collect_stats else {}
        return all_out, stats
