"""Batched fixed-capacity Kalman multi-target tracker — the TPU fast path.

Same semantics as the object-per-track manager (yolo_tpu.kalman.multi_tracker,
ref: kalman/enhanced_multi_target_tracker.py update:42 7-step loop +
enhanced_aircraft_kalman_tracker.py filter math) re-designed for XLA:

  - Track state is a pytree of (N_max, …) arrays (slots), not Python objects.
  - predict/update are batched matmuls over all slots at once; the greedy
    IoU association is a masked-argmax `fori_loop` (D_max iterations).
  - The whole step is one jitted function `(state, detections) → (state, out)`,
    `lax.scan`-able over a frame axis so an entire video chunk of tracking runs
    on-device without per-frame host sync.
  - ID parity: slots are claimed in detection-index order with a running
    counter, so numeric ids match the reference's "T%03d" creation order.

Velocity history lives in a 50-deep ring buffer per slot (same capacity as the
reference deque) powering the same motion-pattern analysis (mean/std velocity,
direction consistency, stability, prediction confidence) and long-term
extrapolation with confidence decay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.kalman.tracker import _make_F, _make_P0, _make_Q, R_MEAS

VEL_HIST = 50  # reference velocity_history deque maxlen

# status codes in the output arrays
STATUS_NONE = 0
STATUS_DETECTED = 1
STATUS_PREDICTED = 2


def init_state(n_max: int = 64):
    """Fresh empty track table."""
    return {
        "x": jnp.zeros((n_max, 8), jnp.float32),
        "P": jnp.zeros((n_max, 8, 8), jnp.float32),
        "active": jnp.zeros((n_max,), bool),
        "is_lost": jnp.zeros((n_max,), bool),
        "age": jnp.zeros((n_max,), jnp.int32),
        "hits": jnp.zeros((n_max,), jnp.int32),
        "hit_streak": jnp.zeros((n_max,), jnp.int32),
        "time_since_update": jnp.zeros((n_max,), jnp.int32),
        "lost_frames": jnp.zeros((n_max,), jnp.int32),
        "track_num": jnp.zeros((n_max,), jnp.int32),
        "vel_hist": jnp.zeros((n_max, VEL_HIST, 2), jnp.float32),
        "vel_count": jnp.zeros((n_max,), jnp.int32),  # total updates (ring write ptr = count % VEL_HIST)
        "next_id": jnp.ones((), jnp.int32),
        "frame_count": jnp.zeros((), jnp.int32),
    }


def _bbox_to_z(bboxes):
    """(…, 4) xyxy → (…, 4) cxcywh."""
    x1, y1, x2, y2 = bboxes[..., 0], bboxes[..., 1], bboxes[..., 2], bboxes[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


def _state_to_bbox(x):
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _iou_matrix(det_boxes, trk_boxes):
    """(D, N) IoU between xyxy sets (degenerate → 0, reference semantics)."""
    lt = jnp.maximum(det_boxes[:, None, :2], trk_boxes[None, :, :2])
    rb = jnp.minimum(det_boxes[:, None, 2:], trk_boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (det_boxes[:, 2] - det_boxes[:, 0]) * (det_boxes[:, 3] - det_boxes[:, 1])
    a2 = (trk_boxes[:, 2] - trk_boxes[:, 0]) * (trk_boxes[:, 3] - trk_boxes[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _motion_analysis(vel_hist, vel_count):
    """Vectorized analyze_motion_pattern (ref tracker :137-182) over all slots.

    Returns (prediction_confidence, avg_velocity (2,), stability) per slot;
    slots with <5 recorded velocities keep confidence 0 (reference early-out).
    """
    n = jnp.minimum(vel_count, VEL_HIST)  # valid entries
    idx = jnp.arange(VEL_HIST)
    valid = idx[None, :] < n[:, None]  # ring is chronologically ordered only if count<cap; for
    # parity with deque semantics we reconstruct chronological order below.

    # chronological gather: oldest entry sits at (count % cap) when full
    start = jnp.where(vel_count >= VEL_HIST, vel_count % VEL_HIST, 0)
    order = (start[:, None] + idx[None, :]) % VEL_HIST
    hist = jnp.take_along_axis(vel_hist, order[..., None], axis=1)  # (N, cap, 2) chronological

    mask = valid[..., None].astype(jnp.float32)
    denom = jnp.maximum(n, 1).astype(jnp.float32)[:, None]
    mean_v = (hist * mask).sum(1) / denom  # (N, 2)
    var_v = ((hist - mean_v[:, None]) ** 2 * mask).sum(1) / denom
    std_v = jnp.sqrt(var_v)

    speed_stability = 1.0 / (1.0 + std_v.mean(-1))

    headings = jnp.arctan2(hist[..., 1], hist[..., 0])  # (N, cap)
    dh = headings[:, 1:] - headings[:, :-1]
    dh = jnp.where(jnp.abs(dh) < jnp.pi, dh, dh - 2 * jnp.pi * jnp.sign(dh))
    pair_valid = (idx[None, 1:] < n[:, None]).astype(jnp.float32)
    m = jnp.maximum(pair_valid.sum(1), 1.0)
    dh_mean = (dh * pair_valid).sum(1) / m
    dh_std = jnp.sqrt(jnp.clip(((dh - dh_mean[:, None]) ** 2 * pair_valid).sum(1) / m, 0, None))
    dir_consistency = jnp.where(n >= 3, 1.0 / (1.0 + dh_std * 10.0), 0.0)

    stability = (speed_stability + dir_consistency) / 2.0
    data_conf = jnp.minimum(n.astype(jnp.float32) / 30.0, 1.0)
    confidence = jnp.where(n >= 5, stability * data_conf, 0.0)
    return confidence, mean_v, stability


def _inv4(a):
    """Closed-form adjugate inverse of batched 4×4 matrices.

    `jnp.linalg.inv` lowers tiny batched inverses to LU with pivoting — dozens
    of ops per scanned tracker step; the adjugate is pure fusable elementwise
    math (measured ~8 us/step faster inside the scan, max err ~2e-8 on
    well-conditioned innovation covariances, which S = P[:4,:4] + R always is)."""

    def det3(rows, cols):
        (r0, r1, r2), (c0, c1, c2) = rows, cols
        return (
            a[..., r0, c0] * (a[..., r1, c1] * a[..., r2, c2] - a[..., r1, c2] * a[..., r2, c1])
            - a[..., r0, c1] * (a[..., r1, c0] * a[..., r2, c2] - a[..., r1, c2] * a[..., r2, c0])
            + a[..., r0, c2] * (a[..., r1, c0] * a[..., r2, c1] - a[..., r1, c1] * a[..., r2, c0])
        )

    idx = (0, 1, 2, 3)
    cof = [
        jnp.stack(
            [((-1) ** (i + j)) * det3([r for r in idx if r != i], [c for c in idx if c != j]) for j in idx],
            -1,
        )
        for i in idx
    ]
    adj = jnp.stack(cof, -1)  # adjugate = cofactor matrix transposed
    det = sum(a[..., 0, j] * cof[0][..., j] for j in idx)
    return adj / det[..., None, None]


def make_step(n_max: int = 64, d_max: int = 16, max_lost_frames: int = 150, min_hits: int = 1, iou_threshold: float = 0.1):
    """Build the jitted tracking step for fixed capacities.

    Returns step(state, det_boxes (D,4) xyxy, det_mask (D,)) → (state, out) with
    out = {bbox (N,4), status (N,), confidence (N,), track_num (N,), emit (N,)}.
    """
    F = jnp.asarray(_make_F(), jnp.float32)
    Q = jnp.asarray(_make_Q(), jnp.float32)
    R = jnp.asarray(R_MEAS, jnp.float32)
    P0 = jnp.asarray(_make_P0(), jnp.float32)

    def step(state, det_boxes, det_mask):
        s = dict(state)
        s["frame_count"] = s["frame_count"] + 1

        # ---- step 1: predict all active tracks (batched) -----------------------
        x_pred = s["x"] @ F.T
        P_pred = F @ s["P"] @ F.T + Q
        s["x"] = jnp.where(s["active"][:, None], x_pred, s["x"])
        s["P"] = jnp.where(s["active"][:, None, None], P_pred, s["P"])
        s["age"] = s["age"] + s["active"]
        s["time_since_update"] = s["time_since_update"] + s["active"]
        trk_boxes = _state_to_bbox(s["x"])

        # ---- step 2: greedy IoU association ------------------------------------
        iou = _iou_matrix(det_boxes, trk_boxes)
        iou = jnp.where(det_mask[:, None] & s["active"][None, :], iou, -1.0)

        # greedy argmax picks are inherently sequential, but once the running
        # max drops below the threshold every later round is a no-op — an
        # early-exit while_loop runs matches+1 rounds instead of always d_max
        # (12x faster on sparse scenes; matches are identical except on
        # EXACTLY-equal IoU ties, where argmax takes the first flat index
        # while the object manager's np.argsort(-iou) introsort order on tied
        # keys is unspecified — a measure-zero float coincidence, excluded
        # from the parity contract)
        def assoc_cond(c):
            iou_m, _, i = c
            return (i < d_max) & (jnp.max(iou_m) >= iou_threshold)

        def assoc_body(c):
            iou_m, dm, i = c
            flat = jnp.argmax(iou_m)
            d, t = flat // n_max, flat % n_max
            dm = jnp.where(jnp.arange(d_max) == d, t.astype(jnp.int32), dm)
            # one fused dense mask-out of row d and column t (scatters inside a
            # scanned while_loop cost ~1 us each; a (D, N) where fuses to one op)
            iou_m = jnp.where((jnp.arange(d_max) == d)[:, None] | (jnp.arange(n_max) == t)[None, :], -1.0, iou_m)
            return iou_m, dm, i + 1

        det_match = jnp.full((d_max,), -1, jnp.int32)
        _, det_match, _ = jax.lax.while_loop(assoc_cond, assoc_body, (iou, det_match, jnp.int32(0)))
        # inverse map (per-slot view of det_match): matched slots + which det
        match_m = det_match[None, :] == jnp.arange(n_max)[:, None]  # (N, D); -1 never matches
        trk_matched = match_m.any(1)
        claim = match_m.argmax(1)  # det index claiming each slot (valid where trk_matched)

        # ---- step 3: batched measurement update for matched tracks ---------------
        # gather each matched detection onto its track slot via the inverse map
        z_all = _bbox_to_z(det_boxes)  # (D, 4)
        z_per_trk = jnp.where(trk_matched[:, None], z_all[claim], 0.0)
        # H = [I4 | 0] is a selection matrix → H-products are slices/pads (exact,
        # and ~4 fewer batched matmuls per step than the generic form)
        S = s["P"][:, :4, :4] + R  # (N, 4, 4) == H P Hᵀ + R
        K = s["P"][:, :, :4] @ _inv4(S)  # (N, 8, 4) == P Hᵀ S⁻¹
        y = z_per_trk - s["x"][:, :4]
        x_upd = s["x"] + jnp.einsum("nij,nj->ni", K, y)
        P_upd = s["P"] - K @ s["P"][:, :4, :]  # == (I - K H) P

        s["x"] = jnp.where(trk_matched[:, None], x_upd, s["x"])
        s["P"] = jnp.where(trk_matched[:, None, None], P_upd, s["P"])
        s["hits"] = s["hits"] + trk_matched
        s["hit_streak"] = jnp.where(trk_matched, s["hit_streak"] + 1, s["hit_streak"])
        s["time_since_update"] = jnp.where(trk_matched, 0, s["time_since_update"])
        # velocity history ring write on update — dense masked write (a per-slot
        # column scatter on (N, cap, 2) is slower than one fused where)
        wptr = s["vel_count"] % VEL_HIST
        new_vel = s["x"][:, 4:6]
        ring_mask = (jnp.arange(VEL_HIST)[None, :] == wptr[:, None]) & trk_matched[:, None]  # (N, cap)
        s["vel_hist"] = jnp.where(ring_mask[..., None], new_vel[:, None, :], s["vel_hist"])
        s["vel_count"] = s["vel_count"] + trk_matched
        # recovery: matched tracks leave lost state
        s["is_lost"] = s["is_lost"] & ~trk_matched
        s["lost_frames"] = jnp.where(trk_matched, 0, s["lost_frames"])

        # ---- step 4: unmatched active tracks go/stay lost -------------------------
        unmatched_trk = s["active"] & ~trk_matched
        s["lost_frames"] = jnp.where(unmatched_trk, jnp.where(s["is_lost"], s["lost_frames"] + 1, 1), s["lost_frames"])
        s["is_lost"] = s["is_lost"] | unmatched_trk
        s["hit_streak"] = jnp.where(unmatched_trk, 0, s["hit_streak"])

        # reference quirk (preserved for parity): emitting a track on its FIRST
        # lost frame runs one extra predict() inside get_lost_prediction
        # (enhanced_long_term_predict early-out, ref tracker :216-217) — a side
        # effect in the getter that permanently advances the filter.
        first_lost = s["is_lost"] & (s["lost_frames"] == 1)
        x_extra = s["x"] @ F.T
        P_extra = F @ s["P"] @ F.T + Q
        s["x"] = jnp.where(first_lost[:, None], x_extra, s["x"])
        s["P"] = jnp.where(first_lost[:, None, None], P_extra, s["P"])
        s["age"] = s["age"] + first_lost
        s["time_since_update"] = s["time_since_update"] + first_lost

        # ---- step 5: new tracks for unmatched detections (detection order) ---------
        unmatched_det = det_mask & (det_match < 0)
        free = ~s["active"]
        # slot for the k-th unmatched detection = k-th free slot
        det_rank = jnp.cumsum(unmatched_det) - 1  # rank among unmatched dets
        free_idx = jnp.where(free, jnp.arange(n_max), n_max + 1)
        free_sorted = jnp.sort(free_idx)  # free slots ascending
        slot_of_det = jnp.where(unmatched_det, free_sorted[jnp.clip(det_rank, 0, n_max - 1)], n_max + 1)
        can_place = unmatched_det & (slot_of_det < n_max)

        # vectorized placement via the inverse map: per slot, which detection (if
        # any) claims it — dense wheres instead of 12 scatters (each scatter in a
        # scanned step costs ~1 us of fixed overhead; these fuse to a handful of
        # vector ops). ids follow detection order: next_id + rank-among-placed,
        # matching the reference's creation-order "T%03d" ids (multi_tracker :92-101).
        place_m = (slot_of_det[None, :] == jnp.arange(n_max)[:, None]) & can_place[None, :]  # (N, D)
        placed = place_m.any(1)
        src = place_m.argmax(1)  # claiming det index (valid where placed)
        z_new = _bbox_to_z(det_boxes)  # (D, 4)
        x_new = jnp.concatenate([z_new, jnp.zeros((d_max, 4), jnp.float32)], axis=-1)  # (D, 8)
        place_num = s["next_id"] + jnp.cumsum(can_place) - 1
        s["x"] = jnp.where(placed[:, None], x_new[src], s["x"])
        s["P"] = jnp.where(placed[:, None, None], P0[None], s["P"])
        s["active"] = s["active"] | placed
        s["is_lost"] = s["is_lost"] & ~placed
        s["age"] = jnp.where(placed, 0, s["age"])
        s["hits"] = jnp.where(placed, 1, s["hits"])
        s["hit_streak"] = jnp.where(placed, 1, s["hit_streak"])
        s["time_since_update"] = jnp.where(placed, 0, s["time_since_update"])
        s["lost_frames"] = jnp.where(placed, 0, s["lost_frames"])
        s["track_num"] = jnp.where(placed, place_num[src], s["track_num"])
        s["vel_hist"] = jnp.where(placed[:, None, None], 0.0, s["vel_hist"])
        s["vel_count"] = jnp.where(placed, 0, s["vel_count"])
        s["next_id"] = s["next_id"] + can_place.sum()

        # ---- step 6: prune (should_delete rules, ref tracker :385) ------------------
        tsu = s["time_since_update"]
        dead = (tsu > max_lost_frames)
        dead = dead | ((s["age"] < 5) & (s["hit_streak"] == 0) & (tsu > 15))
        dead = dead | ((s["age"] < 10) & (s["hit_streak"] <= 1) & (tsu > 30))
        dead = dead & s["active"]
        s["active"] = s["active"] & ~dead

        # ---- step 7: emit confirmed tracks --------------------------------------------
        confirmed = s["active"] & (
            (s["hit_streak"] >= min_hits) | (s["frame_count"] <= min_hits) | s["is_lost"]
        )
        is_pred = s["time_since_update"] > 0
        # motion analysis feeds ONLY the long-term extrapolation of tracks lost
        # for >1 frame — on frames with none (the common case) skip the whole
        # ring-buffer reorder + trig pass (outputs are provably unused then)
        # active-gated: pruned slots keep stale is_lost/lost_frames until reuse
        # and would otherwise disarm the skip for the rest of the clip
        need_ma = jnp.any(s["active"] & s["is_lost"] & (s["lost_frames"] > 1))
        conf_m, avg_v = jax.lax.cond(
            need_ma,
            lambda vh, vc: _motion_analysis(vh, vc)[:2],
            lambda vh, vc: (jnp.zeros((n_max,), jnp.float32), jnp.zeros((n_max, 2), jnp.float32)),
            s["vel_hist"],
            s["vel_count"],
        )

        # long-term extrapolation for lost tracks (enhanced_long_term_predict :205)
        fa = s["lost_frames"].astype(jnp.float32)
        high_conf = conf_m > 0.3
        pos_hi = s["x"][:, :2] + avg_v * fa[:, None]
        x_hi = s["x"].at[:, :2].set(pos_hi)
        # low-confidence: F^n·x — positions advance n·v, sizes n·v_size
        x_lo = s["x"].at[:, :4].set(s["x"][:, :4] + s["x"][:, 4:8] * fa[:, None])
        time_decay = jnp.maximum(0.1, 1.0 - fa / max_lost_frames)
        conf_hi = conf_m * time_decay
        conf_lo = jnp.maximum(0.1, 1.0 - fa / (max_lost_frames * 0.5))

        lost_long = s["is_lost"] & (fa > 1)
        x_out = jnp.where((lost_long & high_conf)[:, None], x_hi, jnp.where(lost_long[:, None], x_lo, s["x"]))
        # fa<=1 lost tracks took the extra-predict early-out above → confidence 1.0
        conf_lost = jnp.where(fa > 1, jnp.where(high_conf, conf_hi, conf_lo), 1.0)
        conf_short = jnp.maximum(0.3, 1.0 - tsu.astype(jnp.float32) / 60.0)
        confidence = jnp.where(is_pred, jnp.where(s["is_lost"], conf_lost, conf_short), 1.0)

        out = {
            "bbox": _state_to_bbox(x_out),
            "status": jnp.where(confirmed, jnp.where(is_pred, STATUS_PREDICTED, STATUS_DETECTED), STATUS_NONE),
            "confidence": jnp.where(confirmed, confidence, 0.0),
            "track_num": s["track_num"],
            "emit": confirmed,
            "velocity": s["x"][:, 4:6],
            "time_since_update": tsu,
        }
        return s, out

    return step


class BatchedMultiTargetTracker:
    """Host-friendly wrapper: same update() contract as EnhancedMultiTargetTracker
    but running the fused jitted step; `scan_frames` runs a whole chunk on-device."""

    def __init__(self, max_lost_frames: int = 150, min_hits: int = 1, iou_threshold: float = 0.1, n_max: int = 64, d_max: int = 16):
        self.n_max, self.d_max = n_max, d_max
        self._step = jax.jit(make_step(n_max, d_max, max_lost_frames, min_hits, iou_threshold))
        self.state = init_state(n_max)

    def update(self, detections) -> list[dict]:
        """detections: list of [x1, y1, x2, y2, conf] → list of track-info dicts."""
        D = self.d_max
        boxes = np.zeros((D, 4), np.float32)
        mask = np.zeros((D,), bool)
        for i, det in enumerate(detections[:D]):
            boxes[i] = det[:4]
            mask[i] = True
        self.state, out = self._step(self.state, jnp.asarray(boxes), jnp.asarray(mask))
        out = {k: np.asarray(v) for k, v in out.items()}
        tracks = []
        order = np.argsort(out["track_num"])  # stable id order
        for i in order:
            if not out["emit"][i]:
                continue
            tracks.append(
                {
                    "track_id": f"T{int(out['track_num'][i]):03d}",
                    "bbox": out["bbox"][i],
                    "confidence": float(out["confidence"][i]),
                    "status": "predicted" if out["status"][i] == STATUS_PREDICTED else "detected",
                    "time_since_update": int(out["time_since_update"][i]),
                    "velocity": out["velocity"][i],
                }
            )
        return tracks

    def scan_frames(self, det_boxes_seq, det_mask_seq):
        """Run T frames on-device in one lax.scan: (T, D, 4), (T, D) → stacked outs."""
        step = self._step

        def body(state, inp):
            return step(state, inp[0], inp[1])

        self.state, outs = jax.lax.scan(body, self.state, (jnp.asarray(det_boxes_seq), jnp.asarray(det_mask_seq)), unroll=8)
        return {k: np.asarray(v) for k, v in outs.items()}
