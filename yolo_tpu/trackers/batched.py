"""Batched fixed-capacity ByteTrack — the TPU device twin of BYTETracker.

Same semantics as the object-per-track manager (yolo_tpu.trackers.byte_tracker,
ref: trackers/byte_tracker.py BYTETracker.update:301 two-stage association +
utils/kalman_filter.py KalmanFilterXYAH) re-designed for XLA, the same way the
fork's Kalman stack got kalman/batched.py:

  - Track state is a pytree of (N_max, …) slot arrays, not Python objects.
  - The XYAH Kalman predict/update run as batched matmuls over all slots; the
    h-scaled noise (std_pos 1/20, std_vel 1/160 of height) builds per-slot
    diagonal covariances exactly like the reference's per-track path.
  - All three association stages (high-conf ↔ tracked+lost, low-conf rescue,
    unconfirmed second chance) are masked-argmin loops over a fixed (N, D)
    cost matrix. The object implementation solves each stage optimally
    (scipy/lapjv); the greedy loop picks globally-lowest cost first, which
    matches the optimal solution except when two tracks conflict over
    overlapping detections AND swapping lowers total cost — rare in practice
    and excluded from the parity contract (tests/test_trackers.py asserts
    frame-exact equality on multi-target scenes where no such conflict
    arises). Axis-aligned boxes only (the OBB path stays on the host manager).
  - The whole step is one jitted (state, dets) → (state, out) function,
    `lax.scan`-able over frames so a video chunk of MOT runs on-device with no
    per-frame host sync — this is what makes multi-stream `model.track`
    throughput comparable to the fused Kalman pipeline (see bench_track in
    bench.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.kalman.batched import _inv4
from yolo_tpu.utils import LOGGER

BIG = 1e9


def init_state(n_max: int = 128):
    return {
        "mean": jnp.zeros((n_max, 8), jnp.float32),
        "cov": jnp.zeros((n_max, 8, 8), jnp.float32),
        "state": jnp.zeros((n_max,), jnp.int32),  # 0 free, 1 tracked, 2 lost
        "is_activated": jnp.zeros((n_max,), bool),
        "track_id": jnp.zeros((n_max,), jnp.int32),
        "score": jnp.zeros((n_max,), jnp.float32),
        "cls": jnp.zeros((n_max,), jnp.float32),
        "det_idx": jnp.full((n_max,), -1, jnp.int32),
        "tracklet_len": jnp.zeros((n_max,), jnp.int32),
        "last_frame": jnp.zeros((n_max,), jnp.int32),
        "start_frame": jnp.zeros((n_max,), jnp.int32),
        "next_id": jnp.ones((), jnp.int32),
        "frame": jnp.zeros((), jnp.int32),
    }


def _xywh_to_xyah(xywh):
    return jnp.stack([xywh[..., 0], xywh[..., 1], xywh[..., 2] / jnp.maximum(xywh[..., 3], 1e-6), xywh[..., 3]], -1)


def _mean_to_xyxy(mean):
    w = mean[..., 2] * mean[..., 3]
    h = mean[..., 3]
    return jnp.stack([mean[..., 0] - w / 2, mean[..., 1] - h / 2, mean[..., 0] + w / 2, mean[..., 1] + h / 2], -1)


def _iou(a, b):
    """(R, 4) xyxy vs (C, 4) xyxy → (R, C)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    ab = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    union = aa[:, None] + ab[None, :] - inter + 1e-7
    return inter / union


def _greedy_assign(cost, thresh, max_matches):
    """Masked greedy min-cost assignment: repeatedly take the globally lowest
    cost <= thresh, strike its row+col. Returns col_match (C,) i32 — the row
    matched to each column, -1 when unmatched. Invalid pairs must carry BIG."""
    R, C = cost.shape

    def cond(c):
        m, _, i = c
        return (i < max_matches) & (jnp.min(m) <= thresh)

    def body(c):
        m, cm, i = c
        flat = jnp.argmin(m)
        r, col = flat // C, flat % C
        cm = jnp.where(jnp.arange(C) == col, r.astype(jnp.int32), cm)
        m = jnp.where((jnp.arange(R) == r)[:, None] | (jnp.arange(C) == col)[None, :], BIG, m)
        return m, cm, i + 1

    col_match = jnp.full((C,), -1, jnp.int32)
    _, col_match, _ = jax.lax.while_loop(cond, body, (cost, col_match, jnp.int32(0)))
    return col_match


# XYAH Kalman constants (ref kalman_filter.py:7-35)
_WP, _WV = 1.0 / 20, 1.0 / 160
_F = np.eye(8, dtype=np.float32)
for _i in range(4):
    _F[_i, 4 + _i] = 1.0
_F = jnp.asarray(_F)


def _motion_cov(mean):
    """(N, 8, 8) diag Q from per-slot height (ref multi_predict)."""
    h = mean[:, 3]
    std = jnp.stack(
        [_WP * h, _WP * h, jnp.full_like(h, 1e-2), _WP * h,
         _WV * h, _WV * h, jnp.full_like(h, 1e-5), _WV * h], -1,
    )
    return jax.vmap(jnp.diag)(std**2)


def _innovation_cov(mean):
    """(N, 4, 4) diag R from post-predict height (ref project)."""
    h = mean[:, 3]
    std = jnp.stack([_WP * h, _WP * h, jnp.full_like(h, 1e-1), _WP * h], -1)
    return jax.vmap(jnp.diag)(std**2)


def _init_cov(meas):
    """(D, 8, 8) initiate covariance from measurements (ref initiate)."""
    h = meas[:, 3]
    std = jnp.stack(
        [2 * _WP * h, 2 * _WP * h, jnp.full_like(h, 1e-2), 2 * _WP * h,
         10 * _WV * h, 10 * _WV * h, jnp.full_like(h, 1e-5), 10 * _WV * h], -1,
    )
    return jax.vmap(jnp.diag)(std**2)


def make_byte_step(
    n_max: int = 128,
    d_max: int = 32,
    track_high_thresh: float = 0.25,
    track_low_thresh: float = 0.1,
    new_track_thresh: float = 0.25,
    match_thresh: float = 0.8,
    fuse_score: bool = True,
    max_time_lost: int = 30,
):
    """Build the jitted ByteTrack step for fixed capacities.

    step(state, xywh (D,4), scores (D,), cls (D,), mask (D,)) → (state, out)
    with out = {xyxy (N,4), track_id, score, cls, det_idx, emit} per slot.
    """

    def _kf_update(s, matched, z):
        """Batched XYAH measurement update on `matched` slots; z (N, 4) xyah."""
        S = s["cov"][:, :4, :4] + _innovation_cov(s["mean"])
        Sinv = _inv4(S)
        K = s["cov"][:, :, :4] @ Sinv  # (N, 8, 4)
        y = z - s["mean"][:, :4]
        mean_u = s["mean"] + jnp.einsum("nij,nj->ni", K, y)
        cov_u = s["cov"] - K @ S @ jnp.swapaxes(K, 1, 2)
        s["mean"] = jnp.where(matched[:, None], mean_u, s["mean"])
        s["cov"] = jnp.where(matched[:, None, None], cov_u, s["cov"])
        return s

    def _apply_match(s, col_match, det_xyah, det_scores, det_cls, det_gidx, stage_cols):
        """Commit one stage's matches: KF update + lifecycle refresh.

        col_match (D,): slot index per det column (-1 unmatched); stage_cols
        (D,) marks the columns that belonged to this stage."""
        live = stage_cols & (col_match >= 0)
        slot_m = (col_match[None, :] == jnp.arange(n_max)[:, None]) & live[None, :]  # (N, D)
        matched = slot_m.any(1)
        src = slot_m.argmax(1)
        z = jnp.where(matched[:, None], det_xyah[src], 0.0)
        s = _kf_update(s, matched, z)
        was_lost = s["state"] == 2
        # update(): tracklet_len += 1; re_activate(): tracklet_len = 0
        s["tracklet_len"] = jnp.where(matched, jnp.where(was_lost, 0, s["tracklet_len"] + 1), s["tracklet_len"])
        s["state"] = jnp.where(matched, 1, s["state"])
        s["is_activated"] = s["is_activated"] | matched
        s["score"] = jnp.where(matched, det_scores[src], s["score"])
        s["cls"] = jnp.where(matched, det_cls[src], s["cls"])
        s["det_idx"] = jnp.where(matched, det_gidx[src], s["det_idx"])
        s["last_frame"] = jnp.where(matched, s["frame"], s["last_frame"])
        return s, matched

    def step(state, xywh, scores, cls, mask):
        s = dict(state)
        s["frame"] = s["frame"] + 1

        high = mask & (scores >= track_high_thresh)
        second = mask & (scores > track_low_thresh) & ~high

        pool = (s["state"] == 1) & s["is_activated"] | (s["state"] == 2)
        unconf = (s["state"] == 1) & ~s["is_activated"]

        # multi_predict over the pool (ref STrack.multi_predict: vh zeroed for
        # non-Tracked states before the motion step)
        mean_in = s["mean"].at[:, 7].set(jnp.where(s["state"] == 2, 0.0, s["mean"][:, 7]))
        mean_p = mean_in @ _F.T
        cov_p = _F @ s["cov"] @ _F.T + _motion_cov(mean_in)
        s["mean"] = jnp.where(pool[:, None], mean_p, s["mean"])
        s["cov"] = jnp.where(pool[:, None, None], cov_p, s["cov"])

        det_xyah = _xywh_to_xyah(xywh)
        det_xyxy = jnp.stack(
            [xywh[:, 0] - xywh[:, 2] / 2, xywh[:, 1] - xywh[:, 3] / 2,
             xywh[:, 0] + xywh[:, 2] / 2, xywh[:, 1] + xywh[:, 3] / 2], -1,
        )
        det_gidx = jnp.arange(d_max, dtype=jnp.int32)
        trk_xyxy = _mean_to_xyxy(s["mean"])

        iou = _iou(trk_xyxy, det_xyxy)  # (N, D)

        # ---- stage 1: high dets vs tracked(activated)+lost --------------------
        sim1 = iou * scores[None, :] if fuse_score else iou  # fuse_score (ref matching.py:134)
        cost1 = jnp.where(pool[:, None] & high[None, :], 1.0 - sim1, BIG)
        cm1 = _greedy_assign(cost1, match_thresh, d_max)
        s, _ = _apply_match(s, cm1, det_xyah, scores, cls, det_gidx, high)
        slot_matched1 = jnp.isin(jnp.arange(n_max), jnp.where(cm1 >= 0, cm1, n_max + 1))

        # ---- stage 2: low dets rescue leftover TRACKED pool tracks ------------
        r_tracked = pool & (s["state"] == 1) & ~slot_matched1
        # NB stage-1 _apply_match already flipped matched lost slots to state 1,
        # so exclude them via slot_matched1, not the state field alone.
        cost2 = jnp.where(r_tracked[:, None] & second[None, :], 1.0 - iou, BIG)
        cm2 = _greedy_assign(cost2, 0.5, d_max)
        s, _ = _apply_match(s, cm2, det_xyah, scores, cls, det_gidx, second)
        slot_matched2 = jnp.isin(jnp.arange(n_max), jnp.where(cm2 >= 0, cm2, n_max + 1))
        # leftover tracked tracks go lost (mark_lost)
        to_lost = r_tracked & ~slot_matched2
        s["state"] = jnp.where(to_lost, 2, s["state"])

        # ---- stage 3: unconfirmed tracks vs remaining high dets ----------------
        det_unmatched1 = high & (cm1 < 0)
        sim3 = iou * scores[None, :] if fuse_score else iou
        cost3 = jnp.where(unconf[:, None] & det_unmatched1[None, :], 1.0 - sim3, BIG)
        cm3 = _greedy_assign(cost3, 0.7, d_max)
        s, _ = _apply_match(s, cm3, det_xyah, scores, cls, det_gidx, det_unmatched1)
        slot_matched3 = jnp.isin(jnp.arange(n_max), jnp.where(cm3 >= 0, cm3, n_max + 1))
        # unmatched unconfirmed → removed (slot freed)
        s["state"] = jnp.where(unconf & ~slot_matched3, 0, s["state"])

        # ---- new tracks from the remaining high dets ---------------------------
        new_det = det_unmatched1 & (cm3 < 0) & (scores >= new_track_thresh)
        free = s["state"] == 0
        det_rank = jnp.cumsum(new_det) - 1
        free_sorted = jnp.sort(jnp.where(free, jnp.arange(n_max), n_max + 1))
        slot_of_det = jnp.where(new_det, free_sorted[jnp.clip(det_rank, 0, n_max - 1)], n_max + 1)
        can_place = new_det & (slot_of_det < n_max)
        place_m = (slot_of_det[None, :] == jnp.arange(n_max)[:, None]) & can_place[None, :]
        placed = place_m.any(1)
        src = place_m.argmax(1)
        mean_new = jnp.concatenate([det_xyah, jnp.zeros((d_max, 4), jnp.float32)], -1)
        ids_new = s["next_id"] + jnp.cumsum(can_place) - 1
        cov_new = _init_cov(det_xyah)
        s["mean"] = jnp.where(placed[:, None], mean_new[src], s["mean"])
        s["cov"] = jnp.where(placed[:, None, None], cov_new[src], s["cov"])
        s["state"] = jnp.where(placed, 1, s["state"])
        s["is_activated"] = jnp.where(placed, s["frame"] == 1, s["is_activated"])
        s["track_id"] = jnp.where(placed, ids_new[src], s["track_id"])
        s["score"] = jnp.where(placed, scores[src], s["score"])
        s["cls"] = jnp.where(placed, cls[src], s["cls"])
        s["det_idx"] = jnp.where(placed, det_gidx[src], s["det_idx"])
        s["tracklet_len"] = jnp.where(placed, 0, s["tracklet_len"])
        s["last_frame"] = jnp.where(placed, s["frame"], s["last_frame"])
        s["start_frame"] = jnp.where(placed, s["frame"], s["start_frame"])
        s["next_id"] = s["next_id"] + can_place.sum()

        # ---- expire stale lost tracks ------------------------------------------
        expired = (s["state"] == 2) & (s["frame"] - s["last_frame"] > max_time_lost)
        s["state"] = jnp.where(expired, 0, s["state"])

        # ---- remove_duplicate_stracks(tracked, lost) (ref :347) ----------------
        tr = s["state"] == 1
        lo = s["state"] == 2
        boxes_now = _mean_to_xyxy(s["mean"])
        dup_iou = _iou(boxes_now, boxes_now)
        pair = (dup_iou > 0.85) & tr[:, None] & lo[None, :]
        life = s["last_frame"] - s["start_frame"]
        drop_tracked = (pair & (life[:, None] <= life[None, :])).any(1)
        drop_lost = (pair & (life[:, None] > life[None, :])).any(0)
        s["state"] = jnp.where(drop_tracked | drop_lost, 0, s["state"])

        emit = (s["state"] == 1) & s["is_activated"]
        out = {
            "xyxy": _mean_to_xyxy(s["mean"]),
            "track_id": s["track_id"],
            "score": s["score"],
            "cls": s["cls"],
            "det_idx": s["det_idx"],
            "emit": emit,
        }
        return s, out

    return step


class BatchedBYTETracker:
    """Host-friendly wrapper: same update() contract as BYTETracker (rows of
    [x1, y1, x2, y2, id, score, cls, det_idx]) but running the jitted slot-table
    step; `scan_frames` runs a whole detection chunk on-device in one lax.scan."""

    def __init__(self, args=None, frame_rate: int = 30, n_max: int = 128, d_max: int = 32):
        class _A:
            track_high_thresh = 0.25
            track_low_thresh = 0.1
            new_track_thresh = 0.25
            track_buffer = 30
            match_thresh = 0.8
            fuse_score = True

        args = args or _A()
        self.n_max, self.d_max = n_max, d_max
        self._step = jax.jit(
            make_byte_step(
                n_max, d_max,
                track_high_thresh=float(args.track_high_thresh),
                track_low_thresh=float(args.track_low_thresh),
                new_track_thresh=float(args.new_track_thresh),
                match_thresh=float(args.match_thresh),
                fuse_score=bool(args.fuse_score),
                max_time_lost=int(frame_rate / 30.0 * args.track_buffer),
            )
        )
        self.state = init_state(n_max)

    def _pack(self, boxes_xywh, scores, cls):
        D = self.d_max
        n = min(len(scores), D)
        if len(scores) > D and not getattr(self, "_warned_dmax", False):
            self._warned_dmax = True
            LOGGER.warning(
                f"BatchedBYTETracker: frame has {len(scores)} detections but d_max={D}; "
                f"extra detections are dropped. Construct with a larger d_max (or set "
                f"YOLO_TPU_DEVICE_TRACKER_DMAX) to track crowded scenes."
            )
        xywh = np.zeros((D, 4), np.float32)
        sc = np.zeros((D,), np.float32)
        cl = np.zeros((D,), np.float32)
        mask = np.zeros((D,), bool)
        if n:
            xywh[:n] = np.asarray(boxes_xywh, np.float32).reshape(len(scores), -1)[:n, :4]
            sc[:n] = np.asarray(scores, np.float32)[:n]
            cl[:n] = np.asarray(cls, np.float32)[:n]
            mask[:n] = True
        return xywh, sc, cl, mask

    def update(self, boxes_xywh, scores, cls, img=None, feats=None) -> np.ndarray:
        xywh, sc, cl, mask = self._pack(boxes_xywh, scores, cls)
        self.state, out = self._step(self.state, jnp.asarray(xywh), jnp.asarray(sc), jnp.asarray(cl), jnp.asarray(mask))
        out = {k: np.asarray(v) for k, v in out.items()}
        keep = np.flatnonzero(out["emit"])
        keep = keep[np.argsort(out["track_id"][keep])]
        if not len(keep):
            return np.zeros((0, 8), np.float32)
        return np.stack(
            [np.concatenate([out["xyxy"][i], [out["track_id"][i], out["score"][i], out["cls"][i], out["det_idx"][i]]])
             for i in keep]
        ).astype(np.float32)

    def scan_frames(self, xywh_seq, scores_seq, cls_seq, mask_seq, unroll: int = 8):
        """Run T frames on-device in one lax.scan:
        (T, D, 4), (T, D), (T, D), (T, D) → stacked per-slot outs."""
        step = self._step

        def body(state, inp):
            return step(state, *inp)

        self.state, outs = jax.lax.scan(
            body, self.state,
            (jnp.asarray(xywh_seq), jnp.asarray(scores_seq), jnp.asarray(cls_seq), jnp.asarray(mask_seq)),
            unroll=unroll,
        )
        return {k: np.asarray(v) for k, v in outs.items()}

    def reset(self):
        self.state = init_state(self.n_max)
