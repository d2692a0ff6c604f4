"""Fixed-shape non-max suppression for TPU.

The reference NMS (ref: ultralytics/utils/nms.py non_max_suppression:13) is
data-dependent: boolean-mask the candidates, then torchvision NMS. XLA needs
static shapes, so the TPU design is:

  1. score-filter → top-K candidate slots (padded, invalid slots score -1)
  2. exact greedy suppression over the K×K IoU matrix (sequential fori_loop,
     identical keep-set to torchvision within fp tolerance)
  3. top-max_det of the kept set → fixed (max_det, 6) output + valid mask

Everything is jittable and vmapped over the batch, so decode+NMS fuses with the
model forward into one XLA program. A numpy twin (`nms_numpy`) is the golden
oracle for tests.
"""

from __future__ import annotations

import os

import numpy as np

MAX_WH = 7680.0  # class-offset magnitude for batched class-aware NMS (same trick as reference)

# Pallas suppression kernel (ops/pallas_nms.py): the whole candidate set stays
# in VMEM for the sequential pass. Profiled on TPU v5e (2026-08-16), keep-set
# timing with real host barriers:
#   B=512 K=256 (bench shape): XLA fori 10.4 ms vs Pallas 23.7 ms
#   B=64  K=1024:              XLA 13.3 ms vs Pallas 37.5 ms
#   B=128 K=1024:              XLA 14.5 ms vs Pallas 69.8 ms
# The XLA loop's direct dynamic row indexing beats the kernel's one-hot matvec
# row extraction (Mosaic TC can't lower dynamic_slice on the sublane axis), so
# the XLA loop stays the default; the kernel remains available via
# YOLO_TPU_PALLAS_NMS=1. Compile time is no longer an issue (~2.5 s).
USE_PALLAS_NMS = os.getenv("YOLO_TPU_PALLAS_NMS", "0") == "1"


def nms_fixed(boxes, scores, iou_threshold: float, max_det: int):
    """Exact greedy NMS over fixed-size inputs.

    Args:
        boxes: (K, 4) xyxy, may include padded entries.
        scores: (K,) scores; padded entries must be < 0.
        iou_threshold: suppression threshold (strict >, matching torchvision).
        max_det: number of output slots.

    Returns:
        keep_idx: (max_det,) indices into the input arrays.
        keep_valid: (max_det,) bool mask of real detections.
    """
    import jax
    import jax.numpy as jnp

    from yolo_tpu.ops.boxes import box_iou

    K = boxes.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (K,), 0)

    # Iterative select-max: only max_det sequential steps (vs K for the
    # classic row sweep) and no K×K IoU matrix — each step computes one
    # (K,) IoU row against the freshly selected box. Identical keep-set to
    # greedy score-order NMS: the argmax over unsuppressed scores IS the
    # next box the classic sweep would keep (no pre-sort needed — argmax
    # over the original order and over a stable descending sort both pick
    # the earliest original index among tied maxima; the sort also blocked
    # TFLite legalization, vhlo.sort_v1 has no TFLite lowering).
    def body(suppressed, _):
        ms = jnp.where(suppressed, -1.0, scores)
        j = jnp.argmax(ms)
        valid = ms[j] > 0
        row = box_iou(boxes[j][None], boxes)[0] > iou_threshold  # includes j itself
        suppressed = suppressed | (row & valid) | (col == j)
        return suppressed, (j, valid)

    _, (keep_idx, keep_valid) = jax.lax.scan(
        body, jnp.zeros((K,), dtype=bool), None, length=max_det
    )
    return keep_idx, keep_valid


def non_max_suppression(
    prediction,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes=None,
    agnostic: bool = False,
    max_det: int = 300,
    nc: int = 0,
    max_nms: int = 1024,
):
    """Fixed-shape NMS over raw decoded predictions (reference layout).

    Args:
        prediction: (B, 4+nc, A) — xywh boxes then per-class scores (decode output,
            same layout as the reference Detect._inference, ref: nn/modules/head.py:152).
        max_nms: candidate slots entering suppression (reference uses 30000 dynamic;
            1024 static covers IR scenes with huge margin).

    Returns:
        dict of fixed-shape arrays:
            boxes (B, max_det, 4) xyxy | scores (B, max_det) | cls (B, max_det)
            valid (B, max_det) bool
    """
    import jax.numpy as jnp

    nc = nc or (prediction.shape[1] - 4)
    n_extra = prediction.shape[1] - 4 - nc  # e.g. mask coefficients (segment)
    boxes_xywh = jnp.swapaxes(prediction[:, :4], 1, 2)  # (B, A, 4)
    cls_scores = jnp.swapaxes(prediction[:, 4 : 4 + nc], 1, 2)
    extra = jnp.swapaxes(prediction[:, 4 + nc :], 1, 2) if n_extra else None
    return non_max_suppression_parts(
        boxes_xywh, cls_scores, conf_thres=conf_thres, iou_thres=iou_thres,
        classes=classes, agnostic=agnostic, max_det=max_det, max_nms=max_nms, extra=extra,
    )


def non_max_suppression_parts(
    boxes_xywh,
    cls_scores,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes=None,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms: int = 1024,
    extra=None,
):
    """Fixed-shape NMS over anchors-major decode parts — the hot-path entry.

    Takes boxes (B, A, 4) xywh + scores (B, A, nc) directly (the layout
    Detect.decode_parts produces and the candidate top-k consumes); the
    reference's (B, 4+nc, A) layout only exists in the `non_max_suppression`
    wrapper. Keeping the fused pipeline on parts avoids a swapaxes→transpose
    round trip through a layout XLA materializes badly (measured 26 ms/512
    chunk on v5e — 2x the cost of the suppression itself).
    """
    import jax
    import jax.numpy as jnp

    from yolo_tpu.ops.boxes import xywh2xyxy

    nc = cls_scores.shape[-1]
    n_extra = 0 if extra is None else extra.shape[-1]
    K = min(max_nms, boxes_xywh.shape[1])

    def single(boxes_xywh, cls_scores, ex):
        if classes is not None:
            allowed = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
            cls_scores = jnp.where(allowed[None, :], cls_scores, 0.0)
        conf = jnp.max(cls_scores, axis=-1)
        cls_id = jnp.argmax(cls_scores, axis=-1)
        conf = jnp.where(conf > conf_thres, conf, -1.0)
        top_conf, top_idx = jax.lax.top_k(conf, K)
        b = xywh2xyxy(boxes_xywh[top_idx])
        c = cls_id[top_idx]
        extra_k = ex[top_idx] if n_extra else jnp.zeros((K, 0), b.dtype)
        offset = jnp.where(agnostic, 0.0, c.astype(b.dtype) * MAX_WH)
        return b, c, top_conf, offset, extra_k

    if extra is None:
        extra = jnp.zeros(boxes_xywh.shape[:2] + (0,), boxes_xywh.dtype)
    b, c, top_conf, offset, extra = jax.vmap(single)(boxes_xywh, cls_scores, extra)
    return _suppress_tail(b, c, top_conf, offset, extra, iou_thres, max_det, n_extra)


def non_max_suppression_logits(
    bins,
    cls_scores,
    anchors,
    strides,
    proj,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes=None,
    agnostic: bool = False,
    max_det: int = 300,
    max_nms: int = 1024,
):
    """Lazy-decode NMS: rank by score FIRST, DFL-decode only the winners.

    Candidate selection uses scores alone, so the per-anchor box decode
    (softmax-projection + anchor arithmetic) is pulled BELOW the top-k: the
    k winning bin rows are gathered and decoded with op-for-op the same math
    as Detect.decode_from_inputs + non_max_suppression_parts — outputs are
    bit-identical, but the all-anchor (B, A, 4, 2) f32 projection and
    (B, A, 4) f32 boxes (~560 MB per 512-chunk at P2 scale) never
    materialize. Inputs come from DetectionModel.predict_logits.

    bins: tuple of per-level (B, A_l, 4*reg_max) raw reg logits (compute
        dtype) — kept per level so each stays a bitcast view of its conv
        output; the winners are gathered per level with offset arithmetic
        (a cross-level concat would materialize ~0.9 GB per 512-chunk).
        A single (B, A, 4*reg_max) array is also accepted.
    cls_scores: (B, A, nc) f32 sigmoid scores
    anchors: (A, 2) grid-cell centers; strides: (A, 1); proj: (reg_max,) f32
    """
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.modules import dfl_project
    from yolo_tpu.ops.anchors import dist2bbox
    from yolo_tpu.ops.boxes import xywh2xyxy

    if not isinstance(bins, (tuple, list)):
        bins = (bins,)
    bins = tuple(bins)
    nc = cls_scores.shape[-1]
    reg_max = proj.shape[0]
    A = sum(b.shape[1] for b in bins)
    K = min(max_nms, A)
    offs = np.cumsum([0] + [b.shape[1] for b in bins[:-1]])
    anchors = jnp.asarray(anchors)
    strides = jnp.asarray(strides)

    def single(bins_f, cls_f):
        cls_f = cls_f.astype(jnp.float32)
        if classes is not None:
            allowed = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
            cls_f = jnp.where(allowed[None, :], cls_f, 0.0)
        conf = jnp.max(cls_f, axis=-1)
        cls_id = jnp.argmax(cls_f, axis=-1)
        conf = jnp.where(conf > conf_thres, conf, -1.0)
        top_conf, top_idx = jax.lax.top_k(conf, K)
        # decode ONLY the k winners — same ops, same dtypes, same order as the
        # all-anchor path (gather commutes with the per-anchor decode);
        # gathers run per level so no concatenated bins buffer ever exists
        bk = jnp.zeros((K, 4 * reg_max), bins_f[0].dtype)
        for lv, bl in enumerate(bins_f):
            li = top_idx - int(offs[lv])
            inb = (li >= 0) & (li < bl.shape[0])
            bk = jnp.where(inb[:, None], bl[jnp.clip(li, 0, bl.shape[0] - 1)], bk)
        dist = dfl_project(bk.reshape(K, 4, reg_max), proj)  # (K, 4) f32
        xywh = dist2bbox(dist, anchors[top_idx], xywh=True, axis=-1) * strides[top_idx]
        b = xywh2xyxy(xywh)
        c = cls_id[top_idx]
        offset = jnp.where(agnostic, 0.0, c.astype(b.dtype) * MAX_WH)
        return b, c, top_conf, offset

    b, c, top_conf, offset = jax.vmap(single)(bins, cls_scores)
    extra = jnp.zeros(b.shape[:2] + (0,), b.dtype)
    return _suppress_tail(b, c, top_conf, offset, extra, iou_thres, max_det, 0)


def non_max_suppression_sparse(
    boxes_xyxy,
    cls_id,
    conf,
    iou_thres: float = 0.45,
    max_det: int = 300,
    agnostic: bool = False,
):
    """Suppression tail over sparse-box-head candidates.

    Takes the (boxes (B, K, 4) f32 xyxy, cls_id (B, K), conf (B, K)) triple
    Detect.sparse_candidates produces — top-k selection, thresholding and box
    decode already happened (sparsely) inside the head, so this is just the
    class-offset + greedy-IoU tail shared with every other NMS entry. Output
    dict matches non_max_suppression_parts exactly (float tolerance); parity
    pinned by tests/test_sparse_head.py."""
    import jax.numpy as jnp

    offset = jnp.where(agnostic, 0.0, cls_id.astype(boxes_xyxy.dtype) * MAX_WH)
    extra = jnp.zeros(boxes_xyxy.shape[:2] + (0,), boxes_xyxy.dtype)
    return _suppress_tail(boxes_xyxy, cls_id, conf, offset, extra, iou_thres, max_det, 0)


def _suppress_tail(b, c, top_conf, offset, extra, iou_thres, max_det, n_extra):
    """Shared IoU-suppression tail over the per-frame top-k candidates."""
    import jax
    import jax.numpy as jnp

    if USE_PALLAS_NMS and jax.default_backend() == "tpu":
        from yolo_tpu.ops.pallas_nms import pallas_nms_keep

        keep_mask = pallas_nms_keep(b + offset[..., None], top_conf, iou_thres)

        def select(bb, cc, ss, ee, keep):
            ranked = jnp.where(keep, ss, -1.0)
            sel = jnp.argsort(-ranked)[:max_det]
            keep_valid = ranked[sel] > 0
            return (
                jnp.where(keep_valid[:, None], bb[sel], 0.0),
                jnp.where(keep_valid, ss[sel], 0.0),
                jnp.where(keep_valid, cc[sel], -1),
                jnp.where(keep_valid[:, None], ee[sel], 0.0),
                keep_valid,
            )

        boxes, scores, cls, extras, valid = jax.vmap(select)(b, c, top_conf, extra, keep_mask)
    else:

        def suppress(bb, cc, ss, ee, off):
            keep_idx, keep_valid = nms_fixed(bb + off[:, None], ss, iou_thres, max_det)
            return (
                jnp.where(keep_valid[:, None], bb[keep_idx], 0.0),
                jnp.where(keep_valid, ss[keep_idx], 0.0),
                jnp.where(keep_valid, cc[keep_idx], -1),
                jnp.where(keep_valid[:, None], ee[keep_idx], 0.0),
                keep_valid,
            )

        boxes, scores, cls, extras, valid = jax.vmap(suppress)(b, c, top_conf, extra, offset)
    out = {"boxes": boxes, "scores": scores, "cls": cls, "valid": valid}
    if n_extra:
        out["extra"] = extras
    return out


def nms_rotated_fixed(rboxes, scores, iou_threshold: float, max_det: int):
    """Rotated NMS over fixed-size inputs via a one-shot probiou matrix.

    Mirrors the reference nms_rotated (ref: utils/nms.py nms_rotated / ops.py):
    sort by score, suppress any box whose probiou with ANY higher-scored box is
    >= threshold (not greedy-sequential — matches the reference exactly and is
    a single batched matmul-ish op on TPU, no loop).
    """
    import jax.numpy as jnp

    from yolo_tpu.ops.boxes import probiou

    K = rboxes.shape[0]
    order = jnp.argsort(-scores)
    b = rboxes[order]
    s = scores[order]
    iou = probiou(b[:, None, :], b[None, :, :])[..., 0]  # (K, K)
    row = jnp.arange(K)
    upper = jnp.where((row[:, None] < row[None, :]), iou, 0.0)  # triu(diagonal=1)
    suppressed = (upper >= iou_threshold).sum(0) > 0
    keep = jnp.logical_not(suppressed) & (s > 0)
    ranked = jnp.where(keep, s, -1.0)
    sel = jnp.argsort(-ranked)[:max_det]
    return order[sel], ranked[sel] > 0


def non_max_suppression_rotated(
    prediction,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes=None,
    agnostic: bool = False,
    max_det: int = 300,
    nc: int = 0,
    max_nms: int = 1024,
):
    """Fixed-shape rotated NMS over decoded OBB predictions.

    Args:
        prediction: (B, 4+nc+1, A) — xywh boxes, class scores, angle(rad) last
            (OBB.decode_with_angle layout; ref head.py OBB:288).

    Returns:
        dict: boxes (B, max_det, 5) xywhr | scores | cls | valid.
    """
    import jax
    import jax.numpy as jnp

    nc = nc or (prediction.shape[1] - 5)

    K = min(max_nms, prediction.shape[2])

    def single(pred):
        boxes_xywh = pred[:4].T  # (A, 4)
        cls_scores = pred[4 : 4 + nc].T  # (A, nc)
        angle = pred[4 + nc :].T  # (A, 1)
        if classes is not None:
            allowed = jnp.zeros((nc,), bool).at[jnp.asarray(classes)].set(True)
            cls_scores = jnp.where(allowed[None, :], cls_scores, 0.0)
        conf = jnp.max(cls_scores, axis=-1)
        cls_id = jnp.argmax(cls_scores, axis=-1)
        conf = jnp.where(conf > conf_thres, conf, -1.0)
        top_conf, top_idx = jax.lax.top_k(conf, K)
        rb = jnp.concatenate([boxes_xywh[top_idx], angle[top_idx]], -1)  # (K, 5)
        c = cls_id[top_idx]
        # class-aware NMS: offset centers per class (reference shifts xy only)
        off = jnp.where(agnostic, 0.0, c.astype(rb.dtype) * MAX_WH)
        return rb, c, top_conf, off

    rb, c, top_conf, off = jax.vmap(single)(prediction)

    def suppress(bb, cc, ss, oo):
        shifted = jnp.concatenate([bb[:, :2] + oo[:, None], bb[:, 2:]], -1)
        keep_idx, keep_valid = nms_rotated_fixed(shifted, ss, iou_thres, max_det)
        return (
            jnp.where(keep_valid[:, None], bb[keep_idx], 0.0),
            jnp.where(keep_valid, ss[keep_idx], 0.0),
            jnp.where(keep_valid, cc[keep_idx], -1),
            keep_valid,
        )

    boxes, scores, cls, valid = jax.vmap(suppress)(rb, c, top_conf, off)
    return {"boxes": boxes, "scores": scores, "cls": cls, "valid": valid}


# Host/golden oracle ------------------------------------------------------------


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy NMS, numpy. Returns kept indices in descending-score order."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter + 1e-7)
        suppressed |= iou > iou_threshold
    return np.asarray(keep, dtype=np.int64)
