"""Contrastive denoising (cdn) groups for RT-DETR training.

Reference counterpart: models/utils/ops.py get_cdn_group:191. The reference
builds variable-length dn queries keyed on the batch's max gt count; the
TPU-native version keys on the dataset's FIXED padded gt capacity N (the
collate already pads to it), so every step has the same static dn layout:

    queries = [pos g0 | pos g1 | … | pos g_{G-1} | neg g0 | … | neg g_{G-1}]
    (each block N slots; slot j of a block ↔ gt slot j; padded gt slots carry
    zero embeddings and zero bbox logits, exactly like the reference's
    unscattered padding positions)

Noise is generated on HOST per batch (numpy — augmentation-style randomness
stays off-device, SURVEY §7) and enters the jitted step as plain batch arrays
(dn_cls indices, dn_bbox logits, dn_valid); the class-embedding lookup happens
IN-graph so gradients reach denoising_class_embed.
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.ops.boxes import xywh2xyxy as _xywh2xyxy, xyxy2xywh as _xyxy2xywh


def cdn_attn_mask(num_group: int, n: int, num_queries: int) -> np.ndarray:
    """Static (tgt, tgt) bool mask, True = blocked — verbatim reference
    semantics (ops.py :295-307): match queries cannot see dn queries, dn
    groups cannot see each other.

    Parity note: the reference's mask blocks are CONSECUTIVE COPY PAIRS
    (rows [2n·i, 2n·(i+1))), while its query layout places all G positive
    copies first and all G negative copies second — so for G>1 its "groups"
    pair two positive copies together rather than each positive with its
    negative (upstream quirk). We reproduce it bit-exactly
    (tests/test_rtdetr_train.py::test_cdn_attn_mask_exact_parity) rather than
    "fix" it, since training parity is the contract."""
    num_dn = 2 * num_group * n
    tgt = num_dn + num_queries
    m = np.zeros((tgt, tgt), bool)
    m[num_dn:, :num_dn] = True
    mn = n  # the reference's max_nums == our padded capacity
    for i in range(num_group):
        rows = slice(mn * 2 * i, mn * 2 * (i + 1))
        if i == 0:
            m[rows, mn * 2 * (i + 1) : num_dn] = True
        if i == num_group - 1:
            m[rows, : mn * i * 2] = True
        else:
            m[rows, mn * 2 * (i + 1) : num_dn] = True
            m[rows, : mn * 2 * i] = True
    return m


def make_cdn_batch(batch: dict, num_classes: int, num_dn: int = 100,
                   cls_noise_ratio: float = 0.5, box_noise_scale: float = 1.0,
                   rng: np.random.Generator | None = None) -> dict:
    """Host-side dn query construction (ref get_cdn_group noise math).

    batch: {'cls' (B, N), 'bboxes' (B, N, 4) normalized xywh, 'mask_gt' (B, N)}.
    Returns extra batch entries:
      dn_cls   (B, 2G·N) int32 — noisy class indices (embed looked up in-graph)
      dn_bbox  (B, 2G·N, 4) f32 — noised boxes in logit space (0 for padding)
      dn_valid (B, 2G·N) f32 — 1 where a real gt backs the slot
    and 'dn_num_group' in the dict for the loss/attn-mask consumers.
    """
    rng = rng or np.random.default_rng()
    cls = np.asarray(batch["cls"])
    boxes = np.asarray(batch["bboxes"], np.float32)
    valid = np.asarray(batch["mask_gt"], np.float32)
    B, N = cls.shape
    G = max(num_dn // N, 1)

    dn_cls = np.tile(cls.astype(np.int64), (1, 2 * G))  # (B, 2G·N)
    dn_box = np.tile(boxes, (1, 2 * G, 1))
    dn_valid = np.tile(valid, (1, 2 * G))

    if cls_noise_ratio > 0:
        flip = (rng.random(dn_cls.shape) < cls_noise_ratio * 0.5) & (dn_valid > 0)
        dn_cls = np.where(flip, rng.integers(0, num_classes, dn_cls.shape), dn_cls)

    if box_noise_scale > 0:
        known = _xywh2xyxy(dn_box)
        diff = np.tile(dn_box[..., 2:] * 0.5, (1, 1, 2)) * box_noise_scale
        sign = rng.integers(0, 2, dn_box.shape) * 2.0 - 1.0
        part = rng.random(dn_box.shape)
        part[:, G * N :] += 1.0  # second half = negative samples, pushed outside
        known = np.clip(known + sign * part * diff, 0.0, 1.0)
        dn_box = _xyxy2xywh(known)
        p = np.clip(dn_box, 1e-6, 1 - 1e-6)
        dn_box = np.log(p / (1 - p))  # inverse sigmoid (torch.logit eps=1e-6)

    dn_box = dn_box * dn_valid[..., None]  # padding slots stay at logit 0
    return {
        "dn_cls": dn_cls.astype(np.int32),
        "dn_bbox": dn_box.astype(np.float32),
        "dn_valid": dn_valid.astype(np.float32),
        "dn_num_group": G,
    }
