"""DETR-style loss for RT-DETR training.

Re-implements the reference Hungarian matching + DETR loss (ref:
ultralytics/models/utils/ops.py HungarianMatcher:16,
ultralytics/models/utils/loss.py DETRLoss:17, RTDETRDetectionLoss:402,
ultralytics/utils/loss.py FocalLoss:53).

TPU split: bipartite matching is inherently data-dependent (scipy
linear_sum_assignment), so it runs on HOST over detached predictions; the
differentiable loss is a pure jittable function taking the match as fixed-shape
padded index arrays (B, N_gt_max) + validity mask. The trainer runs
  jitted forward (no grad) → host matcher → jitted loss+grad
which keeps every device program static-shape.
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.ops.boxes import bbox_iou


def hungarian_match(pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt, cost_gain=None, alpha=0.25, gamma=2.0):
    """Per-image optimal assignment (host numpy; ref: HungarianMatcher.forward:81).

    Args:
        pred_bboxes: (B, Nq, 4) normalized xywh (detached, host numpy).
        pred_scores: (B, Nq, nc) raw logits.
        gt_bboxes: (B, N, 4) normalized xywh (padded).
        gt_cls: (B, N) int labels.
        mask_gt: (B, N) validity.

    Returns:
        src_idx: (B, N) query index matched to each gt row (0 for padded rows).
        valid: (B, N) float mask of real matches.
    """
    from scipy.optimize import linear_sum_assignment

    pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt = (
        np.asarray(a) for a in (pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt)
    )
    cost_gain = cost_gain or {"class": 2, "bbox": 5, "giou": 2}
    B, Nq, nc = pred_scores.shape
    N = gt_bboxes.shape[1]
    src_idx = np.zeros((B, N), np.int32)
    valid = np.zeros((B, N), np.float32)
    prob = 1.0 / (1.0 + np.exp(-pred_scores))  # focal-style sigmoid scores
    for b in range(B):
        m = mask_gt[b] > 0
        n = int(m.sum())
        if n == 0:
            continue
        gb = gt_bboxes[b][m]
        gc = gt_cls[b][m].astype(np.int64)
        ps = prob[b][:, gc]  # (Nq, n)
        neg = (1 - alpha) * (ps**gamma) * (-np.log(1 - ps + 1e-8))
        pos = alpha * ((1 - ps) ** gamma) * (-np.log(ps + 1e-8))
        cost_class = pos - neg
        cost_bbox = np.abs(pred_bboxes[b][:, None] - gb[None]).sum(-1)
        giou = np.asarray(bbox_iou(pred_bboxes[b][:, None], gb[None], xywh=True, GIoU=True))
        cost = cost_gain["class"] * cost_class + cost_gain["bbox"] * cost_bbox + cost_gain["giou"] * (1.0 - giou)
        cost = np.where(np.isfinite(cost), cost, 0.0)
        qi, gj = linear_sum_assignment(cost)
        rows = np.where(m)[0]
        src_idx[b, rows[gj]] = qi
        valid[b, rows[gj]] = 1.0
    return src_idx, valid


class DETRLoss:
    """Focal class + L1 + GIoU loss over matched query/gt pairs, jittable.

    Matches the reference math (ref: DETRLoss._get_loss:308): targets default to
    `nc` (background), matched queries take the gt class with IoU-weighted...
    actually gt_scores are used only by VFL — with plain FocalLoss (the default,
    use_vfl=False) the target is the one-hot class and the loss normalizes by
    num_gts·nq.
    """

    def __init__(self, nc: int, loss_gain=None, alpha: float = 0.25, gamma: float = 1.5, use_vfl: bool = False):
        self.nc = nc
        self.loss_gain = loss_gain or {"class": 1, "bbox": 5, "giou": 2}
        self.alpha = alpha
        self.gamma = gamma
        self.use_vfl = use_vfl

    def __call__(self, pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt, src_idx, match_valid):
        """One decoder layer's loss.

        Args:
            pred_bboxes: (B, Nq, 4) normalized xywh.
            pred_scores: (B, Nq, nc) logits.
            gt_bboxes/gt_cls/mask_gt: padded gt arrays.
            src_idx: (B, N) matched query index per gt row (host matcher output).
            match_valid: (B, N) 1.0 for real matches.

        Returns:
            dict(loss_class, loss_bbox, loss_giou) — scalars.
        """
        import jax
        import jax.numpy as jnp

        B, Nq, nc = pred_scores.shape
        num_gts = jnp.maximum(match_valid.sum(), 1.0)

        # scatter matched gt classes onto the (B, Nq) target map; background = nc
        one_hot_t = jax.nn.one_hot(gt_cls.astype(jnp.int32), nc)  # (B, N, nc)
        q_onehot = jax.nn.one_hot(src_idx, Nq) * match_valid[..., None]  # (B, N, Nq)
        targets = jnp.einsum("bnq,bnc->bqc", q_onehot, one_hot_t)  # (B, Nq, nc) one-hot or zero

        pb = jnp.take_along_axis(pred_bboxes, src_idx[..., None], axis=1)  # (B, N, 4)
        p = jax.nn.sigmoid(pred_scores)
        if self.use_vfl:
            # Varifocal (ref: utils/loss.py VarifocalLoss:41): target = matched IoU
            iou_m = bbox_iou(jax.lax.stop_gradient(pb), gt_bboxes, xywh=True) * match_valid
            gt_scores = jnp.einsum("bnq,bn->bq", jax.nn.one_hot(src_idx, Nq) * match_valid[..., None], iou_m)
            gt_map = gt_scores[..., None] * targets  # (B, Nq, nc)
            weight = self.alpha * (p**self.gamma) * (1 - targets) + gt_map * targets
            bce = jnp.clip(pred_scores, 0, None) - pred_scores * gt_map + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
            loss_cls = (bce * weight).mean(1).sum() / jnp.maximum(num_gts, 1.0) * Nq
        else:
            # focal loss (TF formulation, ref: utils/loss.py FocalLoss:71)
            bce = jnp.clip(pred_scores, 0, None) - pred_scores * targets + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
            p_t = targets * p + (1 - targets) * (1 - p)
            mod = (1.0 - p_t) ** self.gamma
            alpha_f = targets * self.alpha + (1 - targets) * (1 - self.alpha)
            loss_cls = (bce * mod * alpha_f).mean(1).sum() / jnp.maximum(num_gts, 1.0) * Nq

        # bbox losses over matched pairs (masked sums / num_gts)
        l1 = jnp.abs(pb - gt_bboxes).sum(-1) * match_valid
        loss_bbox = l1.sum() / num_gts
        giou = bbox_iou(pb, gt_bboxes, xywh=True, GIoU=True)
        loss_giou = ((1.0 - giou) * match_valid).sum() / num_gts

        return {
            "loss_class": loss_cls * self.loss_gain["class"],
            "loss_bbox": loss_bbox * self.loss_gain["bbox"],
            "loss_giou": loss_giou * self.loss_gain["giou"],
        }


class RTDETRDetectionLoss:
    """Full RT-DETR training criterion (ref: models/utils/loss.py
    RTDETRDetectionLoss:402 + nn/tasks.py RTDETRDetectionModel.loss:751).

    Stacks the encoder's query-selection outputs as layer 0 ahead of the L
    decoder layers; every layer gets its own Hungarian assignment (the reference
    re-matches per aux layer) and a VFL-class + L1 + GIoU loss. Matching runs
    on host through jax.pure_callback with static (L+1, B, N) outputs, so the
    whole loss still jits.

    Denoising groups: when the batch carries cdn entries (utils/cdn.py
    make_cdn_batch) the decoder outputs arrive with the dn queries prepended;
    they are split off and scored with FIXED positional matching — dn block g
    slot j ↔ gt slot j (ref: models/utils/loss.py get_dn_match_indices:453) —
    no Hungarian needed, so the dn terms stay fully on device.
    """

    def __init__(self, model, hyp=None):
        self.nc = model.nc
        self.layer_loss = DETRLoss(nc=model.nc, use_vfl=True)

    def __call__(self, preds, batch):
        import jax
        import jax.numpy as jnp

        dec_bboxes, dec_scores, enc_bboxes, enc_scores = preds
        dn_b = dn_s = None
        if "dn_cls" in batch:  # dn queries are the prefix of the decoder axis
            D = batch["dn_cls"].shape[1]
            dn_b, dec_bboxes = dec_bboxes[:, :, :D], dec_bboxes[:, :, D:]
            dn_s, dec_scores = dec_scores[:, :, :D], dec_scores[:, :, D:]
        all_b = jnp.concatenate([enc_bboxes[None], dec_bboxes], 0).astype(jnp.float32)  # (L+1, B, Nq, 4)
        all_s = jnp.concatenate([enc_scores[None], dec_scores], 0).astype(jnp.float32)
        L, B, Nq, _ = all_b.shape
        gt_bboxes = batch["bboxes"].astype(jnp.float32)  # (B, N, 4) normalized xywh
        gt_cls = batch["cls"]
        mask_gt = batch["mask_gt"].astype(jnp.float32)
        N = gt_bboxes.shape[1]

        def host_match(pb, ps, gb, gc, m):
            src = np.zeros((L, B, N), np.int32)
            val = np.zeros((L, B, N), np.float32)
            for l in range(L):
                src[l], val[l] = hungarian_match(pb[l], ps[l], gb, gc, m)
            return src, val

        src_idx, valid = jax.pure_callback(
            host_match,
            (
                jax.ShapeDtypeStruct((L, B, N), jnp.int32),
                jax.ShapeDtypeStruct((L, B, N), jnp.float32),
            ),
            jax.lax.stop_gradient(all_b),
            jax.lax.stop_gradient(all_s),
            gt_bboxes,
            gt_cls,
            mask_gt,
        )

        total = 0.0
        main = None
        for l in range(L):
            d = self.layer_loss(all_b[l], all_s[l], gt_bboxes, gt_cls, mask_gt, src_idx[l], valid[l])
            total = total + d["loss_class"] + d["loss_bbox"] + d["loss_giou"]
            if l == L - 1:  # final decoder layer = the reported main loss
                main = d

        if dn_b is not None:
            G = dn_b.shape[2] // (2 * N)
            pos_src = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
            for l in range(dn_b.shape[0]):  # per decoder layer (aux dn losses)
                for g in range(G):
                    pb = jnp.concatenate(
                        [dn_b[l][:, g * N : (g + 1) * N], dn_b[l][:, (G + g) * N : (G + g + 1) * N]], axis=1
                    ).astype(jnp.float32)
                    ps = jnp.concatenate(
                        [dn_s[l][:, g * N : (g + 1) * N], dn_s[l][:, (G + g) * N : (G + g + 1) * N]], axis=1
                    ).astype(jnp.float32)
                    d = self.layer_loss(pb, ps, gt_bboxes, gt_cls, mask_gt, pos_src, mask_gt)
                    total = total + (d["loss_class"] + d["loss_bbox"] + d["loss_giou"]) / G

        comps = jnp.stack([main["loss_giou"], main["loss_class"], main["loss_bbox"]])
        return total, jax.lax.stop_gradient(comps)
