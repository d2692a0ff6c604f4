"""YOLOv8 detection loss in JAX (BCE cls + CIoU box + DFL).

Semantics mirror the reference (ref: ultralytics/utils/loss.py v8DetectionLoss:196,
BboxLoss:110, DFLoss:89): TAL assignment (topk=10, α=0.5, β=6), target-score-sum
normalization, per-hyp gains, ×batch_size. Targets arrive pre-padded to a static
(B, max_boxes) — the data pipeline's collate pads — so the loss jits cleanly.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from yolo_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from yolo_tpu.ops.boxes import bbox_iou, xywh2xyxy
from yolo_tpu.utils.tal import TaskAlignedAssigner


def _df_loss(pred_dist, target):
    """Distribution focal loss: CE against the two integer bins bracketing target.

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous distances.
    Returns (...,) mean over the 4 sides.
    """
    reg_max = pred_dist.shape[-1]
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = target.astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # gather-free bin selection: take_along_axis on the last (lane) axis lowers
    # to per-element gathers on TPU and dominated the whole train step (~60 ms
    # at B16×A27k); an interpolation-weight vector over the reg_max bins fuses
    # into one compare/multiply/reduce pass instead (~50x faster, same math)
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    w = wl[..., None] * (bins == tl[..., None]) + wr[..., None] * (bins == jnp.clip(tr, 0, reg_max - 1)[..., None])
    return -(logp * w).sum(-1).mean(axis=-1)


class v8DetectionLoss:
    """Detection criterion over raw per-level head outputs (NHWC)."""

    def __init__(self, model, hyp, tal_topk: int = 10):
        self.nc = model.nc
        self.reg_max = model.head.reg_max
        self.no = self.nc + self.reg_max * 4
        self.stride = model.stride
        self.hyp = hyp  # namespace with box/cls/dfl gains
        self.assigner = TaskAlignedAssigner(topk=tal_topk, num_classes=self.nc, alpha=0.5, beta=6.0)
        self.proj = jnp.arange(self.reg_max, dtype=jnp.float32)
        # fg compaction (mathematically exact: identical terms, different
        # summation order — matches the all-anchor formula to float tolerance):
        # TAL assigns at most topk anchors per GT, so the CIoU+DFL terms only
        # ever see <= topk*max_boxes foreground anchors. Gathering that
        # static-size subset replaces all-anchor (B, A, 4, reg_max)
        # log_softmax/CIoU work (A~27k at P2 scales) with (B, topk*N) work, and
        # lets the all-anchor decode feed TAL under stop_gradient only (no
        # backward residuals). Kill switch for A/B: YOLO_TPU_LOSS_COMPACT=0 —
        # NOTE the flag is latched HERE, at construction: set it before the
        # trainer/loss object is built (a jitted step caches the traced branch
        # anyway, so a post-construction change could never take effect).
        self.compact = os.getenv("YOLO_TPU_LOSS_COMPACT", "1") != "0"

    def _fg_slots(self, fg_mask, weight, max_slots):
        """Static fg slot table: indices of all foreground anchors (padded with
        arbitrary background anchors whose weight is zeroed via s_fg)."""
        _, slot_idx = jax.lax.top_k(jnp.where(fg_mask, weight, -1.0), max_slots)  # (B, M)
        s_fg = jnp.take_along_axis(fg_mask.astype(weight.dtype), slot_idx, axis=1)
        s_w = jnp.take_along_axis(weight, slot_idx, axis=1) * s_fg
        return slot_idx, s_fg, s_w

    @staticmethod
    def _gather(x, slot_idx):
        """Gather (B, A, ...) → (B, M, ...) along the anchor axis."""
        idx = slot_idx.reshape(slot_idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, idx, axis=1)

    def _gather_levels(self, levels, slot_idx):
        """Gather global-anchor slots from PER-LEVEL tensors without ever
        concatenating them: for each level, gather the (clipped) local index
        and mask out slots belonging to other levels, then sum. levels:
        list of (B, A_l, C); slot_idx: (B, M) global anchor ids. → (B, M, C).

        This is the memory-eater fix from the r4 train roofline: a
        grad-carrying concat of the per-level head outputs materialized a
        (B, A, no) copy (batch-minor layout → 8x lane padding at b16, 377.5 MB
        physical) plus its backward cotangent; gathering per level touches
        only (B, M, C) slots (M = topk*max_boxes ~ 160)."""
        out = None
        off = 0
        for lv in levels:
            a_l = lv.shape[1]
            local = slot_idx - off
            inb = (local >= 0) & (local < a_l)
            g = jnp.take_along_axis(lv, jnp.clip(local, 0, a_l - 1)[..., None], axis=1)
            g = jnp.where(inb[..., None], g, jnp.zeros((), g.dtype))
            out = g if out is None else out + g
            off += a_l
        return out

    def _slot_terms(self, s_distri, slot_idx, anchor_points, stride_tensor, target_bboxes, s_w, target_scores_sum):
        """CIoU + DFL on an already-gathered (B, M, 4, reg_max) slot table.

        Returns (s_anchor, s_stride, s_tb, loss_iou, loss_dfl)."""
        s_anchor = anchor_points[slot_idx]  # (B, M, 2)
        s_stride = stride_tensor[slot_idx]  # (B, M, 1)
        s_tb = self._gather(target_bboxes, slot_idx) / s_stride
        s_dist = (jax.nn.softmax(s_distri, axis=-1) * self.proj).sum(-1)  # grad-carrying decode, fg only
        s_pred = dist2bbox(s_dist, s_anchor, xywh=False, axis=-1)
        iou = bbox_iou(s_pred, s_tb, xywh=False, CIoU=True)
        loss_iou = ((1.0 - iou) * s_w).sum() / target_scores_sum
        dfl = _df_loss(s_distri, bbox2dist(s_anchor, s_tb, self.reg_max - 1))  # (B, M)
        loss_dfl = (dfl * s_w).sum() / target_scores_sum
        return s_anchor, s_stride, s_tb, loss_iou, loss_dfl

    def _compact_box_terms(self, pred_distri, anchor_points, stride_tensor, target_bboxes, slot_idx, s_w, target_scores_sum):
        """Shared fg-slot box terms for the axis-aligned tasks (detect/pose/seg):
        gather distri/anchors/targets onto the static slot table, decode, and
        compute the CIoU + DFL losses. OBB's probiou/rbox variant stays in
        v8OBBLoss (different decode and IoU).

        Returns (s_anchor, s_stride, s_tb, loss_iou, loss_dfl)."""
        b = pred_distri.shape[0]
        M = slot_idx.shape[1]
        s_distri = self._gather(pred_distri, slot_idx).reshape(b, M, 4, self.reg_max)
        return self._slot_terms(s_distri, slot_idx, anchor_points, stride_tensor, target_bboxes, s_w, target_scores_sum)

    def __call__(self, feats, batch):
        """Compute (total_loss, detached (box, cls, dfl) components).

        Args:
            feats: list of per-level (B, H, W, no) raw head outputs.
            batch: dict with 'cls' (B, N), 'bboxes' (B, N, 4) normalized xywh,
                   'mask_gt' (B, N) validity.
        """
        B = feats[0].shape[0]
        # per-level views of the head outputs — pure bitcasts, no copy. The
        # compact path below NEVER concatenates these with gradients attached:
        # the r4 train roofline showed the (B, A, no) concat as the top HBM
        # buffer twice (batch-minor layout lane-pads B=16 to 128, 8x — 377.5 MB
        # each for value + backward cotangent). All-anchor consumers are built
        # per level instead (BCE) or under stop_gradient on SMALL tensors only
        # (the (B, A, 4)/(B, A, nc) TAL inputs).
        levels = [f.reshape(B, -1, self.no) for f in feats]

        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.stride, 0.5)
        anchor_points = jnp.asarray(anchor_points)
        stride_tensor = jnp.asarray(stride_tensor)
        imgsz = jnp.array([feat_shapes[0][0] * self.stride[0], feat_shapes[0][1] * self.stride[0]], jnp.float32)

        # targets: normalized xywh → pixel xyxy
        gt_labels = batch["cls"][..., None].astype(jnp.int32)  # (B, N, 1)
        scale = jnp.array([imgsz[1], imgsz[0], imgsz[1], imgsz[0]], jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"] * scale)  # (B, N, 4)
        mask_gt = (batch["mask_gt"][..., None] if "mask_gt" in batch else (jnp.sum(gt_bboxes, 2, keepdims=True) > 0)).astype(
            jnp.float32
        )
        gt_bboxes = gt_bboxes * mask_gt

        # decode pred boxes (grid units)
        b = B
        a = sum(lv.shape[1] for lv in levels)
        r4 = self.reg_max * 4
        M = self.assigner.topk * gt_labels.shape[1]  # exact fg upper bound
        compact = self.compact and M < a
        if compact:
            # TAL consumes the decode of EVERY anchor, but only as a
            # stop-gradient input — build it PER LEVEL so the only all-anchor
            # tensors that ever exist are the small concats (B, A, 4) f32 dist
            # and (B, A, nc) f32 sigmoid scores; the (B, A, 4, reg_max) softmax
            # stays a fused per-level elementwise pass with no residuals.
            dist = jnp.concatenate(
                [
                    (
                        jax.nn.softmax(
                            jax.lax.stop_gradient(lv[..., :r4]).astype(jnp.float32).reshape(b, -1, 4, self.reg_max),
                            axis=-1,
                        )
                        * self.proj
                    ).sum(-1)
                    for lv in levels
                ],
                axis=1,
            )  # (B, A, 4)
            scores_sg = jnp.concatenate(
                [jax.nn.sigmoid(jax.lax.stop_gradient(lv[..., r4:]).astype(jnp.float32)) for lv in levels], axis=1
            )  # (B, A, nc)
        else:
            # A/B reference path: the all-anchor concat, split before casting
            # (an .astype(f32) on the whole (B, A, no) tensor feeding two
            # consumers materializes a full f32 copy; per-consumer casts fuse)
            flat = jnp.concatenate(levels, axis=1)
            pred_distri = flat[..., :r4].astype(jnp.float32)
            pred_scores = flat[..., r4:].astype(jnp.float32)
            # expectation as a fused multiply+reduce: `softmax(x) @ proj` makes
            # the (B, A, 4, reg_max) softmax a matmul OPERAND that XLA must
            # materialize in HBM; (softmax * proj).sum(-1) fuses instead
            dist = (jax.nn.softmax(pred_distri.reshape(b, a, 4, self.reg_max), axis=-1) * self.proj).sum(-1)
            scores_sg = jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores))
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False, axis=-1)  # (B, A, 4) xyxy grid units

        _, target_bboxes, target_scores, fg_mask, _ = self.assigner(
            scores_sg,
            jax.lax.stop_gradient(pred_bboxes) * stride_tensor[None],
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
        )

        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

        # box: CIoU + DFL on foreground anchors (masked, static-shape)
        fg = fg_mask.astype(jnp.float32)
        weight = target_scores.sum(-1) * fg  # (B, A)
        if compact:
            # cls BCE per level (the grad-carrying consumer): identical terms
            # to the all-anchor BCE, summed level-by-level
            loss_cls = jnp.zeros((), jnp.float32)
            off = 0
            for lv in levels:
                a_l = lv.shape[1]
                ps = lv[..., r4:].astype(jnp.float32)
                ts = target_scores[:, off : off + a_l]
                loss_cls = loss_cls + (
                    jnp.clip(ps, 0, None) - ps * ts + jnp.log1p(jnp.exp(-jnp.abs(ps)))
                ).sum()
                off += a_l
            loss_cls = loss_cls / target_scores_sum

            # rank fg slots (weight >= 0) above background (-1); any order of
            # the fg anchors is fine — all of them fit in M by the TAL bound
            slot_idx, _, s_w = self._fg_slots(fg_mask, weight, M)
            s_distri = self._gather_levels([lv[..., :r4] for lv in levels], slot_idx)
            s_distri = s_distri.astype(jnp.float32).reshape(b, M, 4, self.reg_max)
            _, _, _, loss_iou, loss_dfl = self._slot_terms(
                s_distri, slot_idx, anchor_points, stride_tensor, target_bboxes, s_w, target_scores_sum
            )
        else:
            # cls: BCE-with-logits, sum-normalized (inherently all-anchor)
            bce = jnp.clip(pred_scores, 0, None) - pred_scores * target_scores + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
            loss_cls = bce.sum() / target_scores_sum

            target_bboxes_g = target_bboxes / stride_tensor[None]
            iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)
            loss_iou = (((1.0 - iou) * weight) * fg).sum() / target_scores_sum

            target_ltrb = bbox2dist(anchor_points[None], target_bboxes_g, self.reg_max - 1)
            dfl = _df_loss(pred_distri.reshape(b, a, 4, self.reg_max), target_ltrb)  # (B, A)
            loss_dfl = ((dfl * weight) * fg).sum() / target_scores_sum

        loss = jnp.stack(
            [loss_iou * self.hyp.box, loss_cls * self.hyp.cls, loss_dfl * self.hyp.dfl]
        )
        return loss.sum() * B, jax.lax.stop_gradient(loss)


# COCO 17-keypoint OKS sigmas (ref: utils/metrics.py OKS_SIGMA:17)
OKS_SIGMA = (
    jnp.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89])
    / 10.0
)


class v8PoseLoss(v8DetectionLoss):
    """Detection loss + OKS keypoint loss + keypoint-objectness BCE
    (ref: utils/loss.py v8PoseLoss:485, KeypointLoss:177).

    TPU adaptation: gt keypoints arrive pre-padded as (B, max_boxes, nkpt, ndim)
    from the collate (the reference re-batches a flat (N, nkpt, ndim) tensor by
    batch_idx in a Python loop), so the per-anchor gather by target_gt_idx is a
    single static take_along_axis; the fg-subset means become masked sums over
    (B, A, nkpt) with fixed shapes.
    """

    def __init__(self, model, hyp, tal_topk: int = 10):
        super().__init__(model, hyp, tal_topk)
        self.kpt_shape = tuple(model.head.kpt_shape)
        nkpt = self.kpt_shape[0]
        self.sigmas = OKS_SIGMA if self.kpt_shape == (17, 3) else jnp.ones(nkpt) / nkpt

    def __call__(self, preds, batch):
        det_outs, kpt_outs = preds
        B = det_outs[0].shape[0]
        flat = jnp.concatenate([f.reshape(B, -1, self.no) for f in det_outs], axis=1)
        pred_distri = flat[..., : self.reg_max * 4].astype(jnp.float32)
        pred_scores = flat[..., self.reg_max * 4 :].astype(jnp.float32)
        nkpt, ndim = self.kpt_shape
        pred_kpts = jnp.concatenate([k.reshape(B, -1, nkpt * ndim) for k in kpt_outs], axis=1).astype(jnp.float32)
        pred_kpts = pred_kpts.reshape(B, -1, nkpt, ndim)

        feat_shapes = [(f.shape[1], f.shape[2]) for f in det_outs]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.stride, 0.5)
        anchor_points = jnp.asarray(anchor_points)
        stride_tensor = jnp.asarray(stride_tensor)
        imgsz = jnp.array([feat_shapes[0][0] * self.stride[0], feat_shapes[0][1] * self.stride[0]], jnp.float32)

        gt_labels = batch["cls"][..., None].astype(jnp.int32)
        scale = jnp.array([imgsz[1], imgsz[0], imgsz[1], imgsz[0]], jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"] * scale)
        mask_gt = (batch["mask_gt"][..., None] if "mask_gt" in batch else (jnp.sum(gt_bboxes, 2, keepdims=True) > 0)).astype(
            jnp.float32
        )
        gt_bboxes = gt_bboxes * mask_gt

        b, a, _ = pred_distri.shape
        M = self.assigner.topk * gt_labels.shape[1]
        compact = self.compact and M < a
        distri_for_tal = jax.lax.stop_gradient(pred_distri) if compact else pred_distri
        dist = (jax.nn.softmax(distri_for_tal.reshape(b, a, 4, self.reg_max), axis=-1) * self.proj).sum(-1)
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False, axis=-1)

        def kpts_decode(raw, anchors):
            # decode kpts to grid units (ref: v8PoseLoss.kpts_decode:564 — ×2
            # offset around anchor−0.5; conf stays a raw logit during training).
            # anchors: (A, 2) for the all-anchor path, (B, M, 2) compacted.
            kx = raw[..., 0] * 2.0 + (anchors[..., None, 0] - 0.5)
            ky = raw[..., 1] * 2.0 + (anchors[..., None, 1] - 0.5)
            return jnp.concatenate([kx[..., None], ky[..., None], raw[..., 2:]], -1)

        _, target_bboxes, target_scores, fg_mask, target_gt_idx = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes) * stride_tensor[None],
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
        )
        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

        bce = jnp.clip(pred_scores, 0, None) - pred_scores * target_scores + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
        loss_cls = bce.sum() / target_scores_sum

        fg = fg_mask.astype(jnp.float32)
        weight = target_scores.sum(-1) * fg
        n_fg_elems = jnp.maximum(fg.sum() * nkpt, 1.0)
        # gt kpts: normalized → pixels (gathered per-anchor below)
        gt_kpts = batch["keypoints"].astype(jnp.float32)  # (B, N, nkpt, ndim)
        kscale = jnp.concatenate([jnp.array([imgsz[1], imgsz[0]]), jnp.ones(ndim - 2)])
        gt_kpts = gt_kpts * kscale
        if compact:
            # every fg term — CIoU, DFL, OKS, kpt-obj — runs on the static
            # (B, topk*N) slot table; the kpt decode and the gt-kpt gather
            # never materialize at (B, A, nkpt, ndim)
            slot_idx, s_fg, s_w = self._fg_slots(fg_mask, weight, M)
            s_anchor, s_stride, s_tb, loss_iou, loss_dfl = self._compact_box_terms(
                pred_distri, anchor_points, stride_tensor, target_bboxes, slot_idx, s_w, target_scores_sum
            )

            s_kpts = kpts_decode(self._gather(pred_kpts, slot_idx), s_anchor)  # (B, M, nkpt, ndim)
            s_tgi = self._gather(target_gt_idx[..., None], slot_idx)[..., 0]  # (B, M)
            sel = jnp.take_along_axis(gt_kpts, s_tgi[..., None, None].astype(jnp.int32), axis=1)  # (B, M, nkpt, ndim)
            sel_xy = sel[..., :2] / s_stride[..., None, :]
            kpt_mask = (sel[..., 2] != 0).astype(jnp.float32) if ndim == 3 else jnp.ones(sel.shape[:-1], jnp.float32)
            d = (s_kpts[..., 0] - sel_xy[..., 0]) ** 2 + (s_kpts[..., 1] - sel_xy[..., 1]) ** 2
            area = ((s_tb[..., 2] - s_tb[..., 0]) * (s_tb[..., 3] - s_tb[..., 1]))[..., None]
            e = d / ((2 * self.sigmas) ** 2 * (area + 1e-9) * 2)
            kpt_loss_factor = nkpt / (kpt_mask.sum(-1) + 1e-9)  # (B, M)
            loss_pose = (kpt_loss_factor[..., None] * (1.0 - jnp.exp(-e)) * kpt_mask * s_fg[..., None]).sum() / n_fg_elems
            if ndim == 3:
                kl = s_kpts[..., 2]
                kobj_bce = jnp.clip(kl, 0, None) - kl * kpt_mask + jnp.log1p(jnp.exp(-jnp.abs(kl)))
                loss_kobj = (kobj_bce * s_fg[..., None]).sum() / n_fg_elems
            else:
                loss_kobj = jnp.zeros(())
        else:
            pred_kpts = kpts_decode(pred_kpts, anchor_points[None])
            target_bboxes_g = target_bboxes / stride_tensor[None]
            iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)
            loss_iou = (((1.0 - iou) * weight) * fg).sum() / target_scores_sum
            target_ltrb = bbox2dist(anchor_points[None], target_bboxes_g, self.reg_max - 1)
            dfl = _df_loss(pred_distri.reshape(b, a, 4, self.reg_max), target_ltrb)
            loss_dfl = ((dfl * weight) * fg).sum() / target_scores_sum

            # --- keypoint losses (ref: calculate_keypoints_loss:573) ---------------
            sel = jnp.take_along_axis(gt_kpts, target_gt_idx[..., None, None].astype(jnp.int32), axis=1)  # (B, A, nkpt, ndim)
            sel_xy = sel[..., :2] / stride_tensor[None, :, None, :]
            kpt_mask = (sel[..., 2] != 0).astype(jnp.float32) if ndim == 3 else jnp.ones(sel.shape[:-1], jnp.float32)

            # OKS distance term (ref: KeypointLoss.forward:185 — cocoeval denominator)
            d = (pred_kpts[..., 0] - sel_xy[..., 0]) ** 2 + (pred_kpts[..., 1] - sel_xy[..., 1]) ** 2
            area = ((target_bboxes_g[..., 2] - target_bboxes_g[..., 0]) * (target_bboxes_g[..., 3] - target_bboxes_g[..., 1]))[
                ..., None
            ]
            e = d / ((2 * self.sigmas) ** 2 * (area + 1e-9) * 2)
            kpt_loss_factor = nkpt / (kpt_mask.sum(-1) + 1e-9)  # (B, A)
            loss_pose = (kpt_loss_factor[..., None] * (1.0 - jnp.exp(-e)) * kpt_mask * fg[..., None]).sum() / n_fg_elems

            if ndim == 3:
                kl = pred_kpts[..., 2]
                kobj_bce = jnp.clip(kl, 0, None) - kl * kpt_mask + jnp.log1p(jnp.exp(-jnp.abs(kl)))
                loss_kobj = (kobj_bce * fg[..., None]).sum() / n_fg_elems
            else:
                loss_kobj = jnp.zeros(())

        loss = jnp.stack(
            [
                loss_iou * self.hyp.box,
                loss_pose * self.hyp.pose,
                loss_kobj * self.hyp.kobj,
                loss_cls * self.hyp.cls,
                loss_dfl * self.hyp.dfl,
            ]
        )
        return loss.sum() * B, jax.lax.stop_gradient(loss)


class v8OBBLoss(v8DetectionLoss):
    """Oriented-box criterion: probiou box loss + rotated TAL assignment
    (ref: utils/loss.py v8OBBLoss:657, RotatedBboxLoss:144).

    batch['bboxes'] is (B, N, 5) normalized xywh + angle(rad); the reference's
    tiny-rbox filter (w or h < 2px dropped, :706) becomes a mask update so the
    loss stays static-shape.
    """

    def __init__(self, model, hyp, tal_topk: int = 10):
        super().__init__(model, hyp, tal_topk)
        from yolo_tpu.utils.tal import RotatedTaskAlignedAssigner

        self.assigner = RotatedTaskAlignedAssigner(topk=tal_topk, num_classes=self.nc, alpha=0.5, beta=6.0)

    def __call__(self, preds, batch):
        import math

        from yolo_tpu.ops.anchors import dist2rbox
        from yolo_tpu.ops.boxes import probiou

        det_outs, angle_outs = preds
        B = det_outs[0].shape[0]
        flat = jnp.concatenate([f.reshape(B, -1, self.no) for f in det_outs], axis=1)
        pred_distri = flat[..., : self.reg_max * 4].astype(jnp.float32)
        pred_scores = flat[..., self.reg_max * 4 :].astype(jnp.float32)
        # head emits raw logits at train time; the reference head transforms the
        # angle to (sigmoid−0.25)·π before the loss (ref: head.py OBB.forward:316)
        pred_angle = jnp.concatenate([a.reshape(B, -1, 1) for a in angle_outs], axis=1).astype(jnp.float32)
        pred_angle = (jax.nn.sigmoid(pred_angle) - 0.25) * math.pi

        feat_shapes = [(f.shape[1], f.shape[2]) for f in det_outs]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.stride, 0.5)
        anchor_points = jnp.asarray(anchor_points)
        stride_tensor = jnp.asarray(stride_tensor)
        imgsz = jnp.array([feat_shapes[0][0] * self.stride[0], feat_shapes[0][1] * self.stride[0]], jnp.float32)

        gt_labels = batch["cls"][..., None].astype(jnp.int32)
        raw = batch["bboxes"]  # (B, N, 5) normalized xywhr
        scale = jnp.array([imgsz[1], imgsz[0], imgsz[1], imgsz[0]], jnp.float32)
        gt_rboxes = jnp.concatenate([raw[..., :4] * scale, raw[..., 4:5]], -1)
        mask_gt = batch["mask_gt"].astype(jnp.float32)
        # reference filters rboxes under 2px on either side (:705-706).
        # PARITY QUIRK kept on purpose: the reference scales normalized width
        # by imgsz[0]=H and height by imgsz[1]=W (axes swapped); identical on
        # square imgsz, and matching it keeps the assigner mask bit-equal on
        # rectangular sizes too
        big_enough = (raw[..., 2] * imgsz[0] >= 2) & (raw[..., 3] * imgsz[1] >= 2)
        mask_gt = (mask_gt * big_enough.astype(jnp.float32))[..., None]
        gt_rboxes = gt_rboxes * mask_gt

        b, a, _ = pred_distri.shape
        M = self.assigner.topk * gt_labels.shape[1]
        compact = self.compact and M < a
        distri_for_tal = jax.lax.stop_gradient(pred_distri) if compact else pred_distri
        angle_for_tal = jax.lax.stop_gradient(pred_angle) if compact else pred_angle
        dist = (jax.nn.softmax(distri_for_tal.reshape(b, a, 4, self.reg_max), axis=-1) * self.proj).sum(-1)
        pred_rboxes = jnp.concatenate(
            [dist2rbox(dist, angle_for_tal, anchor_points[None], axis=-1), angle_for_tal], -1
        )  # (B, A, 5) grid units

        assigner_boxes = jax.lax.stop_gradient(pred_rboxes)
        assigner_boxes = jnp.concatenate([assigner_boxes[..., :4] * stride_tensor[None], assigner_boxes[..., 4:]], -1)
        _, target_rboxes, target_scores, fg_mask, _ = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            assigner_boxes,
            anchor_points * stride_tensor,
            gt_labels,
            gt_rboxes,
            mask_gt,
        )
        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

        bce = jnp.clip(pred_scores, 0, None) - pred_scores * target_scores + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
        loss_cls = bce.sum() / target_scores_sum

        fg = fg_mask.astype(jnp.float32)
        weight = target_scores.sum(-1) * fg
        if compact:
            slot_idx, _, s_w = self._fg_slots(fg_mask, weight, M)
            s_anchor = anchor_points[slot_idx]  # (B, M, 2)
            s_stride = stride_tensor[slot_idx]  # (B, M, 1)
            s_trb = self._gather(target_rboxes, slot_idx)
            s_tg = jnp.concatenate([s_trb[..., :4] / s_stride, s_trb[..., 4:]], -1)
            s_distri = self._gather(pred_distri, slot_idx).reshape(b, M, 4, self.reg_max)
            s_angle = self._gather(pred_angle, slot_idx)  # (B, M, 1) grad-carrying
            s_dist = (jax.nn.softmax(s_distri, axis=-1) * self.proj).sum(-1)
            s_pred = jnp.concatenate([dist2rbox(s_dist, s_angle, s_anchor, axis=-1), s_angle], -1)
            iou = probiou(s_pred, s_tg)[..., 0]
            loss_iou = ((1.0 - iou) * s_w).sum() / target_scores_sum
            dfl = _df_loss(s_distri, bbox2dist(s_anchor, xywh2xyxy(s_tg[..., :4]), self.reg_max - 1))
            loss_dfl = (dfl * s_w).sum() / target_scores_sum
        else:
            target_g = jnp.concatenate([target_rboxes[..., :4] / stride_tensor[None], target_rboxes[..., 4:]], -1)
            iou = probiou(pred_rboxes, target_g)[..., 0]
            loss_iou = (((1.0 - iou) * weight) * fg).sum() / target_scores_sum

            target_ltrb = bbox2dist(anchor_points[None], xywh2xyxy(target_g[..., :4]), self.reg_max - 1)
            dfl = _df_loss(pred_distri.reshape(b, a, 4, self.reg_max), target_ltrb)
            loss_dfl = ((dfl * weight) * fg).sum() / target_scores_sum

        loss = jnp.stack([loss_iou * self.hyp.box, loss_cls * self.hyp.cls, loss_dfl * self.hyp.dfl])
        return loss.sum() * B, jax.lax.stop_gradient(loss)


class E2EDetectLoss:
    """Dual v10 criterion (ref: utils/loss.py E2EDetectLoss:775): one2many
    branch with TAL topk=10 + one2one branch with topk=1; total = sum."""

    def __init__(self, model, hyp):
        self.one2many = v8DetectionLoss(model, hyp, tal_topk=10)
        self.one2one = v8DetectionLoss(model, hyp, tal_topk=1)

    def __call__(self, preds, batch):
        import jax

        many, one = preds
        l_many, c_many = self.one2many(many, batch)
        l_one, c_one = self.one2one(one, batch)
        # components stay per-branch observable (ref returns
        # torch.cat((loss_one2many[1], loss_one2one[1])), ref :790) — a branch
        # regression would be invisible in a summed 3-vector
        return l_many + l_one, jax.lax.stop_gradient(jnp.concatenate([c_many, c_one]))


class v8SegmentationLoss(v8DetectionLoss):
    """Detection loss + prototype-mask BCE (ref: utils/loss.py v8SegmentationLoss:302).

    TPU adaptation: the reference computes mask BCE only on the (dynamic) set of
    foreground anchors; here the top `max_fg` foreground anchors per image (by
    target score) are gathered into a fixed slot tensor and masked — same math,
    static shapes. gt masks arrive as an overlap-index map (B, h, w) where pixel
    value k>0 marks instance k-1 (the reference's overlap_mask=True encoding).
    """

    def __init__(self, model, hyp, tal_topk: int = 10, max_fg: int = 64):
        super().__init__(model, hyp, tal_topk)
        self.nm = model.head.nm
        self.max_fg = max_fg

    def __call__(self, preds, batch):
        import jax
        import jax.numpy as jnp

        det_outs, mask_outs, protos = preds
        B = det_outs[0].shape[0]
        flat = jnp.concatenate([f.reshape(B, -1, self.no) for f in det_outs], axis=1)
        pred_distri = flat[..., : self.reg_max * 4].astype(jnp.float32)
        pred_scores = flat[..., self.reg_max * 4 :].astype(jnp.float32)
        pred_masks = jnp.concatenate([m.reshape(B, -1, self.nm) for m in mask_outs], axis=1).astype(jnp.float32)

        feat_shapes = [(f.shape[1], f.shape[2]) for f in det_outs]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.stride, 0.5)
        anchor_points = jnp.asarray(anchor_points)
        stride_tensor = jnp.asarray(stride_tensor)
        imgsz = jnp.array([feat_shapes[0][0] * self.stride[0], feat_shapes[0][1] * self.stride[0]], jnp.float32)

        gt_labels = batch["cls"][..., None].astype(jnp.int32)
        scale = jnp.array([imgsz[1], imgsz[0], imgsz[1], imgsz[0]], jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"] * scale)
        mask_gt = batch["mask_gt"][..., None].astype(jnp.float32)
        gt_bboxes = gt_bboxes * mask_gt

        b, a, _ = pred_distri.shape
        M = self.assigner.topk * gt_labels.shape[1]
        compact = self.compact and M < a
        distri_for_tal = jax.lax.stop_gradient(pred_distri) if compact else pred_distri
        dist = (jax.nn.softmax(distri_for_tal.reshape(b, a, 4, self.reg_max), axis=-1) * self.proj).sum(-1)
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False, axis=-1)

        _, target_bboxes, target_scores, fg_mask, target_gt_idx = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes) * stride_tensor[None],
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
        )
        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

        bce = jnp.clip(pred_scores, 0, None) - pred_scores * target_scores + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
        loss_cls = bce.sum() / target_scores_sum

        fg = fg_mask.astype(jnp.float32)
        weight = target_scores.sum(-1) * fg
        if compact:
            # ONE ranking serves both the box/DFL slot table (capacity M, the
            # TAL bound) and the mask-loss slots (top max_fg by score): rank at
            # capacity max(M, max_fg) and slice — the ranking keys coincide
            # (weight == target_scores.sum(-1) on fg anchors, -1 on background)
            K = max(M, self.max_fg)
            slot_full, s_fg_full, s_w_full = self._fg_slots(fg_mask, weight, K)
            _, _, _, loss_iou, loss_dfl = self._compact_box_terms(
                pred_distri, anchor_points, stride_tensor, target_bboxes, slot_full[:, :M], s_w_full[:, :M], target_scores_sum
            )
            slot_idx = slot_full[:, : self.max_fg]  # (B, max_fg) mask-loss slots
            slot_valid = s_fg_full[:, : self.max_fg]
        else:
            target_bboxes_g = target_bboxes / stride_tensor[None]
            iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)
            loss_iou = (((1.0 - iou) * weight) * fg).sum() / target_scores_sum
            target_ltrb = bbox2dist(anchor_points[None], target_bboxes_g, self.reg_max - 1)
            dfl = _df_loss(pred_distri.reshape(b, a, 4, self.reg_max), target_ltrb)
            loss_dfl = ((dfl * weight) * fg).sum() / target_scores_sum
            score_for_rank = jnp.where(fg_mask, target_scores.sum(-1), -1.0)
            _, slot_idx = jax.lax.top_k(score_for_rank, self.max_fg)  # (B, max_fg)
            slot_valid = jnp.take_along_axis(fg_mask, slot_idx, axis=1)

        # --- mask loss over the top-max_fg foreground slots ------------------------
        gt_masks = batch["masks"].astype(jnp.float32)  # (B, mh, mw) overlap map OR (B, N, mh, mw) per-instance
        per_instance = gt_masks.ndim == 4  # overlap_mask=False encoding
        mh, mw = protos.shape[1], protos.shape[2]
        if gt_masks.shape[-2:] != (mh, mw):  # nearest downsample to proto resolution
            sy = gt_masks.shape[-2] // mh
            sx = gt_masks.shape[-1] // mw
            gt_masks = gt_masks[..., ::sy, ::sx][..., :mh, :mw]

        coefs = jnp.take_along_axis(pred_masks, slot_idx[..., None], axis=1)  # (B, M, nm)
        tb = jnp.take_along_axis(target_bboxes, slot_idx[..., None], axis=1)  # (B, M, 4) px
        tgi = jnp.take_along_axis(target_gt_idx, slot_idx, axis=1)  # (B, M)

        if per_instance:
            # gather each slot's own binary mask (overlap_mask=False: ref
            # v8SegmentationLoss masks[target_gt_idx] path)
            gt_m = jnp.take_along_axis(gt_masks, tgi[..., None, None], axis=1)  # (B, M, mh, mw)
        else:
            # per-slot gt mask from the overlap map
            inst = (tgi + 1).astype(jnp.float32)  # overlap encoding is 1-based
            gt_m = (gt_masks[:, None] == inst[..., None, None]).astype(jnp.float32)  # (B, M, mh, mw)

        proto_flat = protos.reshape(B, mh * mw, self.nm)  # NHWC → (B, hw, nm)
        pred_m = jnp.einsum("bmn,bhn->bmh", coefs, proto_flat).reshape(B, self.max_fg, mh, mw)

        mask_bce = jnp.clip(pred_m, 0, None) - pred_m * gt_m + jnp.log1p(jnp.exp(-jnp.abs(pred_m)))
        # crop to target box in mask coords
        bx = tb * jnp.array([mw, mh, mw, mh], jnp.float32) / jnp.array([imgsz[1], imgsz[0], imgsz[1], imgsz[0]])
        ys = jnp.arange(mh, dtype=jnp.float32)[None, None, :, None]
        xs = jnp.arange(mw, dtype=jnp.float32)[None, None, None, :]
        inside = (xs >= bx[..., 0:1, None]) & (xs < bx[..., 2:3, None]) & (ys >= bx[..., 1:2, None]) & (ys < bx[..., 3:4, None])
        # normalized box area (like reference: xyxyn area * mask area denominator)
        wn = (tb[..., 2] - tb[..., 0]) / imgsz[1]
        hn = (tb[..., 3] - tb[..., 1]) / imgsz[0]
        area = jnp.maximum(wn * hn * mh * mw, 1.0)
        per_slot = (mask_bce * inside).mean((-2, -1)) * (mh * mw) / area  # crop-mean / area
        # normalize by the slots actually summed: when fg anchors exceed the
        # static max_fg capacity, dividing by the FULL fg count would shrink
        # the per-anchor mean by max_fg/fg_count on crowded images (equal to
        # the reference's all-anchor mean whenever fg fits in capacity)
        loss_seg = (per_slot * slot_valid).sum() / jnp.maximum(slot_valid.sum(), 1.0)

        loss = jnp.stack(
            [loss_iou * self.hyp.box, loss_seg * self.hyp.box, loss_cls * self.hyp.cls, loss_dfl * self.hyp.dfl]
        )
        return loss.sum() * B, jax.lax.stop_gradient(loss)
