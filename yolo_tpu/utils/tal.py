"""Task-Aligned assigner, fully vectorized for XLA.

Semantics mirror the reference (ref: ultralytics/utils/tal.py TaskAlignedAssigner:14
— align metric score^α·IoU^β, topk=10 in-gt candidates, duplicate-anchor conflict
resolution by max IoU, normalized target scores). Differences by design:
no data-dependent branches (the n_max_boxes==0 early-out and the fg_mask.max()>1
fast path become mask arithmetic), so the whole assigner jits into the train step.

gt arrays are padded to a static max_boxes; mask_gt marks real rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolo_tpu.ops.boxes import bbox_iou


class TaskAlignedAssigner:
    """Assign gts to anchors by task-aligned metric; returns dense target tensors."""

    def __init__(self, topk: int = 10, num_classes: int = 80, alpha: float = 1.0, beta: float = 6.0, eps: float = 1e-9):
        self.topk = topk
        self.num_classes = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        """Compute the assignment.

        Args:
            pd_scores: (B, A, nc) sigmoided class scores.
            pd_bboxes: (B, A, 4) xyxy in pixels.
            anc_points: (A, 2) anchor centers in pixels.
            gt_labels: (B, N, 1) int labels (padded rows arbitrary).
            gt_bboxes: (B, N, 4) xyxy pixels (padded rows zero).
            mask_gt: (B, N, 1) validity of gt rows.

        Returns:
            target_labels (B, A), target_bboxes (B, A, 4), target_scores (B, A, nc),
            fg_mask (B, A) bool, target_gt_idx (B, A).
        """
        B, A, nc = pd_scores.shape
        N = gt_bboxes.shape[1]
        mask_gt = mask_gt[..., 0].astype(bool)  # (B, N)

        mask_in_gts = self._candidates_in_gts(anc_points, gt_bboxes)  # (B, N, A)
        align_metric, overlaps = self._box_metrics(
            pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask_in_gts & mask_gt[..., None]
        )
        mask_topk = self._topk_mask(align_metric, mask_gt)  # (B, N, A)
        mask_pos = mask_topk & mask_in_gts & mask_gt[..., None]  # bool — f32 masks
        # triple the assigner's HBM traffic at A=27k for no numeric effect

        target_gt_idx, fg_mask, mask_pos = self._resolve_conflicts(mask_pos, overlaps)

        # gather targets
        tl = jnp.clip(jnp.take_along_axis(gt_labels[..., 0], target_gt_idx, axis=1), 0, None)  # (B, A)
        tb = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)  # (B, A, 4)
        one_hot = jax.nn.one_hot(tl, self.num_classes, dtype=jnp.float32)
        target_scores = jnp.where(fg_mask[..., None] > 0, one_hot, 0.0)

        # normalize by per-gt max align metric scaled to max overlap
        align_metric = jnp.where(mask_pos, align_metric, 0.0)
        pos_align = jnp.max(align_metric, axis=-1, keepdims=True)  # (B, N, 1)
        pos_overlaps = jnp.max(jnp.where(mask_pos, overlaps, 0.0), axis=-1, keepdims=True)
        norm = jnp.max(align_metric * pos_overlaps / (pos_align + self.eps), axis=-2)[..., None]  # (B, A, 1)
        target_scores = target_scores * norm

        return tl, tb, target_scores, fg_mask > 0, target_gt_idx

    def _candidates_in_gts(self, anc_points, gt_bboxes, eps: float = 1e-9):
        """(B, N, A) bool: anchor center strictly inside gt box.

        Written as four fused comparisons instead of materializing the
        (B, N, A, 4) delta tensor the reference builds (ref :268) — min-of-
        concat costs 2x the HBM traffic of the equivalent boolean AND chain."""
        ax, ay = anc_points[None, None, :, 0], anc_points[None, None, :, 1]  # (1, 1, A)
        x1, y1 = gt_bboxes[..., None, 0], gt_bboxes[..., None, 1]  # (B, N, 1)
        x2, y2 = gt_bboxes[..., None, 2], gt_bboxes[..., None, 3]
        return (ax - x1 > eps) & (ay - y1 > eps) & (x2 - ax > eps) & (y2 - ay > eps)

    def _box_metrics(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask):
        """align metric + CIoU overlaps, zeroed outside mask."""
        # scores of each anchor for each gt's class: (B, N, A)
        scores_t = jnp.swapaxes(pd_scores, 1, 2)  # (B, nc, A)
        bbox_scores = jnp.take_along_axis(scores_t, jnp.clip(gt_labels, 0, None).astype(jnp.int32), axis=1)
        bbox_scores = jnp.where(mask, bbox_scores, 0.0)
        overlaps = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, CIoU=True)
        overlaps = jnp.where(mask, jnp.clip(overlaps, 0.0, None), 0.0)
        return bbox_scores**self.alpha * overlaps**self.beta, overlaps

    def _topk_mask(self, metrics, mask_gt):
        """(B, N, A) bool marking the top-k metric anchors of each valid gt.

        Selection runs as k masked-argmax sweeps instead of `jax.lax.top_k`:
        top_k lowers to a sort-based selection on TPU and alone cost 9.3 ms of
        the 17 ms assigner at B16×A27k (640×512 P2), while k fused
        argmax+mask passes measure ~1 ms and pick the IDENTICAL set — both
        break ties toward the lowest index, and k distinct indices always come
        back, so the reference's count>1 duplicate filter (ref: tal.py :230,
        invalid slots scattered onto index 0) reduces to membership ANDed with
        gt-row validity.
        """

        def pick(carry, _):
            m, sel = carry
            hit = jax.nn.one_hot(jnp.argmax(m, axis=-1), m.shape[-1], dtype=jnp.bool_)  # (B, N, A)
            return (jnp.where(hit, -jnp.inf, m), sel | hit), None

        (_, sel), _ = jax.lax.scan(
            pick, (metrics, jnp.zeros(metrics.shape, jnp.bool_)), None, length=self.topk
        )
        return sel & mask_gt[..., None]

    def _resolve_conflicts(self, mask_pos, overlaps):
        """Anchor claimed by several gts → keep the max-overlap gt (ref :305-330).

        mask_pos stays bool throughout (counts as int32 reductions); the f32
        one-hot/where chain this replaces materialized three extra (B, N, A)
        f32 tensors per step.
        """
        fg = jnp.sum(mask_pos, axis=-2)  # (B, A) int32 claim count
        max_idx = jnp.argmax(overlaps, axis=-2)  # (B, A)
        is_max = jax.nn.one_hot(max_idx, mask_pos.shape[1], axis=1, dtype=jnp.bool_)  # (B, N, A)
        mask_pos = jnp.where((fg[:, None, :] > 1), is_max, mask_pos)
        fg = jnp.sum(mask_pos, axis=-2)
        target_gt_idx = jnp.argmax(mask_pos, axis=-2)  # (B, A)
        return target_gt_idx, fg, mask_pos


class RotatedTaskAlignedAssigner(TaskAlignedAssigner):
    """TAL for oriented boxes: probiou overlaps + point-in-rotated-rect
    candidacy (ref: utils/tal.py RotatedTaskAlignedAssigner:332)."""

    def _candidates_in_gts(self, anc_points, gt_bboxes, eps: float = 1e-9):
        """(B, N, A) bool via projections onto the box edge vectors."""
        from yolo_tpu.ops.boxes import xywhr2xyxyxyxy

        corners = xywhr2xyxyxyxy(gt_bboxes)  # (B, N, 4, 2)
        a, b, d = corners[..., 0:1, :], corners[..., 1:2, :], corners[..., 3:4, :]
        ab = b - a  # (B, N, 1, 2)
        ad = d - a
        ap = anc_points[None, None] - a  # (B, N, A, 2)
        norm_ab = (ab * ab).sum(-1)
        norm_ad = (ad * ad).sum(-1)
        ap_ab = (ap * ab).sum(-1)
        ap_ad = (ap * ad).sum(-1)
        return (ap_ab >= 0) & (ap_ab <= norm_ab) & (ap_ad >= 0) & (ap_ad <= norm_ad)

    def _box_metrics(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask):
        """align metric with probiou overlaps (boxes are (.., 5) xywhr)."""
        from yolo_tpu.ops.boxes import probiou

        scores_t = jnp.swapaxes(pd_scores, 1, 2)
        bbox_scores = jnp.take_along_axis(scores_t, jnp.clip(gt_labels, 0, None).astype(jnp.int32), axis=1)
        bbox_scores = jnp.where(mask, bbox_scores, 0.0)
        overlaps = probiou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :])[..., 0]
        overlaps = jnp.where(mask, jnp.clip(overlaps, 0.0, None), 0.0)
        return bbox_scores**self.alpha * overlaps**self.beta, overlaps
