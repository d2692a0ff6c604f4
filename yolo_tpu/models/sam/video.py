"""SAM2 video predictor: prompt once, propagate masks through a video.

Reference counterpart: ultralytics/models/sam/predict.py SAM2VideoPredictor:885
(add_new_prompts → propagate_in_video_preflight → track_step per frame). The
TPU redesign replaces the dict-keyed `output_dict` with the model's
fixed-capacity memory bank (sam2.SAM2Model.init_memory_bank) so the per-frame
step is ONE jitted program with static shapes: encode → memory-conditioned
features → SAM heads → memory encode → ring update. Frames stream through it
under a single compiled executable; only uint8 frames go up and mask logits
come down.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SAM2VideoPredictor:
    """Single-prompt-frame video mask propagation.

    >>> vp = SAM2VideoPredictor(model, params, num_frames=48)
    >>> vp.add_prompt(first_frame_rgb, points=[[320, 240]], labels=[1])
    >>> for frame in frames:
    ...     mask, score = vp.track(frame)
    """

    def __init__(self, model, params, num_frames: int, reverse: bool = False):
        """reverse=True propagates BACKWARD in video time from the prompt
        frame (ref: track_step track_in_reverse) — temporal encodings flip
        sign; feed frames in reverse order."""
        self.model = model
        self.params = params
        self.num_frames = num_frames
        self.reverse = reverse
        self.bank = None
        self._init_jit = jax.jit(self._init_step, static_argnums=(4,))
        self._track_jit = jax.jit(self._track_frame, donate_argnums=(1,))

    # ---- jitted bodies ---------------------------------------------------- #
    def _init_step(self, p, frame, point_coords, point_labels, multimask: bool = True):
        """Conditioning frame: encode, prompt, seed the memory bank
        (ref: SAM2Model.track_step with is_init_cond_frame=True)."""
        m = self.model
        embed, high_res = m.encode_frame(p, frame)
        # init-cond frames skip memory attention: directly add no_mem_embed
        B, H, W, C = embed.shape
        pix = embed + p["no_mem_embed"].astype(jnp.float32).reshape(1, 1, 1, C)
        out = m.forward_sam_heads(p, pix, high_res, point_coords, point_labels, multimask_output=multimask)
        mem_feat, _ = m.encode_new_memory(
            p, embed, out["high_res_masks"][:, 0, :, :, None], out["object_score_logits"]
        )
        bank = m.init_memory_bank(B=frame.shape[0])
        bank = m.update_memory_bank(bank, mem_feat, out["obj_ptr"], is_cond=True)
        return out["high_res_masks"], out["object_score_logits"], bank

    def _track_frame(self, p, bank, frame):
        """Non-conditioning frame (ref: track_step is_init_cond_frame=False)."""
        m = self.model
        bank = dict(bank)
        bank["frame_idx"] = bank["frame_idx"] + 1
        embed, high_res = m.encode_frame(p, frame)
        pix = m.prepare_memory_conditioned_features(p, embed, bank, self.num_frames, reverse=self.reverse)
        # ref _use_multimask: tracking frames (0 points) use multimask with
        # best-IoU selection (multimask_output_for_tracking=True, min_pt=0)
        out = m.forward_sam_heads(p, pix, high_res, multimask_output=True)
        mem_feat, _ = m.encode_new_memory(
            p, embed, out["high_res_masks"][:, 0, :, :, None], out["object_score_logits"]
        )
        bank = m.update_memory_bank(bank, mem_feat, out["obj_ptr"], is_cond=False)
        return out["high_res_masks"], out["object_score_logits"], bank

    # ---- host API ---------------------------------------------------------- #
    def add_prompt(self, frame, points=None, labels=None, box=None):
        """Prompt the conditioning frame. frame: (H, W, 3) or (B, H, W, 3)
        uint8/float RGB at model.img_size; points in pixel coords."""
        frame = self._batch(frame)
        pts_list, lab_list = [], []
        if box is not None:
            box = np.asarray(box, np.float32).reshape(-1, 4)
            pts_list.append(box.reshape(-1, 2, 2))
            lab_list.append(np.tile(np.array([[2, 3]], np.int32), (box.shape[0], 1)))
        if points is not None:
            pts_list.append(np.asarray(points, np.float32).reshape(frame.shape[0], -1, 2))
            lab_list.append(np.asarray(labels, np.int32).reshape(frame.shape[0], -1))
        assert pts_list, "add_prompt needs points and/or box"
        # box corners (labels 2/3) concatenate with clicks, ref concat_points
        pts = np.concatenate(pts_list, axis=1)
        lab = np.concatenate(lab_list, axis=1)
        # ref _use_multimask: multimask only when 0 or 1 clicks
        multimask = pts.shape[1] <= 1
        masks, scores, self.bank = self._init_jit(self.params, frame, jnp.asarray(pts), jnp.asarray(lab), multimask)
        return np.asarray(masks[:, 0]), np.asarray(scores)

    def track(self, frame):
        """Propagate to the next frame → (mask logits (B, H, W), obj score (B, 1))."""
        assert self.bank is not None, "call add_prompt() on the conditioning frame first"
        frame = self._batch(frame)
        masks, scores, self.bank = self._track_jit(self.params, self.bank, frame)
        return np.asarray(masks[:, 0]), np.asarray(scores)

    def propagate(self, frames):
        """Track through (T, H, W, 3) frames → (T, B, H, W) mask logits."""
        out = [self.track(f) for f in frames]
        return np.stack([m for m, _ in out]), np.stack([s for _, s in out])

    def _batch(self, frame):
        frame = jnp.asarray(frame)
        return frame[None] if frame.ndim == 3 else frame
