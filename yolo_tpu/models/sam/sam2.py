"""SAM2 image-mode stack, functional JAX (ref: ultralytics/models/sam/modules/ —
blocks.py do_pool:488, MultiScaleAttention:503, MultiScaleBlock:583;
encoders.py FpnNeck:515, Hiera:658; decoders.py SAM2MaskDecoder:174;
build.py _build_sam2:216).

Covers the promptable image path (Hiera trunk → FPN neck → SAM2 mask decoder
with object-score token and high-res skip features). The video memory stack
(MemoryAttention/MemoryEncoder, object pointers) is tracked in TODO.md.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.models.sam.modules import (
    MaskDecoder,
    PromptEncoder,
    TwoWayTransformer,
    _layernorm,
    _linear,
    window_partition,
    window_unpartition,
)
from yolo_tpu.nn.transformer import LayerNorm, Linear, MLP


def _do_pool(x, stride=2):
    """MaxPool2d(k=s=stride, ceil_mode=False) on NHWC (ref: blocks.py do_pool:488)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, stride, stride, 1), (1, stride, stride, 1), "VALID"
    )


def _bicubic_matrix(src_hw, dst_hw):
    """Exact torch-bicubic (a=-0.75, align_corners=False) resize as a linear map.

    Interpolation is linear in the inputs, so applying cv2 INTER_CUBIC (same
    kernel as torch bicubic) to identity basis images yields a (dst, src)
    matrix usable inside jit — keeps pos-embed interpolation bit-faithful."""
    import cv2

    sh, sw = src_hw
    dh, dw = dst_hw
    basis = np.eye(sh * sw, dtype=np.float32).reshape(sh * sw, sh, sw)
    out = np.stack([cv2.resize(b, (dw, dh), interpolation=cv2.INTER_CUBIC) for b in basis])
    return out.reshape(sh * sw, dh * dw).T  # (dst, src)


class MultiScaleAttention:
    """MHSA with optional query pooling at stage changes (ref: blocks.py :503)."""

    def __init__(self, dim, dim_out, num_heads, q_stride=None):
        self.dim, self.dim_out, self.nh = dim, dim_out, num_heads
        self.q_stride = q_stride
        self.qkv = Linear(dim, dim_out * 3)
        self.proj = Linear(dim_out, dim_out)

    def init(self, rng):
        return {"qkv": self.qkv.init(rng), "proj": self.proj.init(rng)}

    def __call__(self, p, x):
        B, H, W, _ = x.shape
        hd = self.dim_out // self.nh
        qkv = _linear(p["qkv"], x).reshape(B, H * W, 3, self.nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_stride:
            q = _do_pool(q.reshape(B, H, W, -1), self.q_stride[0])
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, self.nh, hd)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), -1)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, self.dim_out)
        return _linear(p["proj"], y)


class MultiScaleBlock:
    """Hiera block: windowed MSA + optional q-pool + MLP (ref: blocks.py :583)."""

    def __init__(self, dim, dim_out, num_heads, mlp_ratio=4.0, q_stride=None, window_size=0):
        self.dim, self.dim_out = dim, dim_out
        self.window_size = window_size
        self.q_stride = q_stride
        self.norm1 = LayerNorm(dim)
        self.attn = MultiScaleAttention(dim, dim_out, num_heads, q_stride)
        self.norm2 = LayerNorm(dim_out)
        self.mlp = MLP(dim_out, int(dim_out * mlp_ratio), dim_out, 2)
        self.proj = Linear(dim, dim_out) if dim != dim_out else None

    def init(self, rng):
        p = {
            "norm1": self.norm1.init(rng),
            "attn": self.attn.init(rng),
            "norm2": self.norm2.init(rng),
            "mlp": self.mlp.init(rng),
        }
        if self.proj is not None:
            p["proj"] = self.proj.init(rng)
        return p

    def _mlp(self, p, x):
        # torch MLP(num_layers=2, act=GELU): layers.0 → gelu → layers.1
        h = jax.nn.gelu(_linear(p["layers"]["0"], x), approximate=False)
        return _linear(p["layers"]["1"], h)

    def __call__(self, p, x):
        shortcut = x
        x = _layernorm(p["norm1"], x, eps=1e-6)
        if self.proj is not None:
            shortcut = _linear(p["proj"], x)
            if self.q_stride:
                shortcut = _do_pool(shortcut, self.q_stride[0])
        ws = self.window_size
        if ws > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, ws)
        x = self.attn(p["attn"], x)
        if self.q_stride:
            ws = self.window_size // self.q_stride[0]
            H, W = shortcut.shape[1:3]
            pad_h = (ws - H % ws) % ws
            pad_w = (ws - W % ws) % ws
            pad_hw = (H + pad_h, W + pad_w)
        if self.window_size > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        return x + self._mlp(p["mlp"], _layernorm(p["norm2"], x, eps=1e-6))


class Hiera:
    """Hierarchical ViT trunk with 4 stages (ref: encoders.py Hiera:658)."""

    def __init__(self, embed_dim=96, num_heads=1, q_pool=3, q_stride=(2, 2), stages=(2, 3, 16, 3),
                 dim_mul=2.0, head_mul=2.0, window_pos_embed_bkg_spatial_size=(14, 14),
                 window_spec=(8, 4, 14, 7), global_att_blocks=(12, 16, 20)):
        self.embed_dim = embed_dim
        self.window_spec = window_spec
        self.bkg_size = window_pos_embed_bkg_spatial_size
        depth = sum(stages)
        self.stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
        q_pool_blocks = [x + 1 for x in self.stage_ends[:-1]][:q_pool]
        self.blocks = []
        dim = embed_dim
        heads = num_heads
        cur_stage = 1
        self.out_dims = []
        for i in range(depth):
            dim_out = dim
            window_size = self.window_spec[cur_stage - 1]
            if global_att_blocks is not None and i in global_att_blocks:
                window_size = 0
            if i - 1 in self.stage_ends:
                dim_out = int(dim * dim_mul)
                heads = int(heads * head_mul)
                cur_stage += 1
            self.blocks.append(
                MultiScaleBlock(dim, dim_out, heads, q_stride=q_stride if i in q_pool_blocks else None,
                                window_size=window_size)
            )
            dim = dim_out
            if i in self.stage_ends:
                self.out_dims.append(dim_out)
        self._interp_cache = {}

    def init(self, rng):
        k, c = 7, self.embed_dim
        bound = math.sqrt(1.0 / (3 * k * k))
        return {
            "patch_embed": {
                "proj": {
                    "weight": rng.uniform(-bound, bound, (k, k, 3, c)).astype(np.float32),
                    "bias": np.zeros((c,), np.float32),
                }
            },
            # torch keeps these NCHW: (1, C, bkg_h, bkg_w) and (1, C, ws0, ws0)
            "pos_embed": np.zeros((1, c, *self.bkg_size), np.float32),
            "pos_embed_window": np.zeros((1, c, self.window_spec[0], self.window_spec[0]), np.float32),
            "blocks": {str(i): b.init(rng) for i, b in enumerate(self.blocks)},
        }

    def _pos_embed(self, p, hw):
        """Bicubic-interp background embed + tiled window embed (ref :809)."""
        h, w = hw
        key = (h, w)
        if key not in self._interp_cache:
            # cache HOST numpy (a jnp array materialized inside one jit trace
            # would leak that trace's tracer into later jits)
            self._interp_cache[key] = _bicubic_matrix(self.bkg_size, (h, w))
        m = jnp.asarray(self._interp_cache[key])  # (hw, bkg_hw)
        bg = p["pos_embed"].astype(jnp.float32).reshape(p["pos_embed"].shape[1], -1)  # (C, bkg_hw)
        pos = (bg @ m.T).reshape(-1, h, w)  # (C, h, w)
        win = p["pos_embed_window"].astype(jnp.float32)[0]  # (C, ws, ws)
        tile = jnp.tile(win, (1, h // win.shape[1], w // win.shape[2]))
        return (pos + tile).transpose(1, 2, 0)[None]  # (1, h, w, C)

    def __call__(self, p, x):
        """x (B, H, W, 3) → list of 4 stage features, NHWC, fine→coarse."""
        w = p["patch_embed"]["proj"]["weight"].astype(jnp.float32)
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w, (4, 4), [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + p["patch_embed"]["proj"]["bias"]
        x = x + self._pos_embed(p, x.shape[1:3])
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(p["blocks"][str(i)], x)
            if i in self.stage_ends:
                outs.append(x)
        return outs


class FpnNeck:
    """Lateral 1x1 convs + nearest top-down fusion on selected levels
    (ref: encoders.py FpnNeck:515). Positional encodings (used only by the
    video memory stack) are omitted in image mode."""

    def __init__(self, d_model, backbone_channel_list, fpn_top_down_levels=(2, 3)):
        self.d_model = d_model
        self.ch = list(backbone_channel_list)  # ordered coarse→fine like the reference
        self.top_down = set(fpn_top_down_levels)

    def init(self, rng):
        p = {"convs": {}}
        for i, c in enumerate(self.ch):
            bound = math.sqrt(1.0 / c)
            p["convs"][str(i)] = {
                "conv": {
                    "weight": rng.uniform(-bound, bound, (1, 1, c, self.d_model)).astype(np.float32),
                    "bias": rng.uniform(-bound, bound, (self.d_model,)).astype(np.float32),
                }
            }
        return p

    def __call__(self, p, xs):
        """xs: fine→coarse stage features (NHWC); returns fused list, same order."""
        n = len(self.ch) - 1
        out = [None] * len(self.ch)
        prev = None
        for i in range(n, -1, -1):  # top-down: coarse → fine
            x = xs[i]
            cp = p["convs"][str(n - i)]["conv"]
            lateral = jax.lax.conv_general_dilated(
                x.astype(jnp.float32), cp["weight"].astype(jnp.float32), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + cp["bias"]
            if i in self.top_down and prev is not None:
                up = jnp.repeat(jnp.repeat(prev, 2, 1), 2, 2)  # nearest ×2
                prev = lateral + up
            else:
                prev = lateral
            out[i] = prev
        return out


class SAM2MaskDecoder(MaskDecoder):
    """SAM mask decoder + object-score token + high-res skip features
    (ref: decoders.py SAM2MaskDecoder:174)."""

    def __init__(self, transformer_dim=256, num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=256,
                 transformer=None, use_high_res_features=True, pred_obj_scores=True, pred_obj_scores_mlp=True,
                 iou_prediction_use_sigmoid=False, dynamic_multimask_via_stability=False,
                 dynamic_multimask_stability_delta=0.05, dynamic_multimask_stability_thresh=0.98,
                 use_multimask_token_for_obj_ptr=False):
        super().__init__(transformer_dim, num_multimask_outputs, iou_head_depth, iou_head_hidden_dim, transformer)
        if iou_prediction_use_sigmoid:
            self.iou_prediction_head = MLP(transformer_dim, iou_head_hidden_dim, self.num_mask_tokens, iou_head_depth, sigmoid=True)
        self.use_high_res_features = use_high_res_features
        self.pred_obj_scores = pred_obj_scores
        self.pred_obj_scores_mlp = pred_obj_scores_mlp
        self.dynamic_multimask_via_stability = dynamic_multimask_via_stability
        self.dynamic_multimask_stability_delta = dynamic_multimask_stability_delta
        self.dynamic_multimask_stability_thresh = dynamic_multimask_stability_thresh
        self.use_multimask_token_for_obj_ptr = use_multimask_token_for_obj_ptr
        if pred_obj_scores:
            self.obj_head = MLP(transformer_dim, transformer_dim, 1, 3) if pred_obj_scores_mlp else Linear(transformer_dim, 1)

    def init(self, rng):
        p = super().init(rng)
        td = self.td
        if self.pred_obj_scores:
            p["obj_score_token"] = {"weight": rng.normal(0, 1, (1, td)).astype(np.float32)}
            p["pred_obj_score_head"] = self.obj_head.init(rng)
        if self.use_high_res_features:
            b0 = math.sqrt(1.0 / td)
            p["conv_s0"] = {
                "weight": rng.uniform(-b0, b0, (1, 1, td, td // 8)).astype(np.float32),
                "bias": np.zeros((td // 8,), np.float32),
            }
            p["conv_s1"] = {
                "weight": rng.uniform(-b0, b0, (1, 1, td, td // 4)).astype(np.float32),
                "bias": np.zeros((td // 4,), np.float32),
            }
        return p

    def __call__(self, p, image_embeddings, image_pe, sparse, dense, multimask_output, high_res_features=None):
        masks, iou_pred, _, obj = self.predict_masks_sam2(p, image_embeddings, image_pe, sparse, dense, high_res_features)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl], obj

    # ---- video-tracking forward: ref decoders.py SAM2MaskDecoder.forward :345 ----
    def _stability_scores(self, mask_logits):
        """IoU between ±delta thresholdings (ref: decoders.py :452)."""
        d = self.dynamic_multimask_stability_delta
        flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
        area_i = (flat > d).sum(-1).astype(jnp.float32)
        area_u = (flat > -d).sum(-1).astype(jnp.float32)
        return jnp.where(area_u > 0, area_i / area_u, 1.0)

    def _dynamic_multimask_via_stability(self, masks, ious):
        """Swap the single-mask token output for the best multimask when it is
        unstable (ref: decoders.py :460)."""
        multi_m, multi_i = masks[:, 1:], ious[:, 1:]
        best = jnp.argmax(multi_i, axis=-1)
        bi = jnp.arange(masks.shape[0])
        best_m = multi_m[bi, best][:, None]
        best_i = multi_i[bi, best][:, None]
        single_m, single_i = masks[:, 0:1], ious[:, 0:1]
        stable = self._stability_scores(single_m) >= self.dynamic_multimask_stability_thresh  # (B, 1)
        m = jnp.where(stable[..., None, None], single_m, best_m)
        i = jnp.where(stable, single_i, best_i)
        return m, i

    def forward_video(self, p, image_embeddings, image_pe, sparse, dense, multimask_output, high_res_features=None):
        """Returns (masks, iou, sam_tokens_out, obj_logits) with the reference's
        multimask/stability selection (ref: decoders.py forward :345-379)."""
        masks, iou_pred, mask_tokens_out, obj = self.predict_masks_sam2(
            p, image_embeddings, image_pe, sparse, dense, high_res_features
        )
        if multimask_output:
            masks, iou_pred = masks[:, 1:], iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability:
            masks, iou_pred = self._dynamic_multimask_via_stability(masks, iou_pred)
        else:
            masks, iou_pred = masks[:, 0:1], iou_pred[:, 0:1]
        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return masks, iou_pred, sam_tokens_out, obj

    def predict_masks_sam2(self, p, image_embeddings, image_pe, sparse, dense, high_res_features=None):
        s = 1 if self.pred_obj_scores else 0
        toks = [p["iou_token"]["weight"], p["mask_tokens"]["weight"]]
        if self.pred_obj_scores:
            toks.insert(0, p["obj_score_token"]["weight"])
        out_tokens = jnp.concatenate(toks, 0)
        B = sparse.shape[0]
        tokens = jnp.concatenate([jnp.broadcast_to(out_tokens[None], (B, *out_tokens.shape)), sparse], 1)
        src = jnp.broadcast_to(image_embeddings, (B, *image_embeddings.shape[1:])) + dense
        hs, src2 = self.transformer(p["transformer"], src, image_pe, tokens)
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1 : s + 1 + self.num_mask_tokens]
        h, w = src.shape[1], src.shape[2]
        x = src2.reshape(B, h, w, self.td)
        up = p["output_upscaling"]

        def deconv(pp, z):
            return jax.lax.conv_transpose(
                z.astype(jnp.float32), pp["weight"].astype(jnp.float32), (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
            ) + pp["bias"]

        if self.use_high_res_features and high_res_features is not None:
            # features arrive already projected by conv_s0/conv_s1 (the reference
            # applies them in SAM2Model.forward_image, ref: sam.py :745)
            f_s0, f_s1 = high_res_features  # NHWC: (…, td/8) stride 4, (…, td/4) stride 8
            x = jax.nn.gelu(_layernorm(up["1"], deconv(up["0"], x) + f_s1), approximate=False)
            x = jax.nn.gelu(deconv(up["3"], x) + f_s0, approximate=False)
        else:
            x = jax.nn.gelu(_layernorm(up["1"], deconv(up["0"], x)), approximate=False)
            x = jax.nn.gelu(deconv(up["3"], x), approximate=False)
        hyper = jnp.stack(
            [m(p["output_hypernetworks_mlps"][str(i)], mask_tokens_out[:, i]) for i, m in enumerate(self.output_hypernetworks_mlps)],
            1,
        )
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, x)
        iou_pred = self.iou_prediction_head(p["iou_prediction_head"], iou_token_out)
        if self.pred_obj_scores:
            obj = (
                self.obj_head(p["pred_obj_score_head"], hs[:, 0])
                if self.pred_obj_scores_mlp
                else _linear(p["pred_obj_score_head"], hs[:, 0])
            )
        else:
            obj = 10.0 * jnp.ones((iou_pred.shape[0], 1), jnp.float32)
        return masks, iou_pred, mask_tokens_out, obj


class SAM2Model:
    """SAM2 promptable image segmentation (ref: sam.py SAM2Model:100 image path).

    encode_image returns (image_embed + no_mem_embed, [feat_s0, feat_s1]) per
    the reference predictor's get_im_features (scalp=1 drops the coarsest level)."""

    mask_threshold = 0.0
    NO_OBJ_SCORE = -1024.0

    def __init__(self, trunk: Hiera, neck: FpnNeck, img_size=1024,
                 pixel_mean=(123.675, 116.28, 103.53), pixel_std=(58.395, 57.12, 57.375),
                 num_maskmem=7, mem_dim=64, max_obj_ptrs=16, memory_layers=4, sam2_1=True):
        from yolo_tpu.models.sam.memory import MemoryAttention, MemoryEncoder

        self.trunk = trunk
        self.neck = neck
        self.img_size = img_size
        grid = img_size // 16
        self.embed_hw = (grid, grid)
        self.hidden_dim = 256
        self.num_maskmem = num_maskmem
        self.mem_dim = mem_dim
        self.max_obj_ptrs = max_obj_ptrs
        self.sam2_1 = sam2_1  # SAM2.1: no_obj_embed_spatial + signed/projected obj-ptr tpos
        self.sigmoid_scale_for_mem_enc = 20.0
        self.sigmoid_bias_for_mem_enc = -10.0
        self.prompt_encoder = PromptEncoder(256, (grid, grid), (img_size, img_size), 16)
        self.mask_decoder = SAM2MaskDecoder(
            256, 3, transformer=TwoWayTransformer(2, 256, 8, 2048, sam2=True),
            iou_prediction_use_sigmoid=True, dynamic_multimask_via_stability=True,
            use_multimask_token_for_obj_ptr=True,
        )
        self.memory_attention = MemoryAttention(256, memory_layers, 2048, mem_dim, feat_hw=self.embed_hw)
        self.memory_encoder = MemoryEncoder(out_dim=mem_dim, in_dim=256)
        self.obj_ptr_proj = MLP(256, 256, 256, 3)
        self.obj_ptr_tpos_proj = Linear(256, mem_dim) if sam2_1 else None
        self.pixel_mean = np.asarray(pixel_mean, np.float32)
        self.pixel_std = np.asarray(pixel_std, np.float32)

    # expose the same predictor interface as SAMModel
    @property
    def image_encoder(self):
        class _E:
            img_size = self.img_size

        return _E()

    def init(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        p = {
            "image_encoder": {"trunk": self.trunk.init(rng), "neck": self.neck.init(rng)},
            "sam_prompt_encoder": self.prompt_encoder.init(rng),
            "sam_mask_decoder": self.mask_decoder.init(rng),
            "no_mem_embed": rng.normal(0, 0.02, (1, 1, 256)).astype(np.float32),
            "no_mem_pos_enc": rng.normal(0, 0.02, (1, 1, 256)).astype(np.float32),
            # video memory stack (ref: sam.py SAM2Model.__init__ :173)
            "memory_attention": self.memory_attention.init(rng),
            "memory_encoder": self.memory_encoder.init(rng),
            "obj_ptr_proj": self.obj_ptr_proj.init(rng),
            "maskmem_tpos_enc": rng.normal(0, 0.02, (self.num_maskmem, 1, 1, self.mem_dim)).astype(np.float32),
            "no_obj_ptr": rng.normal(0, 0.02, (1, 256)).astype(np.float32),
        }
        if self.sam2_1:
            p["obj_ptr_tpos_proj"] = self.obj_ptr_tpos_proj.init(rng)
            p["no_obj_embed_spatial"] = rng.normal(0, 0.02, (1, self.mem_dim)).astype(np.float32)
        return p

    def encode_image(self, p, x):
        """x (B, H, W, 3) raw RGB [0,255] → (image_embed, [s0, s1]) NHWC."""
        x = (x.astype(jnp.float32) - self.pixel_mean) / self.pixel_std
        feats = self.trunk(p["image_encoder"]["trunk"], x)
        fpn = self.neck(p["image_encoder"]["neck"], feats)
        # scalp=1: drop the lowest-resolution level; embed = new coarsest
        s0, s1, embed = fpn[0], fpn[1], fpn[2]

        def conv1x1(pp, z):
            return jax.lax.conv_general_dilated(
                z.astype(jnp.float32), pp["weight"].astype(jnp.float32), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pp["bias"]

        # project high-res skips with the decoder's conv_s0/s1 (ref: sam.py forward_image)
        dp = p["sam_mask_decoder"]
        s0 = conv1x1(dp["conv_s0"], s0)
        s1 = conv1x1(dp["conv_s1"], s1)
        embed = embed + p["no_mem_embed"].astype(jnp.float32).reshape(1, 1, 1, -1)
        return embed, (s0, s1)

    def predict_masks(self, p, image_embed, high_res, points=None, boxes=None, masks=None, multimask_output=True):
        sparse, dense = self.prompt_encoder(p["sam_prompt_encoder"], points=points, boxes=boxes, masks=masks)
        image_pe = self.prompt_encoder.get_dense_pe(p["sam_prompt_encoder"])
        return self.mask_decoder(
            p["sam_mask_decoder"], image_embed, image_pe, sparse, dense, multimask_output, high_res_features=high_res
        )

    # ------------------------------------------------------------------ #
    # video memory stack (ref: sam.py SAM2Model :646-935)
    # ------------------------------------------------------------------ #
    def encode_frame(self, p, x):
        """Raw frame encoding for video: (B, H, W, 3) [0,255] → (embed WITHOUT
        no_mem_embed, (s0, s1) projected high-res skips) — the no-mem handling
        happens per-frame in the tracking step (ref: forward_image :621)."""
        x = (x.astype(jnp.float32) - self.pixel_mean) / self.pixel_std
        feats = self.trunk(p["image_encoder"]["trunk"], x)
        fpn = self.neck(p["image_encoder"]["neck"], feats)
        s0, s1, embed = fpn[0], fpn[1], fpn[2]

        def conv1x1(pp, z):
            return jax.lax.conv_general_dilated(
                z.astype(jnp.float32), pp["weight"].astype(jnp.float32), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pp["bias"]

        dp = p["sam_mask_decoder"]
        return embed, (conv1x1(dp["conv_s0"], s0), conv1x1(dp["conv_s1"], s1))

    def vision_pos_embed(self):
        """Top-level sine positional embedding, (L, C) — the reference FpnNeck's
        PositionEmbeddingSine(d_model) for the memory attention queries."""
        from yolo_tpu.models.sam.memory import sine_pos_embed_2d

        h, w = self.embed_hw
        return jnp.asarray(sine_pos_embed_2d(h, w, self.hidden_dim).reshape(h * w, self.hidden_dim))

    def forward_sam_heads(self, p, pix_feat, high_res=None, point_coords=None, point_labels=None,
                          mask_inputs=None, multimask_output=False):
        """SAM heads on memory-conditioned features (ref: _forward_sam_heads :423).

        pix_feat (B, H, W, 256) NHWC. Returns dict with low/high-res masks,
        obj_ptr (B, 256) and object_score_logits (B, 1).
        """
        B = pix_feat.shape[0]
        if point_coords is None:
            point_coords = jnp.zeros((B, 1, 2), jnp.float32)
            point_labels = -jnp.ones((B, 1), jnp.int32)
        sparse, dense = self.prompt_encoder(
            p["sam_prompt_encoder"], points=(point_coords, point_labels), masks=mask_inputs
        )
        image_pe = self.prompt_encoder.get_dense_pe(p["sam_prompt_encoder"])
        masks, ious, sam_tokens, obj_logits = self.mask_decoder.forward_video(
            p["sam_mask_decoder"], pix_feat, image_pe, sparse, dense, multimask_output, high_res_features=high_res
        )
        is_obj = obj_logits > 0  # (B, 1)
        masks = jnp.where(is_obj[..., None, None], masks, self.NO_OBJ_SCORE)
        masks = masks.astype(jnp.float32)
        high_res_masks = jax.image.resize(masks, (*masks.shape[:2], self.img_size, self.img_size), "bilinear")
        sam_token = sam_tokens[:, 0]
        if multimask_output:
            bi = jnp.arange(B)
            best = jnp.argmax(ious, axis=-1)
            low_res = masks[bi, best][:, None]
            high_res = high_res_masks[bi, best][:, None]
            if sam_tokens.shape[1] > 1:
                sam_token = sam_tokens[bi, best]
        else:
            low_res, high_res = masks, high_res_masks
        obj_ptr = self.obj_ptr_proj(p["obj_ptr_proj"], sam_token)
        lam = is_obj.astype(jnp.float32)  # hard (soft_no_obj_ptr=False), (B, 1)
        obj_ptr = lam * obj_ptr + (1.0 - lam) * p["no_obj_ptr"].astype(jnp.float32)
        return {
            "low_res_multimasks": masks,
            "high_res_multimasks": high_res_masks,
            "ious": ious,
            "low_res_masks": low_res,
            "high_res_masks": high_res,
            "obj_ptr": obj_ptr,
            "object_score_logits": obj_logits,
        }

    def encode_new_memory(self, p, pix_feat, high_res_masks, object_score_logits):
        """Current frame features + predicted mask → memory slot features
        (ref: _encode_new_memory :810). pix_feat (B, H, W, 256); high_res_masks
        (B, img, img, 1) logits. Returns (mem_feat (B, L, mem_dim), mem_pos (L, mem_dim))."""
        mask_for_mem = jax.nn.sigmoid(high_res_masks)
        mask_for_mem = mask_for_mem * self.sigmoid_scale_for_mem_enc + self.sigmoid_bias_for_mem_enc
        feats, pos = self.memory_encoder(p["memory_encoder"], pix_feat, mask_for_mem, skip_mask_sigmoid=True)
        if self.sam2_1 and "no_obj_embed_spatial" in p:
            is_obj = (object_score_logits > 0).astype(jnp.float32)  # (B, 1)
            feats = feats + (1.0 - is_obj)[..., None, None] * p["no_obj_embed_spatial"].astype(jnp.float32)[0]
        B, h, w, c = feats.shape
        return feats.reshape(B, h * w, c), pos.reshape(h * w, c)

    def init_memory_bank(self, B: int = 1):
        """Fixed-capacity per-object memory: 1 conditioning slot + a ring of the
        last num_maskmem-1 frames + an object-pointer ring (TPU-native stand-in
        for the reference's dict-keyed output_dict, ref :646)."""
        h, w = self.embed_hw
        Lm = h * w
        R = self.num_maskmem - 1
        P = self.max_obj_ptrs - 1
        return {
            "cond_feat": jnp.zeros((B, Lm, self.mem_dim), jnp.float32),
            "cond_ptr": jnp.zeros((B, 256), jnp.float32),
            "cond_idx": jnp.zeros((), jnp.int32),
            # ring slot j holds the frame at t_rel = j+1 (j=0 most recent)
            "recent_feat": jnp.zeros((B, R, Lm, self.mem_dim), jnp.float32),
            "recent_valid": jnp.zeros((B, R), bool),
            "ptrs": jnp.zeros((B, P, 256), jnp.float32),
            "ptr_valid": jnp.zeros((B, P), bool),
            "frame_idx": jnp.zeros((), jnp.int32),
        }

    def prepare_memory_conditioned_features(self, p, embed, bank, num_frames: int, reverse: bool = False):
        """Fuse current features with the memory bank (ref: :646). embed
        (B, H, W, 256) raw; returns memory-conditioned (B, H, W, 256).

        Invalid slots are excluded via attention masking — numerically identical
        to the reference's variable-length memory concatenation."""
        from yolo_tpu.models.sam.memory import get_1d_sine_pe, sine_pos_embed_2d

        B, H, W, C = embed.shape
        Lm = H * W
        R = self.num_maskmem - 1
        curr = embed.reshape(B, Lm, C)
        curr_pos = jnp.broadcast_to(self.vision_pos_embed()[None], (B, Lm, C))

        mem_pos_spatial = jnp.asarray(sine_pos_embed_2d(H, W, self.mem_dim).reshape(Lm, self.mem_dim))
        tpos = p["maskmem_tpos_enc"].astype(jnp.float32).reshape(self.num_maskmem, self.mem_dim)
        # blocks: [cond (t_pos=0 → enc idx M-1), ring j=0..R-1 (enc idx j)]
        blocks = jnp.concatenate([bank["cond_feat"][:, None], bank["recent_feat"]], axis=1)  # (B, M, Lm, mem)
        block_tpos = jnp.concatenate([tpos[self.num_maskmem - 1][None], tpos[:R]], axis=0)  # (M, mem)
        pos_blocks = mem_pos_spatial[None] + block_tpos[:, None]  # (M, Lm, mem)
        mem_spatial = blocks.reshape(B, self.num_maskmem * Lm, self.mem_dim)
        pos_spatial = jnp.broadcast_to(
            pos_blocks.reshape(1, self.num_maskmem * Lm, self.mem_dim), (B, self.num_maskmem * Lm, self.mem_dim)
        )
        valid_blocks = jnp.concatenate([jnp.ones((B, 1), bool), bank["recent_valid"]], axis=1)  # (B, M)
        mask_spatial = jnp.repeat(valid_blocks, Lm, axis=1)

        # object pointers: cond ptr + ring; each splits into C/mem_dim tokens
        P = self.max_obj_ptrs - 1
        split = C // self.mem_dim
        ptrs = jnp.concatenate([bank["cond_ptr"][:, None], bank["ptrs"]], axis=1)  # (B, P+1, C)
        ptr_valid = jnp.concatenate([jnp.ones((B, 1), bool), bank["ptr_valid"]], axis=1)
        # temporal distances are processing-order recency — positive in BOTH
        # directions (the reference's signed formula (frame_idx - t) *
        # tpos_sign_mul reduces to +distance forward AND reverse; its non-cond
        # entries use plain positive t_diff either way), so `reverse` needs no
        # sign change here — it only documents the frame-feeding order
        del reverse
        tdiff = jnp.concatenate(
            [(bank["frame_idx"] - bank["cond_idx"])[None], jnp.arange(1, P + 1, dtype=jnp.int32)]
        ).astype(jnp.float32)  # (P+1,) signed temporal distances
        t_diff_max = max(min(num_frames, self.max_obj_ptrs) - 1, 1)
        if self.sam2_1:
            obj_pos = get_1d_sine_pe(tdiff / t_diff_max, dim=C)  # (P+1, C)
            obj_pos = self.obj_ptr_tpos_proj(p["obj_ptr_tpos_proj"], obj_pos)  # (P+1, mem)
        else:
            obj_pos = jnp.zeros((P + 1, self.mem_dim), jnp.float32)
        ptr_tokens = ptrs.reshape(B, P + 1, split, self.mem_dim).reshape(B, (P + 1) * split, self.mem_dim)
        ptr_pos = jnp.broadcast_to(
            jnp.repeat(obj_pos, split, axis=0)[None], (B, (P + 1) * split, self.mem_dim)
        )
        mask_ptr = jnp.repeat(ptr_valid, split, axis=1)

        memory = jnp.concatenate([mem_spatial, ptr_tokens], axis=1)
        memory_pos = jnp.concatenate([pos_spatial, ptr_pos], axis=1)
        key_mask = jnp.concatenate([mask_spatial, mask_ptr], axis=1)
        out = self.memory_attention(
            p["memory_attention"], curr, memory, curr_pos, memory_pos,
            num_obj_ptr_tokens=(P + 1) * split, key_mask=key_mask,
        )
        return out.reshape(B, H, W, C)

    def update_memory_bank(self, bank, mem_feat, obj_ptr, is_cond: bool):
        """Advance the bank after a frame: conditioning frame seeds the cond
        slot; tracked frames shift into the recency rings."""
        if is_cond:
            bank = dict(bank)
            bank["cond_feat"] = mem_feat
            bank["cond_ptr"] = obj_ptr
            bank["cond_idx"] = bank["frame_idx"]
            return bank
        bank = dict(bank)
        bank["recent_feat"] = jnp.concatenate([mem_feat[:, None], bank["recent_feat"][:, :-1]], axis=1)
        bank["recent_valid"] = jnp.concatenate(
            [jnp.ones((mem_feat.shape[0], 1), bool), bank["recent_valid"][:, :-1]], axis=1
        )
        bank["ptrs"] = jnp.concatenate([obj_ptr[:, None], bank["ptrs"][:, :-1]], axis=1)
        bank["ptr_valid"] = jnp.concatenate(
            [jnp.ones((obj_ptr.shape[0], 1), bool), bank["ptr_valid"][:, :-1]], axis=1
        )
        return bank


def build_sam2_t(img_size=1024):
    """SAM2 Hiera-Tiny (ref: build.py build_sam2_t:45-area)."""
    trunk = Hiera(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2), global_att_blocks=(5, 7, 9),
                  window_pos_embed_bkg_spatial_size=(7, 7), window_spec=(8, 4, 14, 7))
    neck = FpnNeck(256, [768, 384, 192, 96])
    return SAM2Model(trunk, neck, img_size=img_size)


def build_sam2_s(img_size=1024):
    trunk = Hiera(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2), global_att_blocks=(7, 10, 13),
                  window_pos_embed_bkg_spatial_size=(7, 7), window_spec=(8, 4, 14, 7))
    neck = FpnNeck(256, [768, 384, 192, 96])
    return SAM2Model(trunk, neck, img_size=img_size)


def build_sam2_b(img_size=1024):
    trunk = Hiera(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3), global_att_blocks=(12, 16, 20),
                  window_pos_embed_bkg_spatial_size=(14, 14), window_spec=(8, 4, 14, 7))
    neck = FpnNeck(256, [896, 448, 224, 112])
    return SAM2Model(trunk, neck, img_size=img_size)
