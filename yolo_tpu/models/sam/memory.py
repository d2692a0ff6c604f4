"""SAM2 video memory stack — functional JAX.

Reference counterparts (all under /root/reference/ultralytics/models/sam/modules/):
  - memory_attention.py MemoryAttentionLayer:13, MemoryAttention:170
  - blocks.py RoPEAttention:405, MaskDownSampler:54, CXBlock:114, Fuser:208,
    PositionEmbeddingSine:698
  - encoders.py MemoryEncoder:356
  - utils.py init_t_xy:~90, compute_axial_cis:119, apply_rotary_enc:176,
    get_1d_sine_pe:64

TPU-first departures from the reference:
  - rotary encoding in real cos/sin arithmetic (no complex dtype — XLA on TPU
    emulates complex, real pairs ride the VPU natively);
  - the memory bank is FIXED-CAPACITY (slots + validity mask); invalid slots
    are excluded with an additive -inf attention mask, which is numerically
    identical to the reference's dynamic-length concatenation because RoPE
    rotations are per-token and softmax(-inf) = exclusion;
  - everything is a pure (params, …) -> … function, jit/scan-able.

Param-tree key names mirror the torch module names so checkpoints import
mechanically through nn/torch_import.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.models.sam.modules import _layernorm, _linear
from yolo_tpu.nn.transformer import Linear

NEG_INF = -1e9


# --------------------------------------------------------------------------- #
# positional encodings
# --------------------------------------------------------------------------- #
def get_1d_sine_pe(pos, dim: int, temperature: float = 10000.0):
    """(…,) positions → (…, dim) sine/cos embedding (ref: utils.py :64)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


def sine_pos_embed_2d(h: int, w: int, channels: int, temperature: float = 10000.0, scale: float = 2 * math.pi):
    """(h, w, channels) normalized 2-D sine embedding (ref: blocks.py
    PositionEmbeddingSine:698 forward, normalize=True). channels must be even;
    output = concat(pos_y, pos_x) each channels/2 wide."""
    npf = channels // 2
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(npf, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], -1).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], -1).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1)  # (h, w, channels)


def axial_rope_angles(head_dim: int, end_x: int, end_y: int, theta: float = 10000.0):
    """Rotation angles (end_x*end_y, head_dim//2) for axial 2-D RoPE
    (ref: utils.py compute_axial_cis:119 — we keep angles, not complex cis)."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[: head_dim // 4].astype(np.float32) / head_dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x, t_y = t % end_x, np.floor(t / end_x)
    ang_x = np.outer(t_x, freqs)
    ang_y = np.outer(t_y, freqs)
    return np.concatenate([ang_x, ang_y], axis=-1)  # (L, head_dim//2)


def apply_rotary(x, angles):
    """Rotate consecutive pairs of the last dim by angles (ref: utils.py
    apply_rotary_enc:176 real-arithmetic equivalent).

    x: (B, nH, L, hd); angles: (L, hd//2).
    """
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    re, im = x2[..., 0], x2[..., 1]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    out_re = re * cos - im * sin
    out_im = re * sin + im * cos
    return jnp.stack([out_re, out_im], axis=-1).reshape(x.shape)


# --------------------------------------------------------------------------- #
# RoPE attention
# --------------------------------------------------------------------------- #
class RoPEAttention:
    """Multi-head attention with axial RoPE (ref: blocks.py RoPEAttention:405).

    feat_hw fixes the query grid (static under jit). For cross-attention to
    memories (rope_k_repeat), the key rotation is the query grid's angles tiled
    along the sequence; the trailing `num_k_exclude_rope` key tokens (object
    pointers) are never rotated.
    """

    def __init__(self, embedding_dim, num_heads, downsample_rate=1, kv_in_dim=None,
                 rope_theta=10000.0, rope_k_repeat=False, feat_hw=(64, 64)):
        self.internal_dim = embedding_dim // downsample_rate
        self.nh = num_heads
        kv_in = kv_in_dim if kv_in_dim is not None else embedding_dim
        self.q_proj = Linear(embedding_dim, self.internal_dim)
        self.k_proj = Linear(kv_in, self.internal_dim)
        self.v_proj = Linear(kv_in, self.internal_dim)
        self.out_proj = Linear(self.internal_dim, embedding_dim)
        self.rope_k_repeat = rope_k_repeat
        hd = self.internal_dim // num_heads
        self.angles = jnp.asarray(axial_rope_angles(hd, feat_hw[1], feat_hw[0], rope_theta))

    def init(self, rng):
        return {
            "q_proj": self.q_proj.init(rng),
            "k_proj": self.k_proj.init(rng),
            "v_proj": self.v_proj.init(rng),
            "out_proj": self.out_proj.init(rng),
        }

    def __call__(self, p, q, k, v, num_k_exclude_rope: int = 0, key_mask=None):
        """q (B, Lq, Dq); k/v (B, Lk, Dkv); key_mask (B, Lk) bool (True=keep)."""
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        hd = self.internal_dim // self.nh
        q = _linear(p["q_proj"], q).reshape(B, Lq, self.nh, hd).transpose(0, 2, 1, 3)
        k = _linear(p["k_proj"], k).reshape(B, Lk, self.nh, hd).transpose(0, 2, 1, 3)
        v = _linear(p["v_proj"], v).reshape(B, Lk, self.nh, hd).transpose(0, 2, 1, 3)

        assert self.angles.shape[0] == Lq, f"RoPE grid {self.angles.shape[0]} != query length {Lq}"
        q = apply_rotary(q, self.angles)
        num_k_rope = Lk - num_k_exclude_rope
        if num_k_rope == Lq and not self.rope_k_repeat:
            k_ang = self.angles
        else:
            assert self.rope_k_repeat and num_k_rope % Lq == 0
            k_ang = jnp.tile(self.angles, (num_k_rope // Lq, 1))
        k_rot = apply_rotary(k[:, :, :num_k_rope], k_ang)
        k = jnp.concatenate([k_rot, k[:, :, num_k_rope:]], axis=2) if num_k_exclude_rope else k_rot

        attn = q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd)
        if key_mask is not None:
            attn = jnp.where(key_mask[:, None, None, :], attn, NEG_INF)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Lq, self.internal_dim)
        return _linear(p["out_proj"], out)


# --------------------------------------------------------------------------- #
# memory attention
# --------------------------------------------------------------------------- #
class MemoryAttentionLayer:
    """Self-attn + cross-attn-to-memory + FFN (ref: memory_attention.py :13).

    Eval-mode (dropout = identity); flag defaults match the reference build:
    pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=True,
    pos_enc_at_cross_attn_queries=False.
    """

    def __init__(self, d_model=256, dim_feedforward=2048, mem_dim=64, feat_hw=(64, 64)):
        self.self_attn = RoPEAttention(d_model, 1, feat_hw=feat_hw)
        self.cross_attn_image = RoPEAttention(d_model, 1, kv_in_dim=mem_dim, rope_k_repeat=True, feat_hw=feat_hw)
        self.linear1 = Linear(d_model, dim_feedforward)
        self.linear2 = Linear(dim_feedforward, d_model)

    def init(self, rng):
        def ln(d):
            return {"weight": np.ones((d,), np.float32), "bias": np.zeros((d,), np.float32)}

        d = self.linear1.c_in
        return {
            "self_attn": self.self_attn.init(rng),
            "cross_attn_image": self.cross_attn_image.init(rng),
            "linear1": self.linear1.init(rng),
            "linear2": self.linear2.init(rng),
            "norm1": ln(d),
            "norm2": ln(d),
            "norm3": ln(d),
        }

    def __call__(self, p, tgt, memory, pos, query_pos, num_k_exclude_rope=0, key_mask=None):
        t2 = _layernorm(p["norm1"], tgt, eps=1e-5)
        tgt = tgt + self.self_attn(p["self_attn"], t2, t2, t2)
        t2 = _layernorm(p["norm2"], tgt, eps=1e-5)
        tgt = tgt + self.cross_attn_image(
            p["cross_attn_image"], t2, memory + pos, memory,
            num_k_exclude_rope=num_k_exclude_rope, key_mask=key_mask,
        )
        t2 = _layernorm(p["norm3"], tgt, eps=1e-5)
        tgt = tgt + _linear(p["linear2"], jnp.maximum(_linear(p["linear1"], t2), 0.0))
        return tgt


class MemoryAttention:
    """Stack of MemoryAttentionLayers + final norm (ref: memory_attention.py :170).

    pos_enc_at_input=True per the reference build: curr + 0.1 * curr_pos.
    """

    def __init__(self, d_model=256, num_layers=4, dim_feedforward=2048, mem_dim=64, feat_hw=(64, 64)):
        self.layers = [MemoryAttentionLayer(d_model, dim_feedforward, mem_dim, feat_hw) for _ in range(num_layers)]
        self.d_model = d_model

    def init(self, rng):
        return {
            "layers": {str(i): l.init(rng) for i, l in enumerate(self.layers)},
            "norm": {"weight": np.ones((self.d_model,), np.float32), "bias": np.zeros((self.d_model,), np.float32)},
        }

    def __call__(self, p, curr, memory, curr_pos, memory_pos, num_obj_ptr_tokens=0, key_mask=None):
        """curr (B, L, C); memory (B, S, mem_dim); key_mask (B, S) True=attend."""
        out = curr + 0.1 * curr_pos
        for i, layer in enumerate(self.layers):
            out = layer(p["layers"][str(i)], out, memory, memory_pos, curr_pos,
                        num_k_exclude_rope=num_obj_ptr_tokens, key_mask=key_mask)
        return _layernorm(p["norm"], out, eps=1e-5)


# --------------------------------------------------------------------------- #
# memory encoder
# --------------------------------------------------------------------------- #
def _conv2d(p, x, stride=1, padding="VALID", groups=1):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["weight"].astype(jnp.float32), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups,
    )
    return y + p["bias"] if "bias" in p else y


class MaskDownSampler:
    """Stride-16 mask embedder: 4× (conv s2 + LayerNorm2d + GELU) + 1x1
    (ref: blocks.py MaskDownSampler:54). Sequential indices mirror torch."""

    def __init__(self, embed_dim=256, kernel_size=3, stride=2, padding=1, total_stride=16):
        self.ks, self.stride, self.pad = kernel_size, stride, padding
        self.num_layers = int(math.log2(total_stride) // math.log2(stride))
        self.chans = [1]
        for _ in range(self.num_layers):
            self.chans.append(self.chans[-1] * stride**2)
        self.embed_dim = embed_dim

    def init(self, rng):
        p = {"encoder": {}}
        for i in range(self.num_layers):
            cin, cout = self.chans[i], self.chans[i + 1]
            bound = math.sqrt(1.0 / (cin * self.ks * self.ks))
            p["encoder"][str(3 * i)] = {
                "weight": rng.uniform(-bound, bound, (self.ks, self.ks, cin, cout)).astype(np.float32),
                "bias": rng.uniform(-bound, bound, (cout,)).astype(np.float32),
            }
            p["encoder"][str(3 * i + 1)] = {"weight": np.ones((cout,), np.float32), "bias": np.zeros((cout,), np.float32)}
        bound = math.sqrt(1.0 / self.chans[-1])
        p["encoder"][str(3 * self.num_layers)] = {
            "weight": rng.uniform(-bound, bound, (1, 1, self.chans[-1], self.embed_dim)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (self.embed_dim,)).astype(np.float32),
        }
        return p

    def __call__(self, p, x):
        for i in range(self.num_layers):
            x = _conv2d(p["encoder"][str(3 * i)], x, stride=self.stride, padding=[(self.pad, self.pad)] * 2)
            x = _layernorm(p["encoder"][str(3 * i + 1)], x, eps=1e-6)
            x = jax.nn.gelu(x, approximate=False)
        return _conv2d(p["encoder"][str(3 * self.num_layers)], x)


class CXBlock:
    """ConvNeXt block, NHWC (ref: blocks.py CXBlock:114)."""

    def __init__(self, dim=256, kernel_size=7, padding=3):
        self.dim, self.ks, self.pad = dim, kernel_size, padding
        self.pwconv1 = Linear(dim, 4 * dim)
        self.pwconv2 = Linear(4 * dim, dim)

    def init(self, rng):
        bound = math.sqrt(1.0 / (self.ks * self.ks))  # depthwise: fan_in = 1*k*k
        return {
            "dwconv": {
                "weight": rng.uniform(-bound, bound, (self.ks, self.ks, 1, self.dim)).astype(np.float32),
                "bias": rng.uniform(-bound, bound, (self.dim,)).astype(np.float32),
            },
            "norm": {"weight": np.ones((self.dim,), np.float32), "bias": np.zeros((self.dim,), np.float32)},
            "pwconv1": self.pwconv1.init(rng),
            "pwconv2": self.pwconv2.init(rng),
            "gamma": 1e-6 * np.ones((self.dim,), np.float32),
        }

    def __call__(self, p, x):
        inp = x
        x = _conv2d(p["dwconv"], x, padding=[(self.pad, self.pad)] * 2, groups=self.dim)
        x = _layernorm(p["norm"], x, eps=1e-6)
        x = _linear(p["pwconv2"], jax.nn.gelu(_linear(p["pwconv1"], x), approximate=False))
        return inp + p["gamma"] * x


class MemoryEncoder:
    """pix features + predicted mask → (mem features, spatial pos enc)
    (ref: encoders.py MemoryEncoder:356). Output NHWC, mem_dim channels."""

    def __init__(self, out_dim=64, in_dim=256):
        self.out_dim, self.in_dim = out_dim, in_dim
        self.mask_downsampler = MaskDownSampler(embed_dim=in_dim, kernel_size=3, stride=2, padding=1)
        self.fuser_layers = [CXBlock(dim=in_dim) for _ in range(2)]

    def init(self, rng):
        bound = math.sqrt(1.0 / self.in_dim)
        p = {
            "mask_downsampler": self.mask_downsampler.init(rng),
            "pix_feat_proj": {
                "weight": rng.uniform(-bound, bound, (1, 1, self.in_dim, self.in_dim)).astype(np.float32),
                "bias": rng.uniform(-bound, bound, (self.in_dim,)).astype(np.float32),
            },
            "fuser": {"layers": {str(i): l.init(rng) for i, l in enumerate(self.fuser_layers)}},
        }
        if self.out_dim != self.in_dim:
            p["out_proj"] = {
                "weight": rng.uniform(-bound, bound, (1, 1, self.in_dim, self.out_dim)).astype(np.float32),
                "bias": rng.uniform(-bound, bound, (self.out_dim,)).astype(np.float32),
            }
        return p

    def __call__(self, p, pix_feat, masks, skip_mask_sigmoid=False):
        """pix_feat (B, H, W, in_dim); masks (B, 16H, 16W, 1) logits or probs."""
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        m = self.mask_downsampler(p["mask_downsampler"], masks)
        x = _conv2d(p["pix_feat_proj"], pix_feat) + m
        for i, l in enumerate(self.fuser_layers):
            x = l(p["fuser"]["layers"][str(i)], x)
        if "out_proj" in p:
            x = _conv2d(p["out_proj"], x)
        pos = jnp.asarray(sine_pos_embed_2d(x.shape[1], x.shape[2], self.out_dim))
        return x, pos
