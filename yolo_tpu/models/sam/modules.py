"""SAM building blocks, functional JAX.

Re-implements the reference SAM1 stack (ref: ultralytics/models/sam/modules/ —
blocks.py Block:880, REAttention:980, PatchEmbed:1075, PositionEmbeddingRandom:813,
MLPBlock (nn/modules/transformer.py:332); encoders.py ImageEncoderViT:23,
PromptEncoder:158; decoders.py MaskDecoder:17; transformer.py TwoWayTransformer:13,
TwoWayAttentionBlock:129, Attention:247; utils.py window_partition:222,
add_decomposed_rel_pos:333) in the functional module style: `init(np_rng)` +
`__call__(params, ...)`, param-tree keys mirroring torch names so released SAM
checkpoints import mechanically.

TPU notes: everything is static-shape (img_size fixes all window/global
attention shapes at build time), so one jit covers set_image; attention and the
decomposed relative positions are dense einsums on the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.nn.transformer import LayerNorm, Linear, MLP

LN_EPS = 1e-6  # SAM ViT uses LayerNorm(eps=1e-6)


def _linear(p, x):
    y = x.astype(jnp.float32) @ p["weight"].astype(jnp.float32).T
    return y + p["bias"].astype(jnp.float32) if "bias" in p else y


def _layernorm(p, x, eps=LN_EPS):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def window_partition(x, window_size):
    """(B, H, W, C) → (B·nW, ws, ws, C) with zero pad (ref: utils.py :222)."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C), (Hp, Wp)


def window_unpartition(windows, window_size, pad_hw, hw):
    """Inverse of window_partition (ref: utils.py :253)."""
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def get_rel_pos(q_size, k_size, rel_pos):
    """Slice/interp relative position table to (q, k, C) (ref: utils.py :291)."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int64)]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    """MViTv2 decomposed relative positions (ref: utils.py :333)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(B, q_h, q_w, k_h, k_w) + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(B, q_h * q_w, k_h * k_w)


class MLPBlock:
    """lin1 → act → lin2 (ref: nn/modules/transformer.py MLPBlock:332).

    The ViT encoder blocks use GELU; SAM's TwoWayTransformer blocks default to
    ReLU (ref: sam/modules/transformer.py :34)."""

    def __init__(self, dim, mlp_dim, act="gelu"):
        self.lin1 = Linear(dim, mlp_dim)
        self.lin2 = Linear(mlp_dim, dim)
        self.act = act

    def init(self, rng):
        return {"lin1": self.lin1.init(rng), "lin2": self.lin2.init(rng)}

    def __call__(self, p, x):
        h = _linear(p["lin1"], x)
        h = jnp.maximum(h, 0.0) if self.act == "relu" else jax.nn.gelu(h, approximate=False)
        return _linear(p["lin2"], h)


class REAttention:
    """MHSA with decomposed relative positions (ref: blocks.py REAttention:980)."""

    def __init__(self, dim, num_heads=8, qkv_bias=True, use_rel_pos=False, input_size=None):
        self.dim, self.nh = dim, num_heads
        self.hd = dim // num_heads
        self.scale = self.hd**-0.5
        self.use_rel_pos = use_rel_pos
        self.input_size = input_size
        self.qkv = Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = Linear(dim, dim)

    def init(self, rng):
        p = {"qkv": self.qkv.init(rng), "proj": self.proj.init(rng)}
        if self.use_rel_pos:
            p["rel_pos_h"] = np.zeros((2 * self.input_size[0] - 1, self.hd), np.float32)
            p["rel_pos_w"] = np.zeros((2 * self.input_size[1] - 1, self.hd), np.float32)
        return p

    def __call__(self, p, x):
        B, H, W, _ = x.shape
        qkv = _linear(p["qkv"], x).reshape(B, H * W, 3, self.nh, self.hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, B * self.nh, H * W, self.hd)
        attn = (q * self.scale) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            attn = add_decomposed_rel_pos(attn, q, p["rel_pos_h"], p["rel_pos_w"], (H, W), (H, W))
        attn = jax.nn.softmax(attn, -1)
        y = (attn @ v).reshape(B, self.nh, H, W, self.hd).transpose(0, 2, 3, 1, 4).reshape(B, H, W, -1)
        return _linear(p["proj"], y)


class ViTBlock:
    """Pre-norm transformer block with optional window attention (ref: blocks.py Block:880)."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=True, use_rel_pos=False, window_size=0, input_size=None):
        self.window_size = window_size
        self.norm1 = LayerNorm(dim)
        self.attn = REAttention(
            dim, num_heads, qkv_bias, use_rel_pos,
            input_size=input_size if window_size == 0 else (window_size, window_size),
        )
        self.norm2 = LayerNorm(dim)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))

    def init(self, rng):
        return {
            "norm1": self.norm1.init(rng),
            "attn": self.attn.init(rng),
            "norm2": self.norm2.init(rng),
            "mlp": self.mlp.init(rng),
        }

    def __call__(self, p, x):
        shortcut = x
        x = _layernorm(p["norm1"], x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = self.attn(p["attn"], x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + self.mlp(p["mlp"], _layernorm(p["norm2"], x))


class ImageEncoderViT:
    """SAM ViT image encoder → (B, 256, H/16, W/16) embeddings
    (ref: encoders.py ImageEncoderViT:23). Output kept NHWC here."""

    def __init__(self, img_size=1024, patch_size=16, in_chans=3, embed_dim=768, depth=12, num_heads=12,
                 mlp_ratio=4.0, out_chans=256, qkv_bias=True, use_rel_pos=True, window_size=14,
                 global_attn_indexes=()):
        self.img_size, self.patch_size = img_size, patch_size
        self.in_chans, self.embed_dim, self.out_chans = in_chans, embed_dim, out_chans
        grid = img_size // patch_size
        self.grid = grid
        self.blocks = [
            ViTBlock(embed_dim, num_heads, mlp_ratio, qkv_bias, use_rel_pos,
                     window_size=window_size if i not in global_attn_indexes else 0,
                     input_size=(grid, grid))
            for i in range(depth)
        ]

    def init(self, rng):
        k = self.patch_size
        fan_in = self.in_chans * k * k
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        p = {
            "patch_embed": {
                "proj": {
                    "weight": rng.uniform(-bound, bound, (k, k, self.in_chans, self.embed_dim)).astype(np.float32),
                    "bias": np.zeros((self.embed_dim,), np.float32),
                }
            },
            "pos_embed": np.zeros((1, self.grid, self.grid, self.embed_dim), np.float32),
            "blocks": {str(i): b.init(rng) for i, b in enumerate(self.blocks)},
            "neck": {
                "0": {"weight": rng.uniform(-0.05, 0.05, (1, 1, self.embed_dim, self.out_chans)).astype(np.float32)},
                "1": {"weight": np.ones((self.out_chans,), np.float32), "bias": np.zeros((self.out_chans,), np.float32)},
                "2": {"weight": rng.uniform(-0.05, 0.05, (3, 3, self.out_chans, self.out_chans)).astype(np.float32)},
                "3": {"weight": np.ones((self.out_chans,), np.float32), "bias": np.zeros((self.out_chans,), np.float32)},
            },
        }
        return p

    def __call__(self, p, x):
        """x: (B, H, W, 3) normalized. Returns (B, grid, grid, out_chans)."""
        k = self.patch_size
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), p["patch_embed"]["proj"]["weight"].astype(jnp.float32),
            (k, k), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["patch_embed"]["proj"]["bias"]
        pe = p["pos_embed"]
        if x.shape[1] != pe.shape[1]:  # interpolate pretrain PE to this grid (ref :145)
            pe = jax.image.resize(pe, (1, x.shape[1], x.shape[2], pe.shape[-1]), method="bilinear")
        x = x + pe
        for i, blk in enumerate(self.blocks):
            x = blk(p["blocks"][str(i)], x)
        # neck: conv1x1(no bias) → LayerNorm2d → conv3x3(no bias) → LayerNorm2d
        x = jax.lax.conv_general_dilated(x, p["neck"]["0"]["weight"].astype(jnp.float32), (1, 1), "VALID",
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = _layernorm(p["neck"]["1"], x)
        x = jax.lax.conv_general_dilated(x, p["neck"]["2"]["weight"].astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _layernorm(p["neck"]["3"], x)


class PositionEmbeddingRandom:
    """Random-Fourier positional encoding (ref: blocks.py :813)."""

    def __init__(self, num_pos_feats=64):
        self.npf = num_pos_feats

    def init(self, rng):
        return {"positional_encoding_gaussian_matrix": rng.normal(0, 1, (2, self.npf)).astype(np.float32)}

    def encode(self, p, coords):
        """coords in [0,1] (..., 2) → (..., 2·npf)."""
        g = p["positional_encoding_gaussian_matrix"].astype(jnp.float32)
        c = (2 * coords.astype(jnp.float32) - 1) @ g * (2 * np.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)

    def grid(self, p, size):
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # (h, w, 2) x-first
        return self.encode(p, coords)  # (h, w, C)


class PromptEncoder:
    """Sparse (points/boxes) + dense (mask) prompt embeddings (ref: encoders.py :158)."""

    def __init__(self, embed_dim=256, image_embedding_size=(64, 64), input_image_size=(1024, 1024), mask_in_chans=16):
        self.embed_dim = embed_dim
        self.image_embedding_size = image_embedding_size
        self.input_image_size = input_image_size
        self.mask_in_chans = mask_in_chans
        self.pe_layer = PositionEmbeddingRandom(embed_dim // 2)

    def init(self, rng):
        def emb():
            return {"weight": rng.normal(0, 1, (1, self.embed_dim)).astype(np.float32)}

        c4 = self.mask_in_chans // 4

        def conv(k, ci, co):
            bound = math.sqrt(1.0 / (ci * k * k))
            return {
                "weight": rng.uniform(-bound, bound, (k, k, ci, co)).astype(np.float32),
                "bias": rng.uniform(-bound, bound, (co,)).astype(np.float32),
            }

        return {
            "pe_layer": self.pe_layer.init(rng),
            "point_embeddings": {str(i): emb() for i in range(4)},
            "not_a_point_embed": emb(),
            "no_mask_embed": emb(),
            "mask_downscaling": {
                "0": conv(2, 1, c4),
                "1": {"weight": np.ones((c4,), np.float32), "bias": np.zeros((c4,), np.float32)},
                "3": conv(2, c4, self.mask_in_chans),
                "4": {"weight": np.ones((self.mask_in_chans,), np.float32), "bias": np.zeros((self.mask_in_chans,), np.float32)},
                "6": conv(1, self.mask_in_chans, self.embed_dim),
            },
        }

    def get_dense_pe(self, p):
        return self.pe_layer.grid(p["pe_layer"], self.image_embedding_size)[None]  # (1, h, w, C)

    def embed_points(self, p, points, labels, pad: bool):
        """points (B, N, 2) px; labels (B, N) in {-1,0,1,2,3}."""
        points = points.astype(jnp.float32) + 0.5
        if pad:
            B = points.shape[0]
            points = jnp.concatenate([points, jnp.zeros((B, 1, 2), jnp.float32)], 1)
            labels = jnp.concatenate([labels, -jnp.ones((B, 1), labels.dtype)], 1)
        coords = points / jnp.array([self.input_image_size[1], self.input_image_size[0]], jnp.float32)
        pe = self.pe_layer.encode(p["pe_layer"], coords)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, p["not_a_point_embed"]["weight"][0], pe)
        for i in range(4):
            pe = jnp.where(lab == i, pe + p["point_embeddings"][str(i)]["weight"][0], pe)
        return pe

    def embed_boxes(self, p, boxes):
        """boxes (B, 4) px xyxy → (B, 2, C) corner embeddings."""
        b = boxes.astype(jnp.float32).reshape(-1, 2, 2) + 0.5
        coords = b / jnp.array([self.input_image_size[1], self.input_image_size[0]], jnp.float32)
        pe = self.pe_layer.encode(p["pe_layer"], coords)
        pe = pe.at[:, 0].add(p["point_embeddings"]["2"]["weight"][0])
        pe = pe.at[:, 1].add(p["point_embeddings"]["3"]["weight"][0])
        return pe

    def embed_masks(self, p, masks):
        """masks (B, H, W, 1) → dense (B, h, w, C)."""
        md = p["mask_downscaling"]

        def conv(pp, x, stride):
            return jax.lax.conv_general_dilated(
                x.astype(jnp.float32), pp["weight"].astype(jnp.float32), (stride, stride), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pp["bias"]

        x = conv(md["0"], masks, 2)
        x = jax.nn.gelu(_layernorm(md["1"], x), approximate=False)
        x = conv(md["3"], x, 2)
        x = jax.nn.gelu(_layernorm(md["4"], x), approximate=False)
        return conv(md["6"], x, 1)

    def __call__(self, p, points=None, boxes=None, masks=None):
        """Returns (sparse (B, n, C), dense (B, h, w, C))."""
        if points is not None:
            B = points[0].shape[0]
        elif boxes is not None:
            B = boxes.shape[0]
        elif masks is not None:
            B = masks.shape[0]
        else:
            B = 1
        sparse = jnp.zeros((B, 0, self.embed_dim), jnp.float32)
        if points is not None:
            sparse = jnp.concatenate([sparse, self.embed_points(p, points[0], points[1], pad=boxes is None)], 1)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self.embed_boxes(p, boxes)], 1)
        h, w = self.image_embedding_size
        if masks is not None:
            dense = self.embed_masks(p, masks)
        else:
            dense = jnp.broadcast_to(p["no_mask_embed"]["weight"][0].reshape(1, 1, 1, -1), (B, h, w, self.embed_dim))
        return sparse, dense


class SAMAttention:
    """Downsampling attention (ref: sam/modules/transformer.py Attention:247)."""

    def __init__(self, embedding_dim, num_heads, downsample_rate=1, kv_in_dim=None):
        self.nh = num_heads
        kv_in = kv_in_dim if kv_in_dim is not None else embedding_dim
        self.internal = embedding_dim // downsample_rate
        self.q_proj = Linear(embedding_dim, self.internal)
        self.k_proj = Linear(kv_in, self.internal)
        self.v_proj = Linear(kv_in, self.internal)
        self.out_proj = Linear(self.internal, embedding_dim)

    def init(self, rng):
        return {k: getattr(self, k).init(rng) for k in ("q_proj", "k_proj", "v_proj", "out_proj")}

    def __call__(self, p, q, k, v):
        q = _linear(p["q_proj"], q)
        k = _linear(p["k_proj"], k)
        v = _linear(p["v_proj"], v)
        B, Nq, C = q.shape
        hd = C // self.nh
        q = q.reshape(B, Nq, self.nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, self.nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, self.nh, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), -1)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return _linear(p["out_proj"], y)


class TwoWayAttentionBlock:
    """Sparse↔dense two-way attention (ref: transformer.py :129)."""

    def __init__(self, embedding_dim, num_heads, mlp_dim=2048, attention_downsample_rate=2, skip_first_layer_pe=False,
                 sam2: bool = False):
        self.skip_first_layer_pe = skip_first_layer_pe
        self.self_attn = SAMAttention(embedding_dim, num_heads)
        self.norm1 = LayerNorm(embedding_dim)
        self.cross_attn_token_to_image = SAMAttention(embedding_dim, num_heads, attention_downsample_rate)
        self.norm2 = LayerNorm(embedding_dim)
        # SAM2's block uses blocks.MLP ("mlp.layers.{i}" keys); SAM1 uses
        # MLPBlock ("mlp.lin1/lin2") — identical math, different param names
        # (ref: blocks.py SAM2TwoWayAttentionBlock:293)
        from yolo_tpu.nn.transformer import MLP as _SeqMLP

        self.mlp = _SeqMLP(embedding_dim, mlp_dim, embedding_dim, 2) if sam2 else MLPBlock(embedding_dim, mlp_dim, act="relu")
        self.norm3 = LayerNorm(embedding_dim)
        self.norm4 = LayerNorm(embedding_dim)
        self.cross_attn_image_to_token = SAMAttention(embedding_dim, num_heads, attention_downsample_rate)

    def init(self, rng):
        return {k: getattr(self, k).init(rng) for k in (
            "self_attn", "norm1", "cross_attn_token_to_image", "norm2", "mlp", "norm3", "norm4",
            "cross_attn_image_to_token")}

    def __call__(self, p, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(p["self_attn"], queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(p["self_attn"], q, q, queries)
        queries = _layernorm(p["norm1"], queries, eps=1e-5)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + self.cross_attn_token_to_image(p["cross_attn_token_to_image"], q, k, keys)
        queries = _layernorm(p["norm2"], queries, eps=1e-5)
        queries = queries + self.mlp(p["mlp"], queries)
        queries = _layernorm(p["norm3"], queries, eps=1e-5)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + self.cross_attn_image_to_token(p["cross_attn_image_to_token"], k, q, queries)
        keys = _layernorm(p["norm4"], keys, eps=1e-5)
        return queries, keys


class TwoWayTransformer:
    """Stack of two-way blocks + final token→image attention (ref: transformer.py :13)."""

    def __init__(self, depth, embedding_dim, num_heads, mlp_dim, attention_downsample_rate=2, sam2: bool = False):
        self.layers = [
            TwoWayAttentionBlock(embedding_dim, num_heads, mlp_dim, attention_downsample_rate,
                                 skip_first_layer_pe=i == 0, sam2=sam2)
            for i in range(depth)
        ]
        self.final_attn_token_to_image = SAMAttention(embedding_dim, num_heads, attention_downsample_rate)
        self.norm_final_attn = LayerNorm(embedding_dim)

    def init(self, rng):
        return {
            "layers": {str(i): l.init(rng) for i, l in enumerate(self.layers)},
            "final_attn_token_to_image": self.final_attn_token_to_image.init(rng),
            "norm_final_attn": self.norm_final_attn.init(rng),
        }

    def __call__(self, p, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, h, w, C) NHWC; point_embedding (B, N, C)."""
        B, h, w, C = image_embedding.shape
        keys = image_embedding.reshape(B, h * w, C)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, C) if image_pe.ndim == 4 else image_pe
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = point_embedding
        for i, layer in enumerate(self.layers):
            queries, keys = layer(p["layers"][str(i)], queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + self.final_attn_token_to_image(p["final_attn_token_to_image"], q, k, keys)
        queries = _layernorm(p["norm_final_attn"], queries, eps=1e-5)
        return queries, keys


class MaskDecoder:
    """Mask + IoU prediction from image/prompt embeddings (ref: decoders.py MaskDecoder:17)."""

    def __init__(self, transformer_dim=256, num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=256,
                 transformer=None):
        self.td = transformer_dim
        self.num_multimask_outputs = num_multimask_outputs
        self.num_mask_tokens = num_multimask_outputs + 1
        self.transformer = transformer or TwoWayTransformer(2, transformer_dim, 8, 2048)
        self.output_hypernetworks_mlps = [
            MLP(transformer_dim, transformer_dim, transformer_dim // 8, 3) for _ in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLP(transformer_dim, iou_head_hidden_dim, self.num_mask_tokens, iou_head_depth)

    def init(self, rng):
        td = self.td

        def deconv(ci, co):
            bound = math.sqrt(1.0 / (ci * 4))
            return {
                "weight": rng.uniform(-bound, bound, (2, 2, co, ci)).astype(np.float32),  # HWOI like ConvTranspose
                "bias": rng.uniform(-bound, bound, (co,)).astype(np.float32),
            }

        return {
            "iou_token": {"weight": rng.normal(0, 1, (1, td)).astype(np.float32)},
            "mask_tokens": {"weight": rng.normal(0, 1, (self.num_mask_tokens, td)).astype(np.float32)},
            "transformer": self.transformer.init(rng),
            "output_upscaling": {
                "0": deconv(td, td // 4),
                "1": {"weight": np.ones((td // 4,), np.float32), "bias": np.zeros((td // 4,), np.float32)},
                "3": deconv(td // 4, td // 8),
            },
            "output_hypernetworks_mlps": {str(i): m.init(rng) for i, m in enumerate(self.output_hypernetworks_mlps)},
            "iou_prediction_head": self.iou_prediction_head.init(rng),
        }

    def __call__(self, p, image_embeddings, image_pe, sparse_prompt_embeddings, dense_prompt_embeddings,
                 multimask_output: bool):
        masks, iou_pred = self.predict_masks(p, image_embeddings, image_pe, sparse_prompt_embeddings,
                                             dense_prompt_embeddings)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]

    def predict_masks(self, p, image_embeddings, image_pe, sparse, dense):
        """image_embeddings (1|B, h, w, C) NHWC; sparse (B, n, C); dense (B, h, w, C)."""
        out_tokens = jnp.concatenate([p["iou_token"]["weight"], p["mask_tokens"]["weight"]], 0)
        B = sparse.shape[0]
        tokens = jnp.concatenate([jnp.broadcast_to(out_tokens[None], (B, *out_tokens.shape)), sparse], 1)
        src = jnp.broadcast_to(image_embeddings, (B, *image_embeddings.shape[1:])) + dense
        hs, src2 = self.transformer(p["transformer"], src, image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens]
        h, w = src.shape[1], src.shape[2]
        x = src2.reshape(B, h, w, self.td)
        up = p["output_upscaling"]
        # torch ConvTranspose2d(k=2, s=2, p=0) → lax pad k-1-p = 1 with
        # transpose_kernel=True and the imported (kh, kw, co, ci) kernel
        x = jax.lax.conv_transpose(
            x.astype(jnp.float32), up["0"]["weight"].astype(jnp.float32), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        ) + up["0"]["bias"]
        x = jax.nn.gelu(_layernorm(up["1"], x), approximate=False)
        x = jax.lax.conv_transpose(
            x, up["3"]["weight"].astype(jnp.float32), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        ) + up["3"]["bias"]
        x = jax.nn.gelu(x, approximate=False)  # (B, 4h, 4w, td/8)
        hyper = jnp.stack(
            [m(p["output_hypernetworks_mlps"][str(i)], mask_tokens_out[:, i]) for i, m in enumerate(self.output_hypernetworks_mlps)],
            1,
        )  # (B, n_tokens, td/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, x)
        iou_pred = self.iou_prediction_head(p["iou_prediction_head"], iou_token_out)
        return masks, iou_pred


class SAMModel:
    """Image encoder + prompt encoder + mask decoder (ref: sam.py SAMModel:25)."""

    mask_threshold = 0.0

    def __init__(self, image_encoder, prompt_encoder, mask_decoder,
                 pixel_mean=(123.675, 116.28, 103.53), pixel_std=(58.395, 57.12, 57.375)):
        self.image_encoder = image_encoder
        self.prompt_encoder = prompt_encoder
        self.mask_decoder = mask_decoder
        self.pixel_mean = np.asarray(pixel_mean, np.float32)
        self.pixel_std = np.asarray(pixel_std, np.float32)

    def init(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        return {
            "image_encoder": self.image_encoder.init(rng),
            "prompt_encoder": self.prompt_encoder.init(rng),
            "mask_decoder": self.mask_decoder.init(rng),
        }

    def preprocess(self, x):
        """(B, H, W, 3) RGB uint8/float → normalized, zero-padded to img_size."""
        x = (x.astype(jnp.float32) - self.pixel_mean) / self.pixel_std
        s = self.image_encoder.img_size
        pad_h, pad_w = s - x.shape[1], s - x.shape[2]
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        return x

    def encode_image(self, p, x):
        return self.image_encoder(p["image_encoder"], self.preprocess(x))

    def predict_masks(self, p, image_embeddings, points=None, boxes=None, masks=None, multimask_output=True):
        sparse, dense = self.prompt_encoder(p["prompt_encoder"], points=points, boxes=boxes, masks=masks)
        image_pe = self.prompt_encoder.get_dense_pe(p["prompt_encoder"])
        return self.mask_decoder(p["mask_decoder"], image_embeddings, image_pe, sparse, dense, multimask_output)
