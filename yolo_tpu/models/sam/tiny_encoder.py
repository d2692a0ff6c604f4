"""TinyViT image encoder for MobileSAM, functional JAX (ref:
ultralytics/models/sam/modules/tiny_encoder.py — Conv2d_BN:24, PatchEmbed:76,
MBConv:127, PatchMerging:197, ConvLayer:261, MLP:347, Attention:408,
TinyViTBlock:523, BasicLayer:667, TinyViT:770).

Inference path (BN uses running stats — MobileSAM ships as a frozen encoder);
param names mirror torch so the released mobile_sam.pt imports mechanically.
"""

from __future__ import annotations

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


def _conv2d_bn_init(rng, a, b, ks=1, groups=1):
    fan_in = a // groups * ks * ks
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return {
        "c": {"weight": rng.uniform(-bound, bound, (ks, ks, a // groups, b)).astype(np.float32)},
        "bn": {
            "weight": np.ones((b,), np.float32),
            "bias": np.zeros((b,), np.float32),
            "running_mean": np.zeros((b,), np.float32),
            "running_var": np.ones((b,), np.float32),
        },
    }


def _conv2d_bn(p, x, stride=1, pad=0, groups=1):
    w = p["c"]["weight"].astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups,
    )
    bn = p["bn"]
    return (y - bn["running_mean"]) * (bn["weight"] * jax.lax.rsqrt(bn["running_var"] + BN_EPS)) + bn["bias"]


def _ln(p, x, eps=1e-5):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _lin(p, x):
    return x.astype(jnp.float32) @ p["weight"].astype(jnp.float32).T + p["bias"].astype(jnp.float32)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class TinyAttention:
    """Windowed MHSA with trainable per-offset attention biases (ref: Attention:408)."""

    def __init__(self, dim, key_dim, num_heads=8, attn_ratio=1.0, resolution=(7, 7)):
        self.nh, self.key_dim = num_heads, key_dim
        self.scale = key_dim**-0.5
        self.d = int(attn_ratio * key_dim)
        self.dh = self.d * num_heads
        h = self.dh + key_dim * num_heads * 2
        self.dim, self.h = dim, h
        pts = list(itertools.product(range(resolution[0]), range(resolution[1])))
        offsets = {}
        idxs = []
        for p1 in pts:
            for p2 in pts:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                offsets.setdefault(off, len(offsets))
                idxs.append(offsets[off])
        self.n_offsets = len(offsets)
        self.bias_idxs = np.array(idxs, np.int64).reshape(len(pts), len(pts))

    def init(self, rng):
        bound = math.sqrt(1.0 / self.dim)
        return {
            "norm": {"weight": np.ones((self.dim,), np.float32), "bias": np.zeros((self.dim,), np.float32)},
            "qkv": {
                "weight": rng.uniform(-bound, bound, (self.h, self.dim)).astype(np.float32),
                "bias": np.zeros((self.h,), np.float32),
            },
            "proj": {
                "weight": rng.uniform(-bound, bound, (self.dim, self.dh)).astype(np.float32),
                "bias": np.zeros((self.dim,), np.float32),
            },
            "attention_biases": np.zeros((self.nh, self.n_offsets), np.float32),
        }

    def __call__(self, p, x):
        B, N, _ = x.shape
        x = _ln(p["norm"], x)
        qkv = _lin(p["qkv"], x).reshape(B, N, self.nh, -1)
        q, k, v = jnp.split(qkv, [self.key_dim, 2 * self.key_dim], axis=3)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        bias = p["attention_biases"][:, self.bias_idxs]  # (nh, N, N)
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) * self.scale + bias[None], -1)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, self.dh)
        return _lin(p["proj"], y)


class TinyViTBlock:
    """Window attention + local depthwise conv + MLP (ref: TinyViTBlock:523)."""

    def __init__(self, dim, input_resolution, num_heads, window_size=7, mlp_ratio=4.0, local_conv_size=3):
        self.dim = dim
        self.input_resolution = input_resolution
        self.window_size = window_size
        self.local_conv_size = local_conv_size
        self.attn = TinyAttention(dim, dim // num_heads, num_heads, 1.0, (window_size, window_size))
        self.mlp_hidden = int(dim * mlp_ratio)

    def init(self, rng):
        bound = math.sqrt(1.0 / self.dim)
        bound_h = math.sqrt(1.0 / self.mlp_hidden)
        return {
            "attn": self.attn.init(rng),
            "local_conv": _conv2d_bn_init(rng, self.dim, self.dim, self.local_conv_size, groups=self.dim),
            "mlp": {
                "norm": {"weight": np.ones((self.dim,), np.float32), "bias": np.zeros((self.dim,), np.float32)},
                "fc1": {
                    "weight": rng.uniform(-bound, bound, (self.mlp_hidden, self.dim)).astype(np.float32),
                    "bias": np.zeros((self.mlp_hidden,), np.float32),
                },
                "fc2": {
                    "weight": rng.uniform(-bound_h, bound_h, (self.dim, self.mlp_hidden)).astype(np.float32),
                    "bias": np.zeros((self.dim,), np.float32),
                },
            },
        }

    def __call__(self, p, x):
        h, w = self.input_resolution
        b, hw, c = x.shape
        res_x = x
        ws = self.window_size
        if h == ws and w == ws:
            x = self.attn(p["attn"], x)
        else:
            x = x.reshape(b, h, w, c)
            pad_b = (ws - h % ws) % ws
            pad_r = (ws - w % ws) % ws
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            pH, pW = h + pad_b, w + pad_r
            nH, nW = pH // ws, pW // ws
            x = x.reshape(b, nH, ws, nW, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b * nH * nW, ws * ws, c)
            x = self.attn(p["attn"], x)
            x = x.reshape(b, nH, nW, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, pH, pW, c)
            if pad_b or pad_r:
                x = x[:, :h, :w]
            x = x.reshape(b, hw, c)
        x = res_x + x
        # local depthwise conv on the spatial map
        xs = x.reshape(b, h, w, c)
        xs = _conv2d_bn(p["local_conv"], xs, 1, self.local_conv_size // 2, groups=self.dim)
        x = xs.reshape(b, hw, c)
        m = p["mlp"]
        y = _lin(m["fc2"], _gelu(_lin(m["fc1"], _ln(m["norm"], x))))
        return x + y


class _PatchMerging:
    """conv1 1x1 → act → dw conv3 (stride 1|2) → act → conv3 1x1; flatten (ref :197)."""

    def __init__(self, input_resolution, dim, out_dim):
        self.input_resolution = input_resolution
        self.dim, self.out_dim = dim, out_dim
        self.stride = 1 if out_dim in {320, 448, 576} else 2

    def init(self, rng):
        return {
            "conv1": _conv2d_bn_init(rng, self.dim, self.out_dim, 1),
            "conv2": _conv2d_bn_init(rng, self.out_dim, self.out_dim, 3, groups=self.out_dim),
            "conv3": _conv2d_bn_init(rng, self.out_dim, self.out_dim, 1),
        }

    def __call__(self, p, x):
        if x.ndim == 3:
            h, w = self.input_resolution
            b = x.shape[0]
            x = x.reshape(b, h, w, -1)
        x = _conv2d_bn(p["conv1"], x)
        x = _gelu(x)
        x = _conv2d_bn(p["conv2"], x, self.stride, 1, groups=self.out_dim)
        x = _gelu(x)
        x = _conv2d_bn(p["conv3"], x)
        return x.reshape(x.shape[0], -1, x.shape[-1])


class TinyViT:
    """MobileSAM image encoder → (B, h/16, w/16, 256) NHWC (ref: TinyViT:770)."""

    def __init__(self, img_size=1024, in_chans=3, embed_dims=(64, 128, 160, 320), depths=(2, 2, 6, 2),
                 num_heads=(2, 4, 5, 10), window_sizes=(7, 7, 14, 7), mlp_ratio=4.0,
                 mbconv_expand_ratio=4.0, local_conv_size=3):
        self.img_size = img_size
        self.in_chans = in_chans
        self.embed_dims = list(embed_dims)
        self.depths = list(depths)
        pr = img_size // 4
        self.patches_resolution = (pr, pr)
        self.num_layers = len(depths)
        self.mbconv_expand = mbconv_expand_ratio
        # stage blocks
        self.stages = []
        for i in range(self.num_layers):
            res = (pr // (2 ** (i - 1 if i == 3 else i)), pr // (2 ** (i - 1 if i == 3 else i)))
            if i == 0:
                blocks = [("mbconv", embed_dims[0]) for _ in range(depths[0])]
            else:
                blocks = [
                    TinyViTBlock(embed_dims[i], res, num_heads[i], window_sizes[i], mlp_ratio, local_conv_size)
                    for _ in range(depths[i])
                ]
            down = (
                _PatchMerging(res, embed_dims[i], embed_dims[min(i + 1, self.num_layers - 1)])
                if i < self.num_layers - 1
                else None
            )
            self.stages.append((blocks, down))
        self.out_chans = 256

    def init(self, rng):
        ed = self.embed_dims
        p = {
            "patch_embed": {
                "seq": {
                    "0": _conv2d_bn_init(rng, self.in_chans, ed[0] // 2, 3),
                    "2": _conv2d_bn_init(rng, ed[0] // 2, ed[0], 3),
                }
            },
            "layers": {},
            "neck": {
                "0": {"weight": rng.uniform(-0.05, 0.05, (1, 1, ed[-1], 256)).astype(np.float32)},
                "1": {"weight": np.ones((256,), np.float32), "bias": np.zeros((256,), np.float32)},
                "2": {"weight": rng.uniform(-0.05, 0.05, (3, 3, 256, 256)).astype(np.float32)},
                "3": {"weight": np.ones((256,), np.float32), "bias": np.zeros((256,), np.float32)},
            },
        }
        for i, (blocks, down) in enumerate(self.stages):
            lp = {"blocks": {}}
            for j, blk in enumerate(blocks):
                if blk[0] == "mbconv" if isinstance(blk, tuple) else False:
                    d = self.embed_dims[0]
                    hidden = int(d * self.mbconv_expand)
                    lp["blocks"][str(j)] = {
                        "conv1": _conv2d_bn_init(rng, d, hidden, 1),
                        "conv2": _conv2d_bn_init(rng, hidden, hidden, 3, groups=hidden),
                        "conv3": _conv2d_bn_init(rng, hidden, d, 1),
                    }
                else:
                    lp["blocks"][str(j)] = blk.init(rng)
            if down is not None:
                lp["downsample"] = down.init(rng)
            p["layers"][str(i)] = lp
        return p

    def __call__(self, p, x):
        """x: (B, H, W, 3) normalized → (B, H/16, W/16, 256)."""
        pe = p["patch_embed"]["seq"]
        x = _gelu(_conv2d_bn(pe["0"], x, 2, 1))
        x = _conv2d_bn(pe["2"], x, 2, 1)  # (B, H/4, W/4, ed0) spatial map
        for i, (blocks, down) in enumerate(self.stages):
            lp = p["layers"][str(i)]
            if i == 0:  # MBConv stage on the spatial map
                hidden = int(self.embed_dims[0] * self.mbconv_expand)
                for j in range(len(blocks)):
                    bp = lp["blocks"][str(j)]
                    sc = x
                    y = _gelu(_conv2d_bn(bp["conv1"], x))
                    y = _gelu(_conv2d_bn(bp["conv2"], y, 1, 1, groups=hidden))
                    y = _conv2d_bn(bp["conv3"], y)
                    x = _gelu(y + sc)
                if down is not None:
                    x = down(lp["downsample"], x)  # → (B, N, C)
            else:
                for j, blk in enumerate(blocks):
                    x = blk(lp["blocks"][str(j)], x)
                if down is not None:
                    x = down(lp["downsample"], x)
        B, N, C = x.shape
        side = int(math.isqrt(N))
        x = x.reshape(B, side, side, C)
        x = jax.lax.conv_general_dilated(x.astype(jnp.float32), p["neck"]["0"]["weight"].astype(jnp.float32),
                                         (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = _ln(p["neck"]["1"], x, eps=1e-6)
        x = jax.lax.conv_general_dilated(x, p["neck"]["2"]["weight"].astype(jnp.float32), (1, 1),
                                         [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _ln(p["neck"]["3"], x, eps=1e-6)
