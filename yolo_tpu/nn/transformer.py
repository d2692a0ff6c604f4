"""RT-DETR transformer stack, functional JAX.

Re-implements the reference transformer modules (ref:
ultralytics/nn/modules/transformer.py — TransformerEncoderLayer:30, AIFI:174,
MLP:362, MSDeformAttn:458, DeformableTransformerDecoderLayer:584,
DeformableTransformerDecoder:718; nn/modules/head.py RTDETRDecoder:861;
nn/modules/utils.py multi_scale_deformable_attn_pytorch:107) in the same
functional module style as nn/modules.py: objects carrying `init(np_rng)` and
`__call__(params, ..., ctx, path)`, param-tree keys mirroring torch submodule
names so checkpoints import mechanically.

TPU design notes:
- attention/grid-sample run as dense batched einsums/gathers — everything is
  static-shape, so the whole decoder jits into one XLA program;
- dropout is inference-level (p=0 in all RT-DETR configs) and omitted;
- the deformable sampling (torch F.grid_sample bilinear/zeros/align=False)
  is an explicit 4-corner gather — XLA turns it into vectorized dynamic
  gathers; no scatter, no loops over points.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.nn.modules import Ctx

LN_EPS = 1e-5


class Linear:
    """nn.Linear; weight kept in torch (out, in) layout so checkpoints map 1:1."""

    def __init__(self, c_in: int, c_out: int, bias: bool = True):
        self.c_in, self.c_out, self.bias = c_in, c_out, bias

    def init(self, rng):
        bound = math.sqrt(1.0 / self.c_in)
        p = {"weight": rng.uniform(-bound, bound, (self.c_out, self.c_in)).astype(np.float32)}
        if self.bias:
            p["bias"] = rng.uniform(-bound, bound, (self.c_out,)).astype(np.float32)
        return p

    def __call__(self, p, x):
        y = x.astype(jnp.float32) @ p["weight"].astype(jnp.float32).T
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
        return y


class LayerNorm:
    """nn.LayerNorm over the last dim."""

    def __init__(self, c: int):
        self.c = c

    def init(self, rng):
        return {"weight": np.ones((self.c,), np.float32), "bias": np.zeros((self.c,), np.float32)}

    def __call__(self, p, x):
        x = x.astype(jnp.float32)
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * p["weight"] + p["bias"]


class MultiheadAttention:
    """nn.MultiheadAttention (batch_first) with torch param names
    (in_proj_weight/in_proj_bias/out_proj)."""

    def __init__(self, c: int, num_heads: int):
        self.c, self.h = c, num_heads
        self.hd = c // num_heads

    def init(self, rng):
        bound = math.sqrt(1.0 / self.c)
        return {
            "in_proj_weight": rng.uniform(-bound, bound, (3 * self.c, self.c)).astype(np.float32),
            "in_proj_bias": np.zeros((3 * self.c,), np.float32),
            "out_proj": {
                "weight": rng.uniform(-bound, bound, (self.c, self.c)).astype(np.float32),
                "bias": np.zeros((self.c,), np.float32),
            },
        }

    def __call__(self, p, q, k, v, attn_mask=None):
        """q/k/v: (B, N, C). attn_mask: (Nq, Nk) additive-or-bool like torch."""
        C, h, hd = self.c, self.h, self.hd
        w = p["in_proj_weight"].astype(jnp.float32)
        b = p["in_proj_bias"].astype(jnp.float32)
        qp = q.astype(jnp.float32) @ w[:C].T + b[:C]
        kp = k.astype(jnp.float32) @ w[C : 2 * C].T + b[C : 2 * C]
        vp = v.astype(jnp.float32) @ w[2 * C :].T + b[2 * C :]
        B, Nq, _ = qp.shape
        Nk = kp.shape[1]
        qp = qp.reshape(B, Nq, h, hd).transpose(0, 2, 1, 3)
        kp = kp.reshape(B, Nk, h, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(B, Nk, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) / math.sqrt(hd)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                attn = jnp.where(attn_mask[None, None], -jnp.inf, attn)
            else:
                attn = attn + attn_mask[None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, vp).transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return y @ p["out_proj"]["weight"].astype(jnp.float32).T + p["out_proj"]["bias"].astype(jnp.float32)


class MLP:
    """Stacked Linear + ReLU between layers (ref: transformer.py MLP:362)."""

    def __init__(self, c_in: int, hidden: int, c_out: int, num_layers: int, sigmoid: bool = False):
        h = [hidden] * (num_layers - 1)
        self.layers = [Linear(a, b) for a, b in zip([c_in] + h, h + [c_out])]
        self.sigmoid = sigmoid

    def init(self, rng):
        return {"layers": {str(i): l.init(rng) for i, l in enumerate(self.layers)}}

    def __call__(self, p, x):
        n = len(self.layers)
        for i, l in enumerate(self.layers):
            x = l(p["layers"][str(i)], x)
            if i < n - 1:
                x = jnp.maximum(x, 0.0)
        return jax.nn.sigmoid(x) if self.sigmoid else x


def _act(name, x):
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    return jnp.maximum(x, 0.0)  # relu


class AIFI:
    """Single transformer encoder layer over a 2D map with sincos positions
    (ref: transformer.py AIFI:174; post-norm variant)."""

    def __init__(self, c1: int, cm: int = 2048, num_heads: int = 8):
        self.c1, self.cm = c1, cm
        self.ma = MultiheadAttention(c1, num_heads)
        self.fc1 = Linear(c1, cm)
        self.fc2 = Linear(cm, c1)
        self.norm1 = LayerNorm(c1)
        self.norm2 = LayerNorm(c1)

    def init(self, rng):
        return {
            "ma": self.ma.init(rng),
            "fc1": self.fc1.init(rng),
            "fc2": self.fc2.init(rng),
            "norm1": self.norm1.init(rng),
            "norm2": self.norm2.init(rng),
        }

    @staticmethod
    def pos_embed_2d(w: int, h: int, dim: int, temperature: float = 10000.0):
        """2D sincos embedding, replicating the reference's w-major flatten
        (ref: AIFI.build_2d_sincos_position_embedding:221)."""
        grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32), indexing="ij")
        pos_dim = dim // 4
        omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
        out_w = grid_w.flatten()[:, None] @ omega[None]
        out_h = grid_h.flatten()[:, None] @ omega[None]
        return np.concatenate([np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], 1)[None]  # (1, wh, dim)

    def __call__(self, p, x, ctx: Ctx, path=""):
        B, H, W, C = x.shape
        pos = jnp.asarray(self.pos_embed_2d(W, H, C))
        src = x.reshape(B, H * W, C).astype(jnp.float32)
        q = k = src + pos
        src2 = self.ma(p["ma"], q, k, src)
        src = self.norm1(p["norm1"], src + src2)
        src2 = self.fc2(p["fc2"], _act("gelu", self.fc1(p["fc1"], src)))
        src = self.norm2(p["norm2"], src + src2)
        return src.reshape(B, H, W, C).astype(ctx.dtype)


def _grid_sample_bilinear(value, grid):
    """F.grid_sample(mode=bilinear, padding=zeros, align_corners=False) on NHWC.

    value: (B, H, W, D); grid: (B, Nq, P, 2) in [-1, 1] (x, y).
    Returns (B, Nq, P, D).
    """
    B, H, W, D = value.shape
    gx = (grid[..., 0] + 1.0) * W / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * H / 2.0 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(ix, iy):
        inside = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat = value.reshape(B, H * W, D)
        idx = iyc * W + ixc  # (B, Nq, P)
        out = jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1).reshape(*idx.shape, D)
        return out * inside[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return (
        v00 * ((1 - wx) * (1 - wy))[..., None]
        + v01 * (wx * (1 - wy))[..., None]
        + v10 * ((1 - wx) * wy)[..., None]
        + v11 * (wx * wy)[..., None]
    )


class MSDeformAttn:
    """Multiscale deformable attention (ref: transformer.py MSDeformAttn:458)."""

    def __init__(self, d_model=256, n_levels=4, n_heads=8, n_points=4):
        self.d, self.nl, self.nh, self.np_ = d_model, n_levels, n_heads, n_points
        self.sampling_offsets = Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = Linear(d_model, n_heads * n_levels * n_points)
        self.value_proj = Linear(d_model, d_model)
        self.output_proj = Linear(d_model, d_model)

    def init(self, rng):
        p = {
            "sampling_offsets": self.sampling_offsets.init(rng),
            "attention_weights": self.attention_weights.init(rng),
            "value_proj": self.value_proj.init(rng),
            "output_proj": self.output_proj.init(rng),
        }
        # reference _reset_parameters: zero offset weights, ring-pattern bias
        p["sampling_offsets"]["weight"][:] = 0.0
        thetas = np.arange(self.nh, dtype=np.float32) * (2.0 * math.pi / self.nh)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid.reshape(self.nh, 1, 1, 2), (1, self.nl, self.np_, 1))
        for i in range(self.np_):
            grid[:, :, i, :] *= i + 1
        p["sampling_offsets"]["bias"] = grid.reshape(-1).astype(np.float32)
        p["attention_weights"]["weight"][:] = 0.0
        p["attention_weights"]["bias"][:] = 0.0
        # xavier_uniform on value/output projections (ref _reset_parameters) —
        # Linear's default uniform(±sqrt(1/fan_in)) is ~1.7x smaller
        for name in ("value_proj", "output_proj"):
            w = p[name]["weight"]
            fan_in, fan_out = w.shape[0], w.shape[-1]
            bound = math.sqrt(6.0 / (fan_in + fan_out))
            p[name]["weight"] = rng.uniform(-bound, bound, w.shape).astype(np.float32)
            p[name]["bias"][:] = 0.0
        return p

    def __call__(self, p, query, refer_bbox, value, value_shapes):
        """query (B, Nq, C); refer_bbox (B, Nq, nl, 2|4) in [0,1]; value (B, Nv, C)."""
        B, Nq = query.shape[:2]
        Nv = value.shape[1]
        nh, nl, npts = self.nh, self.nl, self.np_
        hd = self.d // nh
        v = self.value_proj(p["value_proj"], value).reshape(B, Nv, nh, hd)
        off = self.sampling_offsets(p["sampling_offsets"], query).reshape(B, Nq, nh, nl, npts, 2)
        aw = self.attention_weights(p["attention_weights"], query).reshape(B, Nq, nh, nl * npts)
        aw = jax.nn.softmax(aw, -1).reshape(B, Nq, nh, nl, npts)
        num_points = refer_bbox.shape[-1]
        if num_points == 2:
            normalizer = jnp.array([[s[1], s[0]] for s in value_shapes], jnp.float32)  # (nl, 2) flip→(w, h)
            loc = refer_bbox[:, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
        else:  # xywh reference boxes
            loc = refer_bbox[:, :, None, :, None, :2] + off / npts * refer_bbox[:, :, None, :, None, 2:] * 0.5

        # per-level bilinear sampling over the flattened value tensor
        grids = 2 * loc - 1  # (B, Nq, nh, nl, npts, 2)
        start = 0
        sampled = []
        for lvl, (H, W) in enumerate(value_shapes):
            vl = v[:, start : start + H * W]  # (B, HW, nh, hd)
            start += H * W
            vl = vl.transpose(0, 2, 1, 3).reshape(B * nh, H, W, hd)
            g = grids[:, :, :, lvl].transpose(0, 2, 1, 3, 4).reshape(B * nh, Nq, npts, 2)
            sampled.append(_grid_sample_bilinear(vl, g))  # (B·nh, Nq, npts, hd)
        s = jnp.stack(sampled, 2)  # (B·nh, Nq, nl, npts, hd)
        w = aw.transpose(0, 2, 1, 3, 4).reshape(B * nh, Nq, nl, npts, 1)
        out = (s * w).sum((2, 3)).reshape(B, nh, Nq, hd).transpose(0, 2, 1, 3).reshape(B, Nq, self.d)
        return self.output_proj(p["output_proj"], out)


class DeformableTransformerDecoderLayer:
    """Self-attn + deformable cross-attn + FFN (ref: transformer.py :584)."""

    def __init__(self, d_model=256, n_heads=8, d_ffn=1024, n_levels=4, n_points=4):
        self.self_attn = MultiheadAttention(d_model, n_heads)
        self.cross_attn = MSDeformAttn(d_model, n_levels, n_heads, n_points)
        self.norm1 = LayerNorm(d_model)
        self.norm2 = LayerNorm(d_model)
        self.norm3 = LayerNorm(d_model)
        self.linear1 = Linear(d_model, d_ffn)
        self.linear2 = Linear(d_ffn, d_model)

    def init(self, rng):
        return {
            "self_attn": self.self_attn.init(rng),
            "cross_attn": self.cross_attn.init(rng),
            "norm1": self.norm1.init(rng),
            "norm2": self.norm2.init(rng),
            "norm3": self.norm3.init(rng),
            "linear1": self.linear1.init(rng),
            "linear2": self.linear2.init(rng),
        }

    def __call__(self, p, embed, refer_bbox, feats, shapes, attn_mask=None, query_pos=None):
        q = k = embed + query_pos if query_pos is not None else embed
        tgt = self.self_attn(p["self_attn"], q, k, embed, attn_mask=attn_mask)
        embed = self.norm1(p["norm1"], embed + tgt)
        tgt = self.cross_attn(
            p["cross_attn"], embed + query_pos if query_pos is not None else embed, refer_bbox[:, :, None], feats, shapes
        )
        embed = self.norm2(p["norm2"], embed + tgt)
        tgt2 = self.linear2(p["linear2"], _act("relu", self.linear1(p["linear1"], embed)))
        return self.norm3(p["norm3"], embed + tgt2)


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


class RTDETRDecoder:
    """Query-selection deformable decoder head (ref: head.py RTDETRDecoder:861).

    Inference path: (B, nq, 4+nc) with sigmoid scores and normalized xywh boxes.
    Training path returns per-layer aux outputs; contrastive-denoising
    queries (utils/cdn.py) are prepended when ctx.dn is set.
    """

    def __init__(self, nc=80, ch=(512, 1024, 2048), hd=256, nq=300, ndp=4, nh=8, ndl=6, d_ffn=1024, eval_idx=-1):
        self.nc, self.ch, self.hd, self.nq, self.ndl = nc, tuple(ch), hd, nq, ndl
        self.nl = len(ch)
        self.eval_idx = eval_idx if eval_idx >= 0 else ndl + eval_idx
        from yolo_tpu.nn.modules import ConvBNAct  # input_proj = conv1x1(bias=False)+BN

        self._proj = [ConvBNAct(c, hd, 1, act=False) for c in ch]
        self.dec_layers = [DeformableTransformerDecoderLayer(hd, nh, d_ffn, self.nl, ndp) for _ in range(ndl)]
        self.query_pos_head = MLP(4, 2 * hd, hd, 2)
        self.enc_output_lin = Linear(hd, hd)
        self.enc_output_ln = LayerNorm(hd)
        self.enc_score_head = Linear(hd, nc)
        self.enc_bbox_head = MLP(hd, hd, 4, 3)
        self.dec_score_head = [Linear(hd, nc) for _ in range(ndl)]
        self.dec_bbox_head = [MLP(hd, hd, 4, 3) for _ in range(ndl)]
        # attrs read by DetectionModel plumbing
        self.stride = [8, 16, 32][: self.nl] if self.nl <= 3 else [8, 16, 32, 64][: self.nl]
        self.reg_max = 1
        self.end2end = True

    def init(self, rng):
        p = {
            # torch: input_proj.{i}.0 = Conv2d(bias=False), .1 = BatchNorm2d
            "input_proj": {},
            "decoder": {"layers": {str(i): l.init(rng) for i, l in enumerate(self.dec_layers)}},
            "denoising_class_embed": {"weight": rng.normal(0, 1, (self.nc, self.hd)).astype(np.float32)},
            "query_pos_head": self.query_pos_head.init(rng),
            "enc_output": {"0": self.enc_output_lin.init(rng), "1": self.enc_output_ln.init(rng)},
            "enc_score_head": self.enc_score_head.init(rng),
            "enc_bbox_head": self.enc_bbox_head.init(rng),
            "dec_score_head": {str(i): h.init(rng) for i, h in enumerate(self.dec_score_head)},
            "dec_bbox_head": {str(i): h.init(rng) for i, h in enumerate(self.dec_bbox_head)},
        }
        for i, proj in enumerate(self._proj):
            cp = proj.init(rng)
            p["input_proj"][str(i)] = {"0": {"weight": cp["conv"]["weight"]}, "1": cp["bn"]}
        # reference bias init: cls bias = log-prob prior scaled by nc/80; zero last bbox layers
        bias_cls = float(-np.log((1 - 0.01) / 0.01)) / 80 * self.nc
        p["enc_score_head"]["bias"][:] = bias_cls
        p["enc_bbox_head"]["layers"]["2"]["weight"][:] = 0.0
        p["enc_bbox_head"]["layers"]["2"]["bias"][:] = 0.0
        for i in range(self.ndl):
            p["dec_score_head"][str(i)]["bias"][:] = bias_cls
            p["dec_bbox_head"][str(i)]["layers"]["2"]["weight"][:] = 0.0
            p["dec_bbox_head"][str(i)]["layers"]["2"]["bias"][:] = 0.0
        return p

    @staticmethod
    def _generate_anchors(shapes, grid_size=0.05, eps=1e-2):
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
            xy = (np.stack([gx, gy], -1) + 0.5) / np.array([w, h], np.float32)
            wh = np.ones_like(xy) * grid_size * (2.0**i)
            anchors.append(np.concatenate([xy, wh], -1).reshape(1, h * w, 4))
        anchors = np.concatenate(anchors, 1)
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors = np.log(anchors / (1 - anchors))
        anchors = np.where(valid, anchors, np.inf)
        return jnp.asarray(anchors), jnp.asarray(valid.astype(np.float32))

    def __call__(self, p, xs, ctx: Ctx, path=""):
        # encoder input: project each level then flatten (B, ΣHW, hd)
        feats = []
        shapes = []
        for i, x in enumerate(xs):
            pp = p["input_proj"][str(i)]
            proj_p = {"conv": pp["0"], "bn": pp["1"]}
            f = self._proj[i](proj_p, x, ctx, f"{path}/input_proj/{i}")
            B, H, W, C = f.shape
            feats.append(f.reshape(B, H * W, C))
            shapes.append((H, W))
        feats = jnp.concatenate(feats, 1).astype(jnp.float32)
        B = feats.shape[0]

        anchors, valid = self._generate_anchors(shapes)
        features = self.enc_output_ln(
            p["enc_output"]["1"], self.enc_output_lin(p["enc_output"]["0"], valid * feats)
        )
        enc_scores = self.enc_score_head(p["enc_score_head"], features)  # (B, ΣHW, nc)

        _, topk_ind = jax.lax.top_k(enc_scores.max(-1), self.nq)  # (B, nq)
        top_feats = jnp.take_along_axis(features, topk_ind[..., None], axis=1)
        top_anchors = jnp.take_along_axis(jnp.broadcast_to(anchors, (B, anchors.shape[1], 4)), topk_ind[..., None], axis=1)

        refer_bbox = self.enc_bbox_head(p["enc_bbox_head"], top_feats) + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer_bbox)  # grads flow to the encoder heads here
        enc_sel_scores = jnp.take_along_axis(enc_scores, topk_ind[..., None], axis=1)

        if ctx.train:
            # (ref: head.py _get_decoder_input:1150 — detach queries at train)
            refer_bbox = jax.lax.stop_gradient(refer_bbox)
            embed = jax.lax.stop_gradient(top_feats)
        else:
            embed = top_feats

        # contrastive-denoising queries prepended at train (ref: head.py
        # forward:1002 get_cdn_group → _get_decoder_input concat); the
        # class-embedding lookup happens here so denoising_class_embed trains
        attn_mask = None
        dn = getattr(ctx, "dn", None)
        if ctx.train and dn is not None:
            dn_embed = p["denoising_class_embed"]["weight"].astype(jnp.float32)[dn["dn_cls"]]
            dn_embed = dn_embed * dn["dn_valid"][..., None]
            embed = jnp.concatenate([dn_embed, embed], 1)
            refer_bbox = jnp.concatenate([dn["dn_bbox"].astype(jnp.float32), refer_bbox], 1)
            attn_mask = jnp.asarray(dn["attn_mask"])

        # decoder loop: train collects every layer's refinements (aux losses);
        # eval stops at eval_idx (ref: transformer.py DeformableTransformerDecoder.forward:748)
        refer = jax.nn.sigmoid(refer_bbox)
        out = embed
        dec_bboxes = []
        dec_scores = []
        last_refined = None
        for i, layer in enumerate(self.dec_layers):
            qp = self.query_pos_head(p["query_pos_head"], refer)
            out = layer(p["decoder"]["layers"][str(i)], out, refer, feats, shapes, attn_mask=attn_mask, query_pos=qp)
            bbox = self.dec_bbox_head[i](p["dec_bbox_head"][str(i)], out)
            refined = jax.nn.sigmoid(bbox + _inverse_sigmoid(refer))
            if ctx.train:
                dec_scores.append(self.dec_score_head[i](p["dec_score_head"][str(i)], out))
                if i == 0:
                    dec_bboxes.append(refined)
                else:
                    dec_bboxes.append(jax.nn.sigmoid(bbox + _inverse_sigmoid(last_refined)))
                last_refined = refined
                refer = jax.lax.stop_gradient(refined)
                continue
            if i == self.eval_idx:
                scores = self.dec_score_head[i](p["dec_score_head"][str(i)], out)
                return jnp.concatenate([refined, jax.nn.sigmoid(scores)], -1).astype(jnp.float32)  # (B, nq, 4+nc)
            refer = refined
        if ctx.train:
            return jnp.stack(dec_bboxes), jnp.stack(dec_scores), enc_bboxes, enc_sel_scores
        raise AssertionError("eval_idx out of range")
