"""CLIP text encoder + BPE tokenizer, functional JAX.

Reference counterpart: ultralytics/nn/text_model.py:22-49 (CLIP/MobileCLIP
wrappers around the `clip` package). That package downloads weights at import
time, which a zero-egress deployment cannot do — so this module implements the
architecture natively:

  - `SimpleTokenizer`: OpenAI CLIP's byte-level BPE. The 48k merge table ships
    with CLIP checkpoints (`bpe_simple_vocab_16e6.txt.gz`); point
    `YOLO_TPU_CLIP_BPE` (or the `bpe_path` argument) at it for exact CLIP token
    ids. Without a merge file it falls back to byte-level tokens (same special
    tokens, same context contract) so the full pipeline runs offline.
  - `CLIPTextEncoder`: the text transformer (pre-LN, causal mask, QuickGELU,
    EOT pooling, text projection). Param names follow the OpenAI `clip`
    state_dict layout (token_embedding.weight, transformer.resblocks.{i}.…)
    so released CLIP .pt checkpoints import mechanically via
    nn/torch_import.state_dict_to_params.

This unblocks YOLOWorld.set_classes, YOLOE text prompts, and the
similarity-search solution wherever weights are available.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from pathlib import Path

import numpy as np


# --------------------------------------------------------------------------- #
# tokenizer (ref: the CLIP package's simple_tokenizer.SimpleTokenizer)
# --------------------------------------------------------------------------- #
@lru_cache()
def bytes_to_unicode():
    """Reversible byte ↔ printable-unicode map (GPT-2/CLIP standard)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _basic_clean(text: str) -> str:
    # CLIP's basic_clean runs ftfy.fix_text first; ftfy isn't in this image,
    # so NFC normalization covers the common decomposed-unicode divergence
    # ('café' → 'café') — exotic mojibake repair is out of scope
    import unicodedata

    text = unicodedata.normalize("NFC", text)
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return " ".join(text.split())



def _ln(p, x):
    """CLIP LayerNorm (eps 1e-5)."""
    import jax

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["weight"] + p["bias"]


def _resblock_params(rng, w):
    """One transformer resblock's params (shared text/vision layout)."""

    def lin(ci, co):
        return {"weight": rng.normal(0, ci**-0.5, (co, ci)).astype(np.float32),
                "bias": np.zeros((co,), np.float32)}

    def ln():
        return {"weight": np.ones((w,), np.float32), "bias": np.zeros((w,), np.float32)}

    return {
        "attn": {
            "in_proj_weight": rng.normal(0, w**-0.5, (3 * w, w)).astype(np.float32),
            "in_proj_bias": np.zeros((3 * w,), np.float32),
            "out_proj": lin(w, w),
        },
        "ln_1": ln(),
        "mlp": {"c_fc": lin(w, 4 * w), "c_proj": lin(4 * w, w)},
        "ln_2": ln(),
    }


def _resblock(p, x, nh, mask=None):
    """Pre-LN attention + QuickGELU MLP resblock — ONE implementation for both
    towers (text passes the causal mask; vision passes none) so precision or
    epsilon tweaks can never diverge between them."""
    import jax
    import jax.numpy as jnp

    B, L, w = x.shape
    hd = w // nh
    h = _ln(p["ln_1"], x)
    qkv = h @ p["attn"]["in_proj_weight"].T + p["attn"]["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(hd))
    if mask is not None:
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
    att = jax.nn.softmax(logits, axis=-1) @ v
    att = att.transpose(0, 2, 1, 3).reshape(B, L, w)
    x = x + att @ p["attn"]["out_proj"]["weight"].T + p["attn"]["out_proj"]["bias"]
    h = _ln(p["ln_2"], x)
    h = h @ p["mlp"]["c_fc"]["weight"].T + p["mlp"]["c_fc"]["bias"]
    h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
    return x + h @ p["mlp"]["c_proj"]["weight"].T + p["mlp"]["c_proj"]["bias"]


class SimpleTokenizer:
    """CLIP byte-level BPE. Exact CLIP ids when given the released merge table;
    byte-level fallback otherwise (documented divergence: ids differ, the
    encoder contract — 77-token context, SOT/EOT framing — is identical)."""

    CONTEXT = 77

    def __init__(self, bpe_path: str | None = None):
        import regex

        self._re = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE,
        )
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        bpe_path = bpe_path or os.getenv("YOLO_TPU_CLIP_BPE")
        merges: list[tuple[str, str]] = []
        if bpe_path and Path(bpe_path).exists():
            raw = Path(bpe_path).read_bytes()
            text = gzip.decompress(raw).decode("utf-8") if bpe_path.endswith(".gz") else raw.decode("utf-8")
            lines = text.split("\n")[1 : 49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in lines if m]
            vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.has_merges = bool(merges)  # False = byte-level fallback ids (divergent vocab)
        self.cache = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self.vocab_size = len(vocab)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda pair: self.bpe_ranks.get(pair, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        bpe_tokens: list[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in self._re.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return bytearray([self.byte_decoder[c] for c in text]).decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(self, texts, context_length: int | None = None) -> np.ndarray:
        """texts → (B, 77) int32 token ids, SOT … EOT, zero-padded, truncated
        with EOT kept (clip.tokenize(truncate=True) semantics)."""
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.CONTEXT
        out = np.zeros((len(texts), L), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t) + [self.eot]
            if len(ids) > L:
                ids = ids[: L - 1] + [self.eot]
            out[i, : len(ids)] = ids
        return out


# --------------------------------------------------------------------------- #
# text transformer (OpenAI CLIP layout)
# --------------------------------------------------------------------------- #
class CLIPTextEncoder:
    """CLIP text tower. Defaults = ViT-B/32 & ViT-B/16 text config.

    >>> enc = CLIPTextEncoder()
    >>> params = enc.init(0)
    >>> feats = enc.encode_text(params, tokenizer(["a photo of a cat"]))  # (1, 512) unit-norm
    """

    def __init__(self, vocab_size: int = 49408, context: int = 77, width: int = 512,
                 layers: int = 12, heads: int = 8, embed_dim: int = 512):
        self.vocab_size, self.context, self.width = vocab_size, context, width
        self.layers, self.heads, self.embed_dim = layers, heads, embed_dim

    def init(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        w = self.width

        def lin(ci, co):
            return {
                "weight": (rng.normal(0, ci**-0.5, (co, ci))).astype(np.float32),
                "bias": np.zeros((co,), np.float32),
            }

        def ln():
            return {"weight": np.ones((w,), np.float32), "bias": np.zeros((w,), np.float32)}

        blocks = {str(i): _resblock_params(rng, w) for i in range(self.layers)}
        return {
            "token_embedding": {"weight": rng.normal(0, 0.02, (self.vocab_size, w)).astype(np.float32)},
            "positional_embedding": rng.normal(0, 0.01, (self.context, w)).astype(np.float32),
            "transformer": {"resblocks": blocks},
            "ln_final": ln(),
            "text_projection": rng.normal(0, w**-0.5, (w, self.embed_dim)).astype(np.float32),
        }

    def encode_text(self, params, tokens, normalize: bool = True):
        """tokens (B, 77) int32 → (B, embed_dim) features (unit-norm when
        normalize). EOT pooling = feature at argmax(token id) like CLIP."""
        import jax.numpy as jnp

        tokens = jnp.asarray(tokens)
        B, L = tokens.shape
        x = params["token_embedding"]["weight"][tokens] + params["positional_embedding"][:L]
        x = x.astype(jnp.float32)
        causal = jnp.tril(jnp.ones((L, L), bool))
        for i in range(self.layers):
            x = _resblock(params["transformer"]["resblocks"][str(i)], x, self.heads, mask=causal)
        x = _ln(params["ln_final"], x)
        eot = jnp.argmax(tokens, axis=-1)
        feats = x[jnp.arange(B), eot] @ params["text_projection"]
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats


class CLIPText:
    """Drop-in text model: tokenize + encode (ref: text_model.py CLIP:49).

    Weights: pass an OpenAI `clip` checkpoint state_dict path to `load_torch`
    (only the text-tower keys are consumed)."""

    def __init__(self, width=512, layers=12, heads=8, embed_dim=512, bpe_path=None, seed=0):
        self.tokenizer = SimpleTokenizer(bpe_path)
        self.encoder = CLIPTextEncoder(width=width, layers=layers, heads=heads, embed_dim=embed_dim)
        self.params = self.encoder.init(seed)

    def load_torch(self, path):
        from yolo_tpu.nn.torch_import import load_torch_checkpoint, state_dict_to_params

        sd, _ = load_torch_checkpoint(path)
        sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
        self.params = state_dict_to_params(sd, self.params)
        return self

    def tokenize(self, texts):
        return self.tokenizer(texts)

    def encode_text(self, texts):
        tokens = self.tokenizer(texts) if isinstance(texts, (str, list)) else texts
        return self.encoder.encode_text(self.params, tokens)


def build_text_model(variant: str = "clip:ViT-B/32", bpe_path=None):
    """Factory mirroring the reference's build_text_model (text_model.py:362,
    variants "clip:<size>" and "mobileclip:<size>").

    MobileCLIP-B/BLT's text tower (the one YOLOE ships with, ref
    MobileCLIPTS:278) is a standard CLIP-layout text transformer
    (512-wide, 12 layers, 77-token context) and is served by the same
    native encoder — load an exported mobileclip_b(lt) state_dict via
    `load_torch`. The s0/s1/s2 text towers are Apple's 4-layer hybrid
    architecture with no importable oracle in this environment and raise.
    """
    base, _, name = variant.partition(":")
    if base == "mobileclip" and name in ("s0", "s1", "s2"):
        raise NotImplementedError(
            "mobileclip s0/s1/s2 text towers are not supported natively — use "
            "'mobileclip:b'/'mobileclip:blt' (CLIP-layout) or 'clip:ViT-B/32'"
        )
    cfg = {
        "ViT-B/32": dict(width=512, layers=12, heads=8, embed_dim=512),
        "ViT-B/16": dict(width=512, layers=12, heads=8, embed_dim=512),
        "ViT-L/14": dict(width=768, layers=12, heads=12, embed_dim=768),
        "b": dict(width=512, layers=12, heads=8, embed_dim=512),
        "blt": dict(width=512, layers=12, heads=8, embed_dim=512),
    }.get(name, dict(width=512, layers=12, heads=8, embed_dim=512))
    return CLIPText(**cfg, bpe_path=bpe_path)


class CLIPVisionEncoder:
    """CLIP visual ViT (OpenAI layout: visual.conv1/class_embedding/
    positional_embedding/ln_pre/transformer.resblocks/ln_post/proj).

    Defaults = ViT-B/32. Images: (B, H, W, 3) RGB float [0, 1] normalized with
    the CLIP mean/std inside `encode_image`.
    """

    MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, image_size: int = 224, patch: int = 32, width: int = 768,
                 layers: int = 12, heads: int = 12, embed_dim: int = 512):
        self.image_size, self.patch, self.width = image_size, patch, width
        self.layers, self.heads, self.embed_dim = layers, heads, embed_dim
        self.grid = image_size // patch

    def init(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        w = self.width

        def lin(ci, co):
            return {"weight": rng.normal(0, ci**-0.5, (co, ci)).astype(np.float32),
                    "bias": np.zeros((co,), np.float32)}

        def ln():
            return {"weight": np.ones((w,), np.float32), "bias": np.zeros((w,), np.float32)}

        blocks = {str(i): _resblock_params(rng, w) for i in range(self.layers)}
        return {
            "conv1": {"weight": rng.normal(0, 0.02, (self.patch, self.patch, 3, w)).astype(np.float32)},
            "class_embedding": rng.normal(0, w**-0.5, (w,)).astype(np.float32),
            "positional_embedding": rng.normal(0, 0.01, (self.grid**2 + 1, w)).astype(np.float32),
            "ln_pre": ln(),
            "transformer": {"resblocks": blocks},
            "ln_post": ln(),
            "proj": rng.normal(0, w**-0.5, (w, self.embed_dim)).astype(np.float32),
        }

    def encode_image(self, params, images, normalize: bool = True):
        import jax
        import jax.numpy as jnp

        x = (jnp.asarray(images, jnp.float32) - self.MEAN) / self.STD
        x = jax.lax.conv_general_dilated(
            x, params["conv1"]["weight"].astype(jnp.float32), (self.patch, self.patch), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        B, gh, gw, w = x.shape
        x = x.reshape(B, gh * gw, w)
        cls_tok = jnp.broadcast_to(params["class_embedding"].astype(jnp.float32)[None, None], (B, 1, w))
        x = jnp.concatenate([cls_tok, x], axis=1) + params["positional_embedding"]
        x = _ln(params["ln_pre"], x)
        for i in range(self.layers):
            x = _resblock(params["transformer"]["resblocks"][str(i)], x, self.heads)
        feats = _ln(params["ln_post"], x[:, 0]) @ params["proj"]
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats


class CLIPModel:
    """Joint text+image CLIP (ref: nn/text_model.py CLIP image_preprocess +
    encode_text) — powers the similarity-search solution."""

    def __init__(self, bpe_path=None, seed: int = 0, **vision_kw):
        self.text = CLIPText(bpe_path=bpe_path, seed=seed)
        self.vision = CLIPVisionEncoder(**vision_kw)
        self.vision_params = self.vision.init(seed + 1)

    def load_torch(self, path):
        """Import a full OpenAI clip checkpoint (text + visual towers)."""
        from yolo_tpu.nn.torch_import import load_torch_checkpoint, state_dict_to_params

        if not getattr(self.text.tokenizer, "has_merges", True):
            from yolo_tpu.utils import LOGGER

            LOGGER.warning(
                "CLIP checkpoint loaded but the tokenizer is running byte-level FALLBACK ids "
                "(no BPE merge table) — text embeddings will be meaningless. Point YOLO_TPU_CLIP_BPE "
                "(or bpe_path=) at clip's bpe_simple_vocab_16e6.txt.gz."
            )
        sd, _ = load_torch_checkpoint(path)
        self.text.params = state_dict_to_params(
            {k: v for k, v in sd.items() if not k.startswith("visual.")}, self.text.params
        )
        self.vision_params = state_dict_to_params(
            {k[len("visual.") :]: v for k, v in sd.items() if k.startswith("visual.")}, self.vision_params
        )
        return self

    def encode_text(self, texts):
        return self.text.encode_text(texts)

    def encode_image(self, images):
        """images: (B, H, W, 3) RGB uint8/float at any size — resized to the
        tower's input size with bicubic like CLIP's preprocess."""
        import cv2

        size = self.vision.image_size
        ims = []
        for im in images:
            im = np.asarray(im)
            if im.dtype == np.uint8:
                im = im.astype(np.float32) / 255.0
            if im.shape[:2] != (size, size):
                # CLIP preprocess: bicubic resize of the SHORT side to `size`
                # then center crop — a direct (size, size) resize warps the
                # aspect ratio and shifts crop-vs-text similarities
                h0, w0 = im.shape[:2]
                s = size / min(h0, w0)
                im = cv2.resize(im, (max(size, round(w0 * s)), max(size, round(h0 * s))), interpolation=cv2.INTER_CUBIC)
                h1, w1 = im.shape[:2]
                top, left = (h1 - size) // 2, (w1 - size) // 2
                im = im[top : top + size, left : left + size]
            ims.append(im)
        return self.vision.encode_image(self.vision_params, np.stack(ims))
