"""Semantic image search with the native CLIP towers.

Reference counterpart: solutions/similarity_search.py (VisualAISearch: CLIP
image/text embeddings + FAISS index + a Flask page). Here both towers are the
in-repo JAX CLIP (nn/text_model.py — exact with imported OpenAI weights), and
the index is a plain normalized-matrix dot product (FAISS IndexFlatIP on unit
vectors IS cosine similarity; at solution scale numpy matmul on host or a
one-line jnp matmul on the chip covers it).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from yolo_tpu.utils import LOGGER

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


class VisualAISearch:
    """Index a directory of images, query with free text.

    >>> s = VisualAISearch(data="path/to/images")   # optionally clip_ckpt=...
    >>> s("a red car", k=5)  # → [(filename, score), ...]
    """

    def __init__(self, data: str = "images", clip_ckpt: str | None = None, clip_model=None, batch: int = 16):
        from yolo_tpu.nn.text_model import CLIPModel

        self.clip = clip_model or CLIPModel()
        if clip_ckpt:
            self.clip.load_torch(clip_ckpt)
        elif clip_model is None:
            LOGGER.warning(
                "VisualAISearch: no clip_model/clip_ckpt supplied — indexing with RANDOMLY-initialized "
                "CLIP towers. Queries return noise until real CLIP weights are loaded."
            )
        self.data_dir = Path(data)
        self.batch = batch
        self.files: list[str] = []
        self.index: np.ndarray | None = None  # (N, D) unit-norm image embeddings
        if self.data_dir.exists():
            self.build_index()

    def build_index(self):
        import cv2

        files = sorted(f for f in self.data_dir.rglob("*") if f.suffix.lower() in IMG_EXTS)
        embs = []
        self.files = []
        for i in range(0, len(files), self.batch):
            ims = []
            for f in files[i : i + self.batch]:
                from yolo_tpu.utils.files import imread
                im = imread(str(f))
                if im is None:
                    continue
                ims.append(im[..., ::-1])  # BGR→RGB
                # path relative to the index root: unique across subdirs and
                # locatable on disk (bare basenames collide)
                self.files.append(str(f.relative_to(self.data_dir)))
            if ims:
                embs.append(np.asarray(self.clip.encode_image(ims)))
        self.index = np.concatenate(embs, 0) if embs else np.zeros((0, self.clip.vision.embed_dim), np.float32)
        LOGGER.info(f"similarity-search index: {len(self.files)} images")

    def search(self, query: str, k: int = 10, similarity_thresh: float = 0.1):
        """Top-k (filename, cosine score) for a text query."""
        if self.index is None or not len(self.files):
            return []
        q = np.asarray(self.clip.encode_text([query]))[0]  # unit-norm
        sims = self.index @ q
        order = np.argsort(-sims)[:k]
        return [(self.files[i], float(sims[i])) for i in order if sims[i] >= similarity_thresh]

    def __call__(self, query: str, k: int = 10, **kw):
        return self.search(query, k=k, **kw)
