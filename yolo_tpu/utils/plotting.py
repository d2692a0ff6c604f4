"""Plotting: annotator, training curves, PR curves, confusion matrix.

Host-side matplotlib/cv2 (ref: ultralytics/utils/plotting.py:1040 Annotator,
plot_results; utils/metrics.py plot_pr_curve:638).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from yolo_tpu.utils import LOGGER

_COLORS = [
    (56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207),
    (10, 249, 72), (23, 204, 146), (134, 219, 61), (52, 147, 26), (187, 212, 0),
    (168, 153, 44), (255, 194, 0), (147, 69, 52), (255, 115, 100), (236, 24, 0),
    (255, 56, 132), (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255),
]


def color_for(idx: int):
    return _COLORS[int(idx) % len(_COLORS)]


class Colors:
    """Deterministic color palette keyed by index (ref: utils/plotting.py
    Colors:20 — same hex set, so plots match the reference visually)."""

    def __init__(self):
        hexs = (
            "FF3838", "FF9D97", "FF701F", "FFB21D", "CFD231", "48F90A", "92CC17",
            "3DDB86", "1A9334", "00D4BB", "2C99A8", "00C2FF", "344593", "6473FF",
            "0018EC", "8438FF", "520085", "CB38FF", "FF95C8", "FF37C7",
        )
        self.palette = [tuple(int(h[i : i + 2], 16) for i in (0, 2, 4)) for h in hexs]
        self.n = len(self.palette)

    def __call__(self, i, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()


class Annotator:
    """Box/label drawer on a BGR image (subset of the reference Annotator)."""

    def __init__(self, im: np.ndarray, line_width: int | None = None, font_size=None):
        import cv2

        self.im = im if im.flags.writeable else im.copy()
        self.lw = line_width or max(round(sum(im.shape[:2]) / 2 * 0.003), 2)
        self._cv2 = cv2

    def box_label(self, box, label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255)):
        cv2 = self._cv2
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.im, p1, p2, color, self.lw, cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            wh = cv2.getTextSize(label, 0, self.lw / 3, tf)[0]
            outside = p1[1] - wh[1] - 3 >= 0
            p2t = (p1[0] + wh[0], p1[1] - wh[1] - 3 if outside else p1[1] + wh[1] + 3)
            cv2.rectangle(self.im, p1, p2t, color, -1, cv2.LINE_AA)
            cv2.putText(
                self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + wh[1] + 2),
                0, self.lw / 3, txt_color, tf, cv2.LINE_AA,
            )

    def rectangle(self, xy, fill=None, outline=None, width: int = 1):
        """Draw a rectangle (ref: Annotator.rectangle:478). xy = (x1, y1, x2, y2)."""
        cv2 = self._cv2
        p1, p2 = (int(xy[0]), int(xy[1])), (int(xy[2]), int(xy[3]))
        if fill is not None:
            cv2.rectangle(self.im, p1, p2, fill, -1, cv2.LINE_AA)
        if outline is not None:
            cv2.rectangle(self.im, p1, p2, outline, width, cv2.LINE_AA)

    def text(self, xy, text: str, txt_color=(255, 255, 255), anchor: str = "top", box_color=()):
        """Draw text with optional background box (ref: Annotator.text:482)."""
        cv2 = self._cv2
        tf = max(self.lw - 1, 1)
        wh = cv2.getTextSize(text, 0, self.lw / 3, tf)[0]
        x, y = int(xy[0]), int(xy[1])
        if anchor == "bottom":
            y -= 2
        else:
            y += wh[1] + 2
        if box_color:
            cv2.rectangle(self.im, (x, y - wh[1] - 3), (x + wh[0], y + 3), box_color, -1, cv2.LINE_AA)
        cv2.putText(self.im, text, (x, y), 0, self.lw / 3, txt_color, tf, cv2.LINE_AA)

    def masks(self, masks, colors, alpha: float = 0.5):
        """Alpha-blend instance masks (ref: Annotator.masks:366).

        masks: (N, H, W) float/bool at image resolution; colors: list of BGR."""
        if masks is None or len(masks) == 0:
            return
        im = self.im.astype(np.float32)
        for m, c in zip(np.asarray(masks), colors):
            mm = (np.asarray(m) > 0.5)[..., None]
            im = np.where(mm, im * (1 - alpha) + alpha * np.array(c, np.float32), im)
        self.im[:] = im.astype(np.uint8)

    # COCO-17 skeleton (ref: Annotator.__init__ skeleton table)
    SKELETON = [(16, 14), (14, 12), (17, 15), (15, 13), (12, 13), (6, 12), (7, 13), (6, 7),
                (6, 8), (7, 9), (8, 10), (9, 11), (2, 3), (1, 2), (1, 3), (2, 4), (3, 5), (4, 6), (5, 7)]

    def kpts(self, kpts, radius: int = 5, kpt_line: bool = True, conf_thres: float = 0.25):
        """Draw keypoints + skeleton (ref: Annotator.kpts:410). kpts (K, 2|3)."""
        cv2 = self._cv2
        kpts = np.asarray(kpts)
        has_conf = kpts.shape[-1] == 3
        for k in kpts:
            if has_conf and k[2] < conf_thres:
                continue
            if k[0] > 0 and k[1] > 0:
                cv2.circle(self.im, (int(k[0]), int(k[1])), radius, (0, 255, 0), -1, cv2.LINE_AA)
        if kpt_line and len(kpts) == 17:
            for a, b in self.SKELETON:
                ka, kb = kpts[a - 1], kpts[b - 1]
                if has_conf and (ka[2] < conf_thres or kb[2] < conf_thres):
                    continue
                if min(ka[0], ka[1], kb[0], kb[1]) > 0:
                    cv2.line(self.im, (int(ka[0]), int(ka[1])), (int(kb[0]), int(kb[1])), (255, 128, 0), 2, cv2.LINE_AA)

    def save(self, filename="image.jpg"):
        self._cv2.imwrite(str(filename), self.im)

    def result(self):
        return self.im


def plot_images(batch, fname="train_batch.jpg", names=None, max_subplots: int = 16, conf_thres: float = 0.25, save: bool = True):
    """Train-batch mosaic with gt/pred boxes (ref: plotting.py plot_images:682).

    batch: our collated dict — img (B, H, W, 3) RGB uint8, cls (B, N),
    bboxes (B, N, 4) normalized xywh, mask_gt (B, N); optional conf (B, N).
    """
    import cv2
    import math

    imgs = np.asarray(batch["img"])[:max_subplots]
    B, H, W = imgs.shape[:3]
    ncols = int(math.ceil(B**0.5))
    nrows = int(math.ceil(B / ncols))
    canvas = np.full((nrows * H, ncols * W, 3), 255, np.uint8)
    names = names or {}
    confs = batch.get("conf")
    for i in range(B):
        r, c = divmod(i, ncols)
        tile = imgs[i][..., ::-1].copy()  # RGB → BGR for cv2 drawing
        ann = Annotator(tile, line_width=max(round((H + W) / 2 * 0.003), 2))
        m = np.asarray(batch["mask_gt"][i]) > 0
        boxes = np.asarray(batch["bboxes"][i])[m]
        cls = np.asarray(batch["cls"][i])[m]
        cf = np.asarray(confs[i])[m] if confs is not None else None
        for j, (b, k) in enumerate(zip(boxes, cls)):
            if cf is not None and cf[j] < conf_thres:
                continue
            cx, cy, bw, bh = b * [W, H, W, H]
            xyxy = (cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2)
            label = names.get(int(k), str(int(k))) + (f" {cf[j]:.2f}" if cf is not None else "")
            ann.box_label(xyxy, label, color=color_for(int(k)))
        canvas[r * H : (r + 1) * H, c * W : (c + 1) * W] = ann.result()
    if save:
        cv2.imwrite(str(fname), canvas)
        return None
    return canvas


def plot_labels(boxes, cls, names=None, save_path="labels.png"):
    """Dataset label statistics: class histogram + box center/size scatter
    (ref: plotting.py plot_labels:564, matplotlib in place of seaborn)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    boxes = np.asarray(boxes).reshape(-1, 4)  # normalized xywh
    cls = np.asarray(cls).reshape(-1)
    fig, axes = plt.subplots(2, 2, figsize=(10, 8), tight_layout=True)
    names = names or {}
    nc = int(cls.max()) + 1 if len(cls) else 1
    axes[0, 0].hist(cls, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_title("instances per class")
    if nc <= 30 and names:
        axes[0, 0].set_xticks(range(nc))
        axes[0, 0].set_xticklabels([names.get(i, i) for i in range(nc)], rotation=90, fontsize=7)
    if len(boxes):
        axes[0, 1].scatter(boxes[:, 0], boxes[:, 1], s=3, alpha=0.4)
        axes[0, 1].set_title("box centers (x, y)")
        axes[1, 0].scatter(boxes[:, 2], boxes[:, 3], s=3, alpha=0.4)
        axes[1, 0].set_title("box sizes (w, h)")
        axes[1, 1].hist2d(boxes[:, 2], boxes[:, 3], bins=32)
        axes[1, 1].set_title("w/h density")
    for ax in axes.flat:
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1) if ax is not axes[0, 0] else None
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def plot_results(csv_file, save_path=None):
    """Plot training curves from results.csv (ref: plot_results)."""
    import csv as csvlib

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = list(csvlib.DictReader(open(csv_file)))
    if not rows:
        return None
    keys = [k for k in rows[0] if k not in ("epoch", "time") and rows[0][k] != ""]
    epochs = [int(r["epoch"]) for r in rows]
    n = len(keys)
    cols = min(4, n)
    rws = (n + cols - 1) // cols
    fig, axes = plt.subplots(rws, cols, figsize=(4 * cols, 3 * rws), squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        vals = [float(r[k]) if r[k] else np.nan for r in rows]
        ax.plot(epochs, vals, marker=".")
        ax.set_title(k, fontsize=9)
    for j in range(n, rws * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    save_path = save_path or Path(csv_file).with_name("results.png")
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    LOGGER.info(f"saved {save_path}")
    return save_path


def plot_pr_curve(p_curve, r_curve, x, names=None, save_path="PR_curve.png"):
    """PR curve per class + mean (ref: metrics.py plot_pr_curve)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    for ci in range(p_curve.shape[0]):
        label = (names or {}).get(ci, str(ci))
        ax.plot(r_curve[ci], p_curve[ci], alpha=0.6, label=label)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    if p_curve.shape[0] <= 12:
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return Path(save_path)


def plot_confusion_matrix(matrix: np.ndarray, names=None, save_path="confusion_matrix.png", normalize: bool = True):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = matrix.astype(np.float64)
    if normalize:
        m = m / (m.sum(0, keepdims=True) + 1e-9)
    nc = matrix.shape[0] - 1
    labels = [(names or {}).get(i, str(i)) for i in range(nc)] + ["background"]
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(m, cmap="Blues")
    ax.set_xticks(range(len(labels)), labels, rotation=90, fontsize=7)
    ax.set_yticks(range(len(labels)), labels, fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.colorbar(im)
    for i in range(m.shape[0]):
        for j in range(m.shape[1]):
            if m[i, j] > 0.005:
                ax.text(j, i, f"{m[i, j]:.2f}" if normalize else int(m[i, j]), ha="center", va="center", fontsize=6)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return Path(save_path)


def feature_visualization(x, module_type: str, stage: int, n: int = 32, save_dir: Path = Path("runs/detect/exp")):
    """Save a grid of a layer's feature maps + the raw array (ref:
    utils/plotting.py feature_visualization:1007). `x` is NHWC (batch 0 used);
    head outputs and 1-pixel maps are skipped, mirroring the reference."""
    for m in ("Detect", "Segment", "Pose", "Classify", "OBB", "RTDETRDecoder"):
        if m in module_type:
            return
    x = np.asarray(x)
    if x.ndim != 4 or x.shape[1] <= 1 or x.shape[2] <= 1:
        return
    if x.dtype not in (np.float32, np.float64):  # bf16 → plottable
        x = x.astype(np.float32)
    import math

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    channels = x.shape[-1]
    f = Path(save_dir) / f"stage{stage}_{module_type.rsplit('.', 1)[-1]}_features.png"
    f.parent.mkdir(parents=True, exist_ok=True)
    n = min(n, channels)
    _, ax = plt.subplots(math.ceil(n / 8), 8, tight_layout=True)
    ax = np.atleast_1d(ax).ravel()
    plt.subplots_adjust(wspace=0.05, hspace=0.05)
    for i in range(len(ax)):
        if i < n:
            ax[i].imshow(x[0, :, :, i])
        ax[i].axis("off")
    LOGGER.info(f"Saving {f}... ({n}/{channels})")
    plt.savefig(f, dpi=150, bbox_inches="tight")
    plt.close()
    np.save(str(f.with_suffix(".npy")), x[0])
