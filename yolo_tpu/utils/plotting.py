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

    def result(self):
        return self.im


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
