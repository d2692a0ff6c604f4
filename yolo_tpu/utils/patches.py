"""Reference-named alias module for the unicode-safe cv2 IO patches
(ref: ultralytics/utils/patches.py imread:20, imwrite:47, imshow:73).

The real implementations live in yolo_tpu/utils/files.py and are what the
data pipeline already uses; this module keeps the reference import path
working (`from yolo_tpu.utils.patches import imread`) and adds the
non-ASCII-window-title imshow patch.
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.utils.files import imread, imwrite  # noqa: F401 (re-exports)


def imshow(winname: str, mat: np.ndarray) -> None:
    """Show an image in a window whose title may contain non-ASCII characters."""
    import cv2

    cv2.imshow(winname.encode("unicode_escape").decode(), mat)
