"""Dataset format converters: COCO / mask-png / DOTA -> YOLO label files.

Counterpart of the reference's dataset tooling (ref: ultralytics/data/converter.py
convert_coco:231, convert_segment_masks_to_yolo_seg:350, convert_dota_to_yolo_obb:426,
min_index:519, merge_multi_segment:535, yolo_bbox2segment:586,
coco91_to_coco80_class:23, coco80_to_coco91_class:126). Everything here is
host-side data preparation (json/numpy/cv2) — device code never sees these.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from yolo_tpu.utils import LOGGER, increment_path
from yolo_tpu.utils.tqdm import TQDM

# The original 91-id COCO category space has 11 ids without annotations
# (street sign, hat, shoe, eye glasses, plate, mirror, window, desk, door,
# blender, hair brush). Removing them yields the standard 80-class set; the
# two mappings below are derived from that set rather than hardcoded tables.
_COCO91_UNUSED = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}  # 0-based ids


def coco91_to_coco80_class() -> list:
    """91-index (paper) -> 80-index (2014/2017 dataset) class map; None for unused ids."""
    out, next_idx = [], 0
    for i in range(91):
        if i in _COCO91_UNUSED:
            out.append(None)
        else:
            out.append(next_idx)
            next_idx += 1
    return out


def coco80_to_coco91_class() -> list:
    """80-index (dataset) -> 91-index (paper) class map (1-based ids, like the reference)."""
    return [i + 1 for i in range(91) if i not in _COCO91_UNUSED]


def min_index(arr1: np.ndarray, arr2: np.ndarray):
    """Index pair (i, j) minimizing the distance between two (N,2)/(M,2) point sets."""
    d2 = ((arr1[:, None, :] - arr2[None, :, :]) ** 2).sum(-1)
    return np.unravel_index(np.argmin(d2, axis=None), d2.shape)


def merge_multi_segment(segments: list) -> list:
    """Connect multi-part COCO segments into one polygon via min-distance bridges.

    Same stitching scheme as the reference (ref: converter.py:535): each part is
    rolled so its closest point to the previous part comes first, consecutive
    parts are chained, and middle parts contribute their return path on a
    second reverse pass so the merged outline is a closed walk.
    """
    segments = [np.asarray(s, dtype=np.float64).reshape(-1, 2) for s in segments]
    n = len(segments)
    # bridge endpoints between consecutive parts
    links: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        i1, i2 = min_index(segments[i - 1], segments[i])
        links[i - 1].append(int(i1))
        links[i].append(int(i2))

    out = []
    # forward pass: walk every part from its entry bridge to its exit bridge
    for i, idx in enumerate(links):
        if len(idx) == 2 and idx[0] > idx[1]:
            idx = idx[::-1]
            segments[i] = segments[i][::-1, :]
        segments[i] = np.roll(segments[i], -idx[0], axis=0)
        segments[i] = np.concatenate([segments[i], segments[i][:1]])
        if i in {0, n - 1}:
            out.append(segments[i])
        else:
            out.append(segments[i][0 : idx[1] - idx[0] + 1])
    # reverse pass: middle parts emit the remainder so the walk returns home
    for i in range(n - 1, -1, -1):
        if i not in {0, n - 1}:
            idx = links[i]
            out.append(segments[i][abs(idx[1] - idx[0]):])
    return out


def _write_label_line(file, values) -> None:
    file.write(("%g " * len(values)).rstrip() % tuple(values) + "\n")


def convert_coco(
    labels_dir: str = "../coco/annotations/",
    save_dir: str = "coco_converted/",
    use_segments: bool = False,
    use_keypoints: bool = False,
    cls91to80: bool = True,
    lvis: bool = False,
):
    """Convert COCO/LVIS json annotations to YOLO txt labels.

    Output tree: ``save_dir/labels/<json-stem minus 'instances_'>/<image>.txt``
    with normalized ``cls cx cy w h`` rows (or polygon / keypoint rows when
    requested) — byte-compatible with the reference converter's layout
    (ref: converter.py convert_coco:231).
    """
    save_dir = increment_path(Path(save_dir))
    for p in (save_dir / "labels", save_dir / "images"):
        p.mkdir(parents=True, exist_ok=True)

    coco80 = coco91_to_coco80_class()

    for json_file in sorted(Path(labels_dir).resolve().glob("*.json")):
        lname = "" if lvis else json_file.stem.replace("instances_", "")
        fn = save_dir / "labels" / lname
        fn.mkdir(parents=True, exist_ok=True)
        if lvis:
            # LVIS val contains COCO-train images; both subfolders must exist
            (fn / "train2017").mkdir(parents=True, exist_ok=True)
            (fn / "val2017").mkdir(parents=True, exist_ok=True)
        data = json.loads(json_file.read_text(encoding="utf-8"))

        images = {f"{x['id']:d}": x for x in data["images"]}
        annotations = defaultdict(list)
        for ann in data["annotations"]:
            annotations[ann["image_id"]].append(ann)

        image_txt = []
        for img_id, anns in TQDM(annotations.items(), desc=f"Annotations {json_file}"):
            img = images[f"{img_id:d}"]
            h, w = img["height"], img["width"]
            if lvis:
                f = str(Path(img["coco_url"]).relative_to("http://images.cocodataset.org"))
                image_txt.append(str(Path("./images") / f))
            else:
                f = img["file_name"]

            bboxes, segments, keypoints = [], [], []
            for ann in anns:
                if ann.get("iscrowd", False):
                    continue
                # COCO boxes are [x_tl, y_tl, w, h]; normalize to cx cy w h
                box = np.array(ann["bbox"], dtype=np.float64)
                box[:2] += box[2:] / 2
                box[[0, 2]] /= w
                box[[1, 3]] /= h
                if box[2] <= 0 or box[3] <= 0:
                    continue

                cls = coco80[ann["category_id"] - 1] if cls91to80 else ann["category_id"] - 1
                box = [cls] + box.tolist()
                if box in bboxes:
                    continue
                bboxes.append(box)
                if use_segments and ann.get("segmentation") is not None:
                    seg = ann["segmentation"]
                    if len(seg) == 0:
                        segments.append([])
                    else:
                        if len(seg) > 1:
                            pts = np.concatenate(merge_multi_segment(seg), axis=0)
                        else:
                            pts = np.asarray(seg[0], dtype=np.float64).reshape(-1, 2)
                        s = (pts / np.array([w, h])).reshape(-1).tolist()
                        segments.append([cls] + s)
                if use_keypoints and ann.get("keypoints") is not None:
                    kpts = (np.asarray(ann["keypoints"], dtype=np.float64).reshape(-1, 3)
                            / np.array([w, h, 1])).reshape(-1).tolist()
                    keypoints.append(box + kpts)

            with open((fn / f).with_suffix(".txt"), "a", encoding="utf-8") as file:
                for i in range(len(bboxes)):
                    if use_keypoints:
                        line = keypoints[i]
                    elif use_segments and len(segments) > i and len(segments[i]) > 0:
                        line = segments[i]
                    else:
                        line = bboxes[i]
                    _write_label_line(file, line)

        if lvis:
            out_txt = save_dir / json_file.name.replace("lvis_v1_", "").replace(".json", ".txt")
            with open(out_txt, "a", encoding="utf-8") as f:
                f.writelines(f"{line}\n" for line in image_txt)

    LOGGER.info(f"{'LVIS' if lvis else 'COCO'} data converted successfully.\n"
                f"Results saved to {save_dir.resolve()}")
    return save_dir


def convert_segment_masks_to_yolo_seg(masks_dir: str, output_dir: str, classes: int) -> None:
    """Convert per-pixel class-id mask images (pixel value = class id + 1,
    0 = background) to YOLO polygon label files (ref: converter.py:350)."""
    import cv2

    Path(output_dir).mkdir(parents=True, exist_ok=True)
    for mask_path in sorted(Path(masks_dir).iterdir()):
        if mask_path.suffix not in {".png", ".jpg"}:
            continue
        mask = cv2.imread(str(mask_path), cv2.IMREAD_GRAYSCALE)
        h, w = mask.shape
        rows = []
        for value in np.unique(mask):
            if value == 0:
                continue
            cls = int(value) - 1
            if not 0 <= cls < classes:
                LOGGER.warning(f"unknown class for pixel value {value} in {mask_path}, skipping")
                continue
            contours, _ = cv2.findContours((mask == value).astype(np.uint8),
                                           cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            for contour in contours:
                if len(contour) >= 3:  # polygons need at least 3 points
                    pts = contour.squeeze(1)
                    row = [cls]
                    for x, y in pts:
                        row += [round(x / w, 6), round(y / h, 6)]
                    rows.append(row)
        out = Path(output_dir) / f"{mask_path.stem}.txt"
        with open(out, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(" ".join(map(str, row)) + "\n")
        LOGGER.info(f"converted {mask_path} -> {out} ({h}x{w})")


# DOTA v1/v1.5/v2 category order (ref: converter.py:461-480)
DOTA_CLASSES = (
    "plane", "ship", "storage-tank", "baseball-diamond", "tennis-court",
    "basketball-court", "ground-track-field", "harbor", "bridge",
    "large-vehicle", "small-vehicle", "helicopter", "roundabout",
    "soccer-ball-field", "swimming-pool", "container-crane", "airport", "helipad",
)


def convert_dota_to_yolo_obb(dota_root_path: str) -> None:
    """Convert DOTA-format annotations (8 corner coords + class name) to
    normalized YOLO OBB labels (ref: converter.py:426).

    Expects ``images/{train,val}`` + ``labels/{train,val}_original``; writes
    ``labels/{train,val}``.
    """
    import cv2

    root = Path(dota_root_path)
    class_idx = {name: i for i, name in enumerate(DOTA_CLASSES)}

    for phase in ("train", "val"):
        image_dir = root / "images" / phase
        orig_label_dir = root / "labels" / f"{phase}_original"
        save_dir = root / "labels" / phase
        save_dir.mkdir(parents=True, exist_ok=True)

        for image_path in TQDM(sorted(image_dir.iterdir()), desc=f"Processing {phase} images"):
            if image_path.suffix != ".png":
                continue
            img = cv2.imread(str(image_path))
            h, w = img.shape[:2]
            src = orig_label_dir / f"{image_path.stem}.txt"
            dst = save_dir / f"{image_path.stem}.txt"
            with open(src, encoding="utf-8") as f, open(dst, "w", encoding="utf-8") as g:
                for line in f:
                    parts = line.strip().split()
                    if len(parts) < 9:
                        continue
                    cls = class_idx[parts[8]]
                    coords = [float(p) for p in parts[:8]]
                    norm = [coords[i] / (w if i % 2 == 0 else h) for i in range(8)]
                    g.write(f"{cls} " + " ".join(f"{c:.6g}" for c in norm) + "\n")


def yolo_bbox2segment(im_dir, save_dir=None, sam_model: str = "sam_b", weights=None) -> Path:
    """Upgrade a detect dataset (bbox labels) to a segment dataset using SAM
    box prompts (ref: converter.py:586).

    Args:
        im_dir: images directory; labels are resolved via the sibling
            ``labels`` directory (standard YOLO layout).
        save_dir: output labels directory (default: ``<im_dir>-segment/labels``).
        sam_model: SAM variant name for the in-repo facade (sam_b/sam_l/...).
        weights: optional released SAM .pt checkpoint to import. Without it the
            facade runs random-init — fine for wiring tests, not for real masks.
    """
    import cv2

    from yolo_tpu.models import SAM

    im_dir = Path(im_dir)
    lb_dir = im_dir.parent / "labels"
    save_dir = Path(save_dir) if save_dir else im_dir.parent / f"{im_dir.parent.name}-segment" / "labels"
    save_dir.mkdir(parents=True, exist_ok=True)

    sam = SAM(sam_model)
    if weights:
        sam.load_torch(weights)

    for im_file in TQDM(sorted(im_dir.iterdir()), desc="bbox -> segment"):
        lb_file = lb_dir / f"{im_file.stem}.txt"
        if im_file.suffix.lower().lstrip(".") not in {"jpg", "jpeg", "png", "bmp"} or not lb_file.exists():
            continue
        img = cv2.imread(str(im_file))
        h, w = img.shape[:2]
        rows = np.array([line.split() for line in lb_file.read_text().splitlines() if line],
                        dtype=np.float64)
        out_lines = []
        if len(rows):
            cls = rows[:, 0].astype(int)
            cxcywh = rows[:, 1:5] * np.array([w, h, w, h])
            boxes = np.stack([cxcywh[:, 0] - cxcywh[:, 2] / 2, cxcywh[:, 1] - cxcywh[:, 3] / 2,
                              cxcywh[:, 0] + cxcywh[:, 2] / 2, cxcywh[:, 1] + cxcywh[:, 3] / 2], axis=1)
            res = sam.predict(img[..., ::-1], bboxes=boxes, multimask_output=False)
            for c, seg in zip(cls, res.masks.xyn):
                if seg.size:
                    out_lines.append(f"{c} " + " ".join(f"{v:.6g}" for v in seg.reshape(-1)))
        (save_dir / f"{im_file.stem}.txt").write_text("\n".join(out_lines) + ("\n" if out_lines else ""))
    LOGGER.info(f"segment labels saved to {save_dir}")
    return save_dir
