"""YOLO-format detection dataset (images/ + labels/*.txt) with label caching.

Reference counterpart: data/dataset.py YOLODataset:49 + data/base.py BaseDataset:23.
Host-side numpy; the collate produces fixed-shape padded batches so the jitted
train step never sees dynamic shapes.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np

from yolo_tpu.utils import LOGGER, yaml_load

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def check_det_dataset(data) -> dict:
    """Resolve a dataset yaml (ref: data/utils.py check_det_dataset): path/train/val/names."""
    if isinstance(data, dict):
        d = dict(data)
    else:
        p = Path(data)
        if not p.exists() and p.suffix in (".yaml", ".yml") and len(p.parts) == 1:
            shipped = Path(__file__).resolve().parents[1] / "cfg" / "datasets" / p.name
            if shipped.exists():  # registry lookup, like the reference's checks
                data = shipped
        if not Path(data).exists() and not Path(data).is_absolute():
            # persisted datasets_dir (ref check_det_dataset → DATASETS_DIR)
            try:
                from yolo_tpu.utils.settings import get_settings

                alt = Path(get_settings().get("datasets_dir") or "datasets") / data
                if alt.exists():
                    data = alt
            except Exception:
                pass
        d = yaml_load(data)
        d.setdefault("yaml_file", str(data))
    root = Path(d.get("path") or Path(d.get("yaml_file", ".")).parent)
    for split in ("train", "val", "test"):
        if d.get(split) and not Path(d[split]).is_absolute():
            d[split] = str(root / d[split])
    names = d.get("names") or {0: "object"}
    if isinstance(names, list):
        names = dict(enumerate(names))
    d["names"] = {int(k): v for k, v in names.items()}
    d["nc"] = len(d["names"])
    return d


def img2label_path(img_path: str) -> str:
    """images/xxx.jpg → labels/xxx.txt (reference convention)."""
    sa, sb = f"{Path(img_path).parent.name}", "labels"
    p = Path(img_path)
    parent = p.parent
    if parent.name == "images" or "images" in parent.parts:
        parts = list(p.parts)
        idx = len(parts) - 1 - parts[::-1].index("images")
        parts[idx] = "labels"
        return str(Path(*parts).with_suffix(".txt"))
    return str(p.with_suffix(".txt"))


class YOLODataset:
    """Detection dataset over a directory (or list file) of images."""

    def __init__(self, img_path, imgsz: int = 640, augment: bool = False, hyp=None, stride: int = 32, single_cls: bool = False, fraction: float = 1.0, names=None, cache=None, kpt_shape=None, flip_idx=None, task: str = "detect"):
        self.task = task
        self.img_path = img_path
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        self.stride = stride
        self.single_cls = single_cls
        self.names = names or {}
        self.kpt_shape = tuple(kpt_shape) if kpt_shape else None
        self.flip_idx = list(flip_idx) if flip_idx else None
        self.im_files = self._list_images(img_path, fraction)
        if not self.im_files:
            raise FileNotFoundError(f"no images found in {img_path}")
        # label cache is unconditional, like the reference's .cache files —
        # the cfg `cache` key controls IMAGE caching only (here explicit
        # cache=False in tests still disables it for fixture isolation)
        self.labels = self._load_labels(cache is not False)
        # image RAM cache (ref BaseDataset cache='ram'/True: decoded images
        # kept in memory; 'disk' is pointless here — the label cache already
        # skips re-parsing and imread is the cheap part of the disk path)
        self._im_cache = {} if cache in ("ram", True) else None
        if augment and hyp is not None:
            from yolo_tpu.data.augment import TrainTransforms

            self.transforms = TrainTransforms(self, imgsz, hyp)
        else:
            from yolo_tpu.data.augment import ValTransforms

            self.transforms = ValTransforms(imgsz, stride)

    @staticmethod
    def _list_images(img_path, fraction: float):
        p = Path(img_path)
        if p.is_file() and p.suffix == ".txt":  # list file
            # relative entries resolve against the list file's parent, the
            # yolo convention (ref: data/utils.py replaces './' with it) —
            # resolving against the process cwd breaks every standard dataset
            files = [
                t if Path(t).is_absolute() else str((p.parent / t).resolve())
                for t in (line.strip() for line in p.read_text().splitlines())
                if t
            ]
        elif p.is_dir():
            files = sorted(str(f) for f in p.rglob("*") if f.suffix.lower() in IMG_EXTS)
        else:
            files = sorted(str(f) for f in Path(p.parent).glob(p.name) if f.suffix.lower() in IMG_EXTS)
        n = max(1, int(len(files) * fraction)) if files else 0
        return files[:n]

    def _load_labels(self, cache: bool = True) -> list[dict]:
        """Parse label txts once; cache as json keyed by a file-list hash."""
        label_files = [img2label_path(f) for f in self.im_files]
        # key includes label sizes+mtimes so edited annotations invalidate the
        # cache (the reference hashes sizes for the same reason, ref
        # data/utils.py get_hash); paths alone would serve stale labels forever
        def _sig(p):
            try:
                st = Path(p).stat()
                return f"{st.st_size}:{st.st_mtime_ns}"
            except OSError:
                return "missing"

        stat_sig = ";".join(_sig(lf) for lf in label_files)
        key = hashlib.sha1(
            ("".join(self.im_files + label_files) + stat_sig + str(self.kpt_shape) + self.task + f":sc{self.single_cls}").encode()
        ).hexdigest()[:16]
        cache_path = Path(self.im_files[0]).parent / f".labels_{key}.cache.json"
        if cache and cache_path.exists():
            try:
                raw = json.loads(cache_path.read_text())
                return [
                    {
                        "cls": np.array(r["cls"], np.float32),
                        "bboxes": np.array(r["bboxes"], np.float32).reshape(-1, 4),
                        "segments": [np.array(sg, np.float32).reshape(-1, 2) if sg is not None else None for sg in r["segments"]]
                        if r.get("segments")
                        else None,
                        "keypoints": np.array(r["keypoints"], np.float32).reshape(-1, *self.kpt_shape)
                        if r.get("keypoints") is not None and self.kpt_shape
                        else None,
                        "obb": np.array(r["obb"], np.float32).reshape(-1, 4, 2) if r.get("obb") is not None else None,
                    }
                    for r in raw
                ]
            except Exception:
                pass
        labels = []
        n_missing = 0
        nk = self.kpt_shape[0] * self.kpt_shape[1] if self.kpt_shape else 0
        for lf in label_files:
            cls, boxes, segments, kpts, obbs = [], [], [], [], []
            if Path(lf).exists():
                for line in Path(lf).read_text().splitlines():
                    parts = line.split()
                    if self.task == "obb" and len(parts) == 9:  # DOTA row: cls + 4 corners
                        cls.append(0.0 if self.single_cls else float(parts[0]))
                        corners = np.array([float(x) for x in parts[1:]], np.float32).reshape(4, 2)
                        obbs.append(corners)
                        x1, y1 = corners.min(0)
                        x2, y2 = corners.max(0)
                        boxes.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                        segments.append(None)
                        kpts.append(None)
                    elif nk and len(parts) == 5 + nk:  # pose row: cls cx cy w h kpt1x kpt1y [v1] ...
                        cls.append(0.0 if self.single_cls else float(parts[0]))
                        boxes.append([float(x) for x in parts[1:5]])
                        kpts.append(np.array([float(x) for x in parts[5:]], np.float32).reshape(self.kpt_shape))
                        segments.append(None)
                    elif len(parts) >= 7 and len(parts) % 2 == 1:  # segment row: cls + polygon (≥3 points)
                        cls.append(0.0 if self.single_cls else float(parts[0]))
                        poly = np.array([float(x) for x in parts[1:]], np.float32).reshape(-1, 2)
                        segments.append(poly)
                        x1, y1 = poly.min(0)
                        x2, y2 = poly.max(0)
                        boxes.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                        kpts.append(None)
                    elif len(parts) >= 5:
                        cls.append(0.0 if self.single_cls else float(parts[0]))
                        boxes.append([float(x) for x in parts[1:5]])
                        segments.append(None)
                        kpts.append(None)
            else:
                n_missing += 1
            kp = None
            if self.kpt_shape and any(k is not None for k in kpts):
                kp = np.stack([k if k is not None else np.zeros(self.kpt_shape, np.float32) for k in kpts])
            ob = None
            if self.task == "obb" and obbs:
                ob = np.stack(obbs)  # (n, 4, 2) normalized corners
            labels.append({
                "cls": np.array(cls, np.float32),
                "bboxes": np.array(boxes, np.float32).reshape(-1, 4),
                "segments": segments if any(sg is not None for sg in segments) else None,
                "keypoints": kp,
                "obb": ob,
            })
        if n_missing:
            LOGGER.warning(f"{n_missing}/{len(label_files)} label files missing (treated as background)")
        if cache:
            try:
                cache_path.write_text(
                    json.dumps(
                        [
                            {
                                "cls": l["cls"].tolist(),
                                "bboxes": l["bboxes"].tolist(),
                                "segments": [sg.tolist() if sg is not None else None for sg in l["segments"]]
                                if l.get("segments")
                                else None,
                                "keypoints": l["keypoints"].tolist() if l.get("keypoints") is not None else None,
                                "obb": l["obb"].tolist() if l.get("obb") is not None else None,
                            }
                            for l in labels
                        ]
                    )
                )
            except OSError:
                pass
        return labels

    def __len__(self):
        return len(self.im_files)

    def load_raw(self, i: int) -> dict:
        """Load image i with pixel-space xyxy labels (pre-transform)."""
        import cv2

        from yolo_tpu.utils.files import imread
        im_cache = getattr(self, "_im_cache", None)  # subclasses with own __init__
        if im_cache is not None and i in im_cache:
            img = im_cache[i].copy()  # augs mutate in place
        else:
            img = imread(self.im_files[i])
            if img is None:
                raise FileNotFoundError(self.im_files[i])
            if im_cache is not None:
                im_cache[i] = img.copy()
        h, w = img.shape[:2]
        lb = self.labels[i]
        from yolo_tpu.ops.boxes import xywhn2xyxy

        bboxes = xywhn2xyxy(lb["bboxes"], w=w, h=h) if len(lb["bboxes"]) else np.zeros((0, 4), np.float32)
        out = {"img": img, "cls": lb["cls"].copy(), "bboxes": np.asarray(bboxes, np.float32), "shape": (h, w), "im_file": self.im_files[i]}
        if lb.get("segments"):
            out["segments"] = [sg * np.array([w, h], np.float32) if sg is not None else None for sg in lb["segments"]]
        if lb.get("keypoints") is not None:
            kp = lb["keypoints"].copy()  # (n, nkpt, ndim) normalized → pixels
            kp[..., 0] *= w
            kp[..., 1] *= h
            out["keypoints"] = kp
        if lb.get("obb") is not None:
            out["obb"] = lb["obb"] * np.array([w, h], np.float32)  # corners → pixels
        return out

    def __getitem__(self, i: int) -> dict:
        return self.transforms(self.load_raw(i))

    def close_mosaic(self):
        """Disable mosaic/mixup for final epochs (ref: trainer close_mosaic :381)."""
        if hasattr(self.transforms, "mosaic_enabled"):
            self.transforms.mosaic_enabled = False


def collate_batch(samples: list[dict], max_boxes: int = 64, overlap: bool = True, mask_ratio: int = 4):
    """Stack samples into fixed-shape arrays for the jitted step.

    Returns dict: img (B,H,W,3) uint8, cls (B,N), bboxes (B,N,4) normalized xywh,
    mask_gt (B,N), plus host metadata lists.
    """
    from yolo_tpu.ops.boxes import xyxy2xywhn

    B = len(samples)
    H, W = samples[0]["img"].shape[:2]
    worst = max(len(s["cls"]) for s in samples)
    if worst > max_boxes and not getattr(collate_batch, "_warned", False):
        collate_batch._warned = True
        LOGGER.warning(
            f"collate: an image carries {worst} labels but the static capacity is {max_boxes} — "
            f"extra labels are dropped (raise max_boxes in build_dataloader to keep them)"
        )
    is_obb = any(s.get("obb") is not None for s in samples)
    imgs = np.zeros((B, H, W, 3), np.uint8)
    cls = np.zeros((B, max_boxes), np.float32)
    bboxes = np.zeros((B, max_boxes, 5 if is_obb else 4), np.float32)
    mask = np.zeros((B, max_boxes), np.float32)
    meta = []
    for i, s in enumerate(samples):
        im = s["img"]
        # cv2 loads BGR; emit RGB here (the Format-transform point, ref
        # data/augment.py Format:2073 bgr flip) so train/val/predict all see
        # the same channel order — the per-path flips live only where raw cv2
        # frames enter (predictor/pipeline), never on dataset batches.
        imgs[i] = im[..., ::-1] if im.ndim == 3 else im[..., None].repeat(3, -1)
        n = min(len(s["cls"]), max_boxes)
        if n:
            cls[i, :n] = s["cls"][:n]
            if is_obb:
                from yolo_tpu.ops.boxes import xyxyxyxy2xywhr

                xywhr = xyxyxyxy2xywhr(s["obb"][:n])  # pixel corners → xywhr
                xywhr[:, [0, 2]] /= W
                xywhr[:, [1, 3]] /= H
                bboxes[i, :n] = xywhr
            else:
                bboxes[i, :n] = np.asarray(xyxy2xywhn(s["bboxes"][:n], w=W, h=H), np.float32)
            mask[i, :n] = 1.0
        meta.append({"im_file": s.get("im_file"), "shape": s.get("shape"), "ratio_pad": s.get("ratio_pad")})
    batch = {"img": imgs, "cls": cls, "bboxes": bboxes, "mask_gt": mask, "meta": meta}
    if any(s.get("keypoints") is not None for s in samples):
        ks = next(s["keypoints"].shape[1:] for s in samples if s.get("keypoints") is not None)
        kpts = np.zeros((B, max_boxes, *ks), np.float32)
        for i, s in enumerate(samples):
            kp = s.get("keypoints")
            if kp is None or not len(kp):
                continue
            n = min(len(kp), max_boxes)
            k = kp[:n].copy()  # pixels → normalized, matching batch['bboxes']
            k[..., 0] /= W
            k[..., 1] /= H
            kpts[i, :n] = k
        batch["keypoints"] = kpts
    if any(s.get("segments") for s in samples):
        import cv2

        r = max(int(mask_ratio), 1)  # gt mask downsample (ref Format mask_ratio; default 4 = proto stride)
        mh, mw = H // r, W // r
        if overlap:
            # overlap-index instance map at proto (stride-4) resolution; value
            # = padded label row + 1 (the loss gathers gt masks by that index;
            # ref overlap_mask=True encoding, data/augment.py Format)
            maps = np.zeros((B, mh, mw), np.float32)
            for i, s in enumerate(samples):
                segs = s.get("segments") or []
                polys = [
                    (j, np.round(sg / r).astype(np.int32))
                    for j, sg in enumerate(segs[:max_boxes])
                    if sg is not None and len(sg) >= 3
                ]
                # draw LARGEST FIRST so smaller overlapping instances overwrite
                # and keep their pixels — the reference's add+clip composition
                # (data/utils.py polygons2masks_overlap:360) resolves overlaps
                # the same way; drawing in label order instead would let a big
                # later instance erase a small earlier one entirely
                polys.sort(key=lambda t: -cv2.contourArea(t[1].reshape(-1, 1, 2).astype(np.float32)))
                for j, pts in polys:
                    cv2.fillPoly(maps[i], [pts], float(j + 1))
            batch["masks"] = maps
        else:
            # per-instance binary masks (ref overlap_mask=False): overlapping
            # instances each keep their full mask; fixed (B, N, mh, mw) uint8
            maps = np.zeros((B, max_boxes, mh, mw), np.uint8)
            for i, s in enumerate(samples):
                segs = s.get("segments") or []
                for j, sg in enumerate(segs[:max_boxes]):
                    if sg is None or len(sg) < 3:
                        continue
                    pts = np.round(sg / r).astype(np.int32)
                    cv2.fillPoly(maps[i, j], [pts], 1)
            batch["masks"] = maps
    return batch


class GroundingDataset(YOLODataset):
    """Grounding (caption-span) detection dataset from a COCO-style JSON
    (ref: data/dataset.py GroundingDataset:420).

    Annotations carry `tokens_positive` spans into each image's caption; the
    span text becomes the per-image class name, so every image has its own
    `texts` list (consumed by YOLO-World/YOLOE text-prompt training).
    """

    def __init__(self, img_path, json_file: str, imgsz: int = 640, augment: bool = False,
                 hyp=None, stride: int = 32, fraction: float = 1.0, task: str = "detect"):
        self.task = task
        self.img_path = img_path
        self.json_file = json_file
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        self.stride = stride
        self.single_cls = False
        self.names = {}
        self.kpt_shape = None
        self.flip_idx = None
        self.im_files, self.labels = self._load_grounding(json_file, img_path, fraction)
        if not self.im_files:
            raise FileNotFoundError(f"no annotated images found via {json_file}")
        self.names = {i: t[0] for i, t in enumerate(self.labels[0]["texts"])}  # global span vocabulary
        if augment and hyp is not None:
            from yolo_tpu.data.augment import TrainTransforms

            self.transforms = TrainTransforms(self, imgsz, hyp)
        else:
            from yolo_tpu.data.augment import ValTransforms

            self.transforms = ValTransforms(imgsz, stride)

    @staticmethod
    def _load_grounding(json_file, img_root, fraction: float = 1.0):
        """Parse the grounding json → (im_files, labels-with-texts)
        (ref: GroundingDataset.cache_labels — same box/caption-span math)."""
        from collections import defaultdict

        ann_data = json.loads(Path(json_file).read_text())
        images = {int(im["id"]): im for im in ann_data["images"]}
        img_to_anns = defaultdict(list)
        for ann in ann_data["annotations"]:
            img_to_anns[int(ann["image_id"])].append(ann)

        im_files, labels = [], []
        # ONE dataset-global class-id space (span text -> id). Per-image id
        # spaces would be corrupted by any multi-image augmentation (mosaic/
        # mixup concatenate cls arrays across images), silently assigning
        # boxes to the wrong caption span.
        cat2id: dict = {}
        texts: list = []
        for img_id, anns in sorted(img_to_anns.items()):
            img = images[img_id]
            h, w = img["height"], img["width"]
            im_file = Path(img_root) / img["file_name"]
            if not im_file.exists():
                continue
            caption = img.get("caption", "")
            cls, boxes = [], []
            for ann in anns:
                if ann.get("iscrowd"):
                    continue
                box = np.array(ann["bbox"], np.float32)  # ltwh pixels
                box[:2] += box[2:] / 2  # → center xywh
                box[[0, 2]] /= float(w)
                box[[1, 3]] /= float(h)
                if box[2] <= 0 or box[3] <= 0:
                    continue
                cat_name = " ".join(caption[t[0] : t[1]] for t in ann["tokens_positive"]).lower().strip()
                if not cat_name:
                    continue
                if cat_name not in cat2id:
                    cat2id[cat_name] = len(cat2id)
                    texts.append([cat_name])
                cls.append(float(cat2id[cat_name]))
                boxes.append(box.tolist())
            im_files.append(str(im_file))
            labels.append({
                "cls": np.array(cls, np.float32),
                "bboxes": np.array(boxes, np.float32).reshape(-1, 4),
                "segments": None,
                "keypoints": None,
                "obb": None,
                "texts": texts,  # the shared global list — ids index into it
            })
        n = max(1, int(len(im_files) * fraction)) if im_files else 0
        return im_files[:n], labels[:n]

    def load_raw(self, i: int) -> dict:
        out = super().load_raw(i)
        out["texts"] = self.labels[i].get("texts", [])
        return out
