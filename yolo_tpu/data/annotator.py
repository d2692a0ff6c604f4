"""Auto-annotation: YOLO detections prompt SAM into segment labels.

Counterpart of the reference's annotator (ref: ultralytics/data/annotator.py
auto_annotate:10): run a detector over a folder, feed each image's boxes to a
SAM model as box prompts, and write YOLO-format polygon labels.
"""

from __future__ import annotations

from pathlib import Path

from yolo_tpu.utils import LOGGER


def auto_annotate(
    data,
    det_model="yolov8-small.yaml",
    sam_model: str = "sam_b",
    conf: float = 0.25,
    iou: float = 0.45,
    imgsz: int = 640,
    max_det: int = 300,
    classes=None,
    output_dir=None,
    sam_weights=None,
) -> Path:
    """Annotate every image in `data` with SAM polygons seeded by YOLO boxes.

    Args:
        data: folder of images to annotate.
        det_model: detector — a YOLO facade instance, or a name/path for one
            (yaml / .pt / .npz checkpoint).
        sam_model: SAM variant for the in-repo facade (sam_b/sam_l/mobile_sam/...),
            or a ready SAM instance.
        conf / iou / imgsz / max_det / classes: detector settings.
        output_dir: label output directory (default `<data>_auto_annotate_labels`).
        sam_weights: optional released SAM checkpoint (.pt) to import.

    Returns:
        The output labels directory.
    """
    from yolo_tpu.engine.model import YOLO
    from yolo_tpu.models import SAM

    det = det_model if hasattr(det_model, "predict") else YOLO(det_model)
    sam = sam_model if hasattr(sam_model, "predict") else SAM(sam_model)
    if sam_weights:
        sam.load_torch(sam_weights)

    data = Path(data)
    output_dir = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    output_dir.mkdir(exist_ok=True, parents=True)

    results = det.predict(str(data), stream=True, conf=conf, iou=iou, imgsz=imgsz,
                          max_det=max_det, classes=classes, verbose=False)
    n = 0
    for result in results:
        class_ids = [int(c) for c in result.boxes.cls]
        lines = []
        if class_ids:
            seg = sam.predict(result.orig_img[..., ::-1], bboxes=result.boxes.xyxy,
                              multimask_output=False)
            for cid, s in zip(class_ids, seg.masks.xyn):
                if s.size:
                    lines.append(f"{cid} " + " ".join(map(str, s.reshape(-1).tolist())))
        if lines:
            out = output_dir / f"{Path(result.path).stem}.txt"
            out.write_text("\n".join(lines) + "\n", encoding="utf-8")
            n += 1
    LOGGER.info(f"auto-annotated {n} images -> {output_dir}")
    return output_dir
