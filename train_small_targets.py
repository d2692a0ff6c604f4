#!/usr/bin/env python3
"""IR small-target training recipe (parity script, ref: train_small_targets.py:16-131).

Same hyperparameters as the fork's recipe for 640×512 infrared imagery:
grayscale-safe augmentation (hsv_h=hsv_s=0, hsv_v=0.3), no geometric distortion
(degrees/shear/perspective=0), light mosaic (0.3) + copy_paste (0.15),
AdamW-style low LR (lr0=8e-4), and small-target-friendly val thresholds
(conf=0.15, iou=0.6).
"""

from yolo_tpu import YOLO


def train_small_target_model(data="yolo_dataset/dataset.yaml", **overrides):
    """Train the P2 small-target model with the IR recipe."""
    model = YOLO("yolov8-small.yaml")
    cfg = dict(
        data=data,
        epochs=150,          # IR features need longer training
        patience=30,
        batch=16,
        imgsz=640,           # 640×512 letterboxes to 640×640
        # LR schedule tuned for IR
        optimizer="AdamW",
        lr0=0.0008,
        lrf=0.005,
        momentum=0.95,
        weight_decay=0.0008,
        warmup_epochs=5,
        # grayscale-safe augmentation
        hsv_h=0.0,
        hsv_s=0.0,
        hsv_v=0.3,           # IR intensity jitter only
        degrees=0.0,
        translate=0.05,
        scale=0.2,
        shear=0.0,
        perspective=0.0,
        flipud=0.1,
        fliplr=0.5,
        mosaic=0.3,          # light mosaic: keeps small targets intact
        mixup=0.0,
        copy_paste=0.15,     # paste extra small targets
        close_mosaic=20,
        # small-target thresholds
        conf=0.15,
        iou=0.6,
        project="small_target_detection",
        name="yolov8_small_aircraft",
    )
    cfg.update(overrides)
    results = model.train(**cfg)
    return model, results


def validate_model(weights="small_target_detection/yolov8_small_aircraft/weights/best.npz", data="yolo_dataset/dataset.yaml", **overrides):
    """Validate a trained checkpoint at the recipe thresholds."""
    model = YOLO(weights)
    return model.val(data=data, imgsz=640, conf=0.15, iou=0.6, **overrides)


def predict_small_targets(weights, source, conf: float = 0.15, **overrides):
    """Run small-target inference (low conf — tiny targets score low)."""
    model = YOLO(weights)
    return model.predict(source, conf=conf, imgsz=640, **overrides)


if __name__ == "__main__":
    import sys

    data = sys.argv[1] if len(sys.argv) > 1 else "yolo_dataset/dataset.yaml"
    train_small_target_model(data)
