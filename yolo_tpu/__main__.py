"""``python -m yolo_tpu`` — the ``yolo`` CLI without installation."""

from yolo_tpu.cfg import entrypoint

if __name__ == "__main__":
    entrypoint()
