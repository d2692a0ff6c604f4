"""Functional NN core: YAML→module-tree compiler and JAX modules."""

from yolo_tpu.nn.tasks import DetectionModel, parse_model, yaml_model_load

__all__ = ["DetectionModel", "parse_model", "yaml_model_load"]
