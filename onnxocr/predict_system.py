"""Reference surface: onnxocr/predict_system.py → TextSystem, sorted_boxes."""
from onnxocr_tpu.pipeline.system import TextSystem, sorted_boxes

__all__ = ["TextSystem", "sorted_boxes"]
