"""Reference surface: onnxocr/predict_det.py → TextDetector."""
from onnxocr_tpu.pipeline.detector import TextDetector

__all__ = ["TextDetector"]
