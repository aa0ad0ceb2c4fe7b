"""Reference surface: onnxocr/predict_cls.py → TextClassifier."""
from onnxocr_tpu.pipeline.classifier import TextClassifier

__all__ = ["TextClassifier"]
