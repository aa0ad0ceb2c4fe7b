"""Reference surface: onnxocr/predict_rec.py → TextRecognizer."""
from onnxocr_tpu.pipeline.recognizer import TextRecognizer

__all__ = ["TextRecognizer"]
