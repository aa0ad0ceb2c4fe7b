"""Reference surface: onnxocr/onnx_paddleocr.py → ONNXPaddleOcr, sav2Img."""
from onnxocr_tpu.pipeline.api import ONNXPaddleOcr, sav2Img

__all__ = ["ONNXPaddleOcr", "sav2Img"]
