"""onnxocr_tpu — a TPU-native OCR engine (JAX/XLA/Pallas) with the public
surface of ding113/OnnxOCR: the det→crop→cls→rec PaddleOCR pipeline, the
ONNXPaddleOcr API, batch image/PDF processing, and the v1/v2 HTTP services.
"""
__version__ = "0.1.0"

from .pipeline.api import ONNXPaddleOcr, sav2Img
from .pipeline.system import TextSystem, sorted_boxes

__all__ = ["ONNXPaddleOcr", "sav2Img", "TextSystem", "sorted_boxes"]
