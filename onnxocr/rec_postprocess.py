"""Reference surface: onnxocr/rec_postprocess.py → CTCLabelDecode."""
from onnxocr_tpu.ops.ctc import CTCLabelDecode

__all__ = ["CTCLabelDecode"]
