"""Reference surface: onnxocr/rec_postprocess.py."""
from onnxocr_tpu.ops.ctc import CTCLabelDecode, DistillationCTCLabelDecode

__all__ = ["CTCLabelDecode", "DistillationCTCLabelDecode"]
