"""Reference surface: onnxocr/cls_postprocess.py → ClsPostProcess."""
from onnxocr_tpu.ops.ctc import ClsPostProcess

__all__ = ["ClsPostProcess"]
