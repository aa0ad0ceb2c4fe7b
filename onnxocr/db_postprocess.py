"""Reference surface: onnxocr/db_postprocess.py → DBPostProcess."""
from onnxocr_tpu.ops.db_post import DBPostProcess

__all__ = ["DBPostProcess"]
