"""Reference surface: onnxocr/db_postprocess.py."""
from onnxocr_tpu.ops.db_post import DBPostProcess, DistillationDBPostProcess

__all__ = ["DBPostProcess", "DistillationDBPostProcess"]
