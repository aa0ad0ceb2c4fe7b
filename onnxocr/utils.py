"""Reference surface: onnxocr/utils.py — geometry/viz helpers and the
infer_args() defaults registry (argparse parser built from the same flag
table the TPU config uses, onnxocr_tpu/config.py)."""
import argparse

from onnxocr_tpu.config import DEFAULTS, str2bool
from onnxocr_tpu.utils.image import (get_rotate_crop_image,
                                     get_minarea_rect_crop, resize_img,
                                     base64_to_cv2)
from onnxocr_tpu.utils.draw import draw_ocr, text_visual, str_count

__all__ = ["infer_args", "str2bool", "get_rotate_crop_image",
           "get_minarea_rect_crop", "resize_img", "base64_to_cv2",
           "draw_ocr", "text_visual", "str_count"]


def infer_args() -> argparse.ArgumentParser:
    """Defaults-registry parser with the reference's flag names
    (onnxocr/utils.py:251-387); ONNXPaddleOcr harvests parser._actions."""
    parser = argparse.ArgumentParser()
    for name, default in DEFAULTS.items():
        kwargs = {"default": default}
        if isinstance(default, bool):
            kwargs["type"] = str2bool
        elif isinstance(default, int):
            kwargs["type"] = int
        elif isinstance(default, float):
            kwargs["type"] = float
        elif isinstance(default, str):
            kwargs["type"] = str
        parser.add_argument(f"--{name}", **kwargs)
    return parser
