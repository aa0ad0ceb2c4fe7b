"""Public API: ONNXPaddleOcr — drop-in compatible with the reference class
(onnxocr/onnx_paddleocr.py:10-61), including the result nesting and the
det/rec/cls kwarg semantics.
"""
from __future__ import annotations

from typing import Any, List

import numpy as np

from .. import config as cfg_mod
from .system import TextSystem


class ONNXPaddleOcr(TextSystem):
    def __init__(self, **kwargs):
        params = cfg_mod.make_params()
        # Quirk #1 (SURVEY.md §7): rec_image_shape is force-set BEFORE the
        # kwargs overlay (reference onnx_paddleocr.py:20-23).
        params.rec_image_shape = "3, 48, 320"
        params.__dict__.update(**kwargs)
        super().__init__(params)

    def ocr(self, img, det: bool = True, rec: bool = True, cls: bool = True):
        if cls and not self.use_angle_cls:
            print("Since the angle classifier is not initialized, "
                  "the angle classifier will not be uesd during the forward "
                  "process")

        if det and rec:
            ocr_res = []
            dt_boxes, rec_res = self.__call__(img, cls)
            tmp_res = [[np.asarray(box).tolist(), res]
                       for box, res in zip(dt_boxes, rec_res)]
            ocr_res.append(tmp_res)
            return ocr_res
        elif det and not rec:
            ocr_res = []
            dt_boxes = self.text_detector(img)
            tmp_res = [np.asarray(box).tolist() for box in dt_boxes]
            ocr_res.append(tmp_res)
            return ocr_res
        else:
            ocr_res = []
            cls_res = []
            if not isinstance(img, list):
                img = [img]
            if self.use_angle_cls and cls:
                img, cls_res_tmp = self.text_classifier(img)
                if not rec:
                    cls_res.append(cls_res_tmp)
            rec_res = self.text_recognizer(img)
            ocr_res.append(rec_res)
            if not rec:
                return cls_res
            return ocr_res


def sav2Img(org_img, result, name: str = "draw_ocr.jpg"):
    """Render boxes + texts next to the image (reference
    onnx_paddleocr.py:64-77)."""
    from PIL import Image
    from ..utils.draw import draw_ocr
    result = result[0]
    image = org_img[:, :, ::-1]
    boxes = [line[0] for line in result]
    txts = [line[1][0] for line in result]
    scores = [line[1][1] for line in result]
    im_show = draw_ocr(image, boxes, txts, scores)
    Image.fromarray(im_show).save(name)
