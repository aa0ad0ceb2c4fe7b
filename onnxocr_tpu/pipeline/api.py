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
        # explicit-kwarg record: checkpoint calibration defers to these
        params._user_keys = set(kwargs)
        super().__init__(params)

    def ocr(self, img, det: bool = True, rec: bool = True, cls: bool = True):
        """Result shapes (all wrapped in a one-element outer list, quirk
        #1/#5/#9 in SURVEY.md §7):

        det+rec      → [[[box_as_lists, (text, score)], ...]]
        det only     → [[box_as_lists, ...]]   (unfiltered by drop_score)
        cls+rec/rec  → [[(text, score), ...]]  over a crop list
        cls only     → [[(label, prob), ...]]
        """
        if cls and not self.use_angle_cls:
            # observable stdout contract, typo included ("uesd"):
            # reference onnx_paddleocr.py:31-33
            print("Since the angle classifier is not initialized, "
                  "the angle classifier will not be uesd during the forward "
                  "process")

        if det:
            if not rec:
                return [[np.asarray(b).tolist()
                         for b in self.text_detector(img)]]
            boxes, texts = self(img, cls)
            return [[[np.asarray(b).tolist(), t]
                     for b, t in zip(boxes, texts)]]

        # detector off: the input is a crop (or list of crops)
        crops = img if isinstance(img, list) else [img]
        if self.use_angle_cls and cls:
            crops, verdicts = self.text_classifier(crops)
            if not rec:
                return [verdicts]
        if not rec:
            # quirk: rec=False without an active classifier yields [] —
            # the reference returns its (empty) cls result list here
            return []
        return [self.text_recognizer(crops)]


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
