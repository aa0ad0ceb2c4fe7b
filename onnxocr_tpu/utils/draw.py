"""Result visualization: boxes overlay + text panel.

Reference: onnxocr/utils.py:91-235 (draw_ocr, text_visual, str_count). The
bundled font (simfang.ttf) is a missing large blob in the reference snapshot
(.MISSING_LARGE_BLOBS:1); we fall back to any available system/PIL font so
visualization degrades gracefully instead of crashing.
"""
from __future__ import annotations

import math
import string
from typing import List, Optional

import numpy as np

from .image import resize_img
from .. import config as cfg_mod


def _load_font(font_path: Optional[str], size: int):
    from PIL import ImageFont
    candidates = [font_path] if font_path else []
    candidates += [
        cfg_mod.find_asset("fonts/simfang.ttf"),
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    ]
    for cand in candidates:
        if not cand:
            continue
        try:
            return ImageFont.truetype(cand, size, encoding="utf-8")
        except OSError:
            continue
    from PIL import ImageFont as _IF
    return _IF.load_default()


def str_count(s) -> int:
    """Width heuristic: CJK chars count 1, latin/digit/space count 1/2
    (reference utils.py:91-113)."""
    count_zh = count_pu = 0
    s_len = len(str(s))
    en_dg_count = 0
    for c in str(s):
        if c in string.ascii_letters or c.isdigit() or c.isspace():
            en_dg_count += 1
        elif c.isalpha():
            count_zh += 1
        else:
            count_pu += 1
    return s_len - math.ceil(en_dg_count / 2)


def text_visual(texts: List[str], scores, img_h: int = 400, img_w: int = 600,
                threshold: float = 0.0, font_path: Optional[str] = None
                ) -> np.ndarray:
    from PIL import Image, ImageDraw
    if scores is not None:
        assert len(texts) == len(scores), \
            "The number of txts and corresponding scores must match"

    def create_blank_img():
        # (uint8 here; the reference's int8*255 trips numpy>=2 overflow
        # checks — the intent is a white panel with a black right border)
        blank = np.full((img_h, img_w), 255, dtype=np.uint8)
        blank[:, img_w - 1:] = 0
        blank = Image.fromarray(blank).convert("RGB")
        return blank, ImageDraw.Draw(blank)

    blank_img, draw_txt = create_blank_img()
    font_size = 20
    txt_color = (0, 0, 0)
    font = _load_font(font_path, font_size)
    gap = font_size + 5
    txt_img_list = []
    count, index = 1, 0
    for idx, txt in enumerate(texts):
        index += 1
        if scores[idx] < threshold or math.isnan(scores[idx]):
            index -= 1
            continue
        first_line = True
        while str_count(txt) >= img_w // font_size - 4:
            tmp = txt
            txt = tmp[: img_w // font_size - 4]
            if first_line:
                new_txt = str(index) + ": " + txt
                first_line = False
            else:
                new_txt = "    " + txt
            draw_txt.text((0, gap * count), new_txt, txt_color, font=font)
            txt = tmp[img_w // font_size - 4:]
            if count >= img_h // gap - 1:
                txt_img_list.append(np.array(blank_img))
                blank_img, draw_txt = create_blank_img()
                count = 0
            count += 1
        if first_line:
            new_txt = f"{index}: {txt}   {scores[idx]:.3f}"
        else:
            new_txt = f"  {txt}  {scores[idx]:.3f}"
        draw_txt.text((0, gap * count), new_txt, txt_color, font=font)
        if count >= img_h // gap - 1 and idx + 1 < len(texts):
            txt_img_list.append(np.array(blank_img))
            blank_img, draw_txt = create_blank_img()
            count = 0
        count += 1
    txt_img_list.append(np.array(blank_img))
    if len(txt_img_list) == 1:
        return np.array(txt_img_list[0])
    return np.concatenate(txt_img_list, axis=1)


def draw_ocr(image, boxes, txts=None, scores=None, drop_score: float = 0.5,
             font_path: Optional[str] = None) -> np.ndarray:
    """Overlay polylines; append text panel when txts given
    (reference utils.py:195-235)."""
    import cv2
    if scores is None:
        scores = [1] * len(boxes)
    for i in range(len(boxes)):
        if scores is not None and (scores[i] < drop_score or
                                   math.isnan(scores[i])):
            continue
        box = np.reshape(np.array(boxes[i]), [-1, 1, 2]).astype(np.int64)
        image = cv2.polylines(np.array(image), [box], True, (255, 0, 0), 2)
    if txts is not None:
        img = np.array(resize_img(image, input_size=600))
        txt_img = text_visual(txts, scores, img_h=img.shape[0], img_w=600,
                              threshold=drop_score, font_path=font_path)
        return np.concatenate([np.array(img), np.array(txt_img)], axis=1)
    return image
