"""Result visualization: boxes overlay + text panel.

Mirrors the *visual contract* of the reference renderer (onnxocr/utils.py:
91-235): red quad outlines on the image, and a white side panel listing
"N: text  score" rows at 20px font, wrapped to the panel width and
paginated into extra panels stacked horizontally. The layout constants
(wrap budget ``img_w//font_size - 4``, row pitch ``font_size + 5``) are
kept so outputs look the same; the implementation is a two-phase
wrap-then-paint design of our own.

The bundled font (simfang.ttf) is a missing large blob in the reference
snapshot (.MISSING_LARGE_BLOBS:1); we fall back to any available system/PIL
font so visualization degrades gracefully instead of crashing.
"""
from __future__ import annotations

import math
import string
from typing import List, Optional, Tuple

import numpy as np

from .image import resize_img
from .. import config as cfg_mod

_FONT_SIZE = 20
_ROW_PITCH = _FONT_SIZE + 5
_INK = (0, 0, 0)


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
    """Display-width heuristic (reference utils.py:91-113 semantics):
    fullwidth glyphs weigh 1, halfwidth latin/digits/whitespace weigh 1/2
    (rounded up as a group)."""
    text = str(s)
    halfwidth = sum(1 for c in text
                    if c in string.ascii_letters or c.isdigit()
                    or c.isspace())
    return len(text) - math.ceil(halfwidth / 2)


def _wrap_rows(texts: List[str], scores, threshold: float, budget: int
               ) -> List[str]:
    """Flatten (text, score) pairs into display rows: the first row of an
    entry is numbered, continuation rows are indented, and the last row
    carries the score."""
    rows: List[str] = []
    shown = 0
    for txt, score in zip(texts, scores):
        if score < threshold or math.isnan(score):
            continue
        shown += 1
        head = True
        remaining = str(txt)
        while str_count(remaining) >= budget:
            piece, remaining = remaining[:budget], remaining[budget:]
            rows.append((f"{shown}: " if head else "    ") + piece)
            head = False
        if head:
            rows.append(f"{shown}: {remaining}   {score:.3f}")
        else:
            rows.append(f"  {remaining}  {score:.3f}")
    return rows


def text_visual(texts: List[str], scores, img_h: int = 400, img_w: int = 600,
                threshold: float = 0.0, font_path: Optional[str] = None
                ) -> np.ndarray:
    """Render recognized texts into one or more (img_h, img_w) panels,
    concatenated horizontally when the rows overflow one panel."""
    from PIL import Image, ImageDraw
    if scores is not None:
        assert len(texts) == len(scores), \
            "The number of txts and corresponding scores must match"

    font = _load_font(font_path, _FONT_SIZE)
    budget = img_w // _FONT_SIZE - 4
    rows = _wrap_rows(texts, scores, threshold, budget)
    rows_per_panel = max(1, img_h // _ROW_PITCH - 1)

    def paint(panel_rows: List[str]) -> np.ndarray:
        # white panel with a 1px black right border separating panels
        canvas = Image.new("RGB", (img_w, img_h), (255, 255, 255))
        pen = ImageDraw.Draw(canvas)
        pen.rectangle([(img_w - 1, 0), (img_w - 1, img_h - 1)], fill=_INK)
        for r, row in enumerate(panel_rows, start=1):
            pen.text((0, _ROW_PITCH * r), row, _INK, font=font)
        return np.asarray(canvas)

    panels = [paint(rows[i:i + rows_per_panel])
              for i in range(0, len(rows), rows_per_panel)] or [paint([])]
    if len(panels) == 1:
        return panels[0]
    return np.concatenate(panels, axis=1)


def draw_ocr(image, boxes, txts=None, scores=None, drop_score: float = 0.5,
             font_path: Optional[str] = None) -> np.ndarray:
    """Overlay red quad outlines; when txts are given, resize the image to
    600px and append the text panel on the right (reference
    utils.py:195-235 behavior)."""
    import cv2
    image = np.array(image)
    if scores is None:
        scores = [1] * len(boxes)
    for quad, score in zip(boxes, scores):
        if score < drop_score or math.isnan(score):
            continue
        pts = np.asarray(quad, dtype=np.int64).reshape(-1, 1, 2)
        image = cv2.polylines(image, [pts], True, (255, 0, 0), 2)
    if txts is None:
        return image
    img = np.array(resize_img(image, input_size=600))
    panel = text_visual(txts, scores, img_h=img.shape[0], img_w=600,
                        threshold=drop_score, font_path=font_path)
    return np.concatenate([img, panel], axis=1)
