"""End-to-end smoke script, byte-compatible with the reference's test_ocr.py:
load the PP-OCRv5 pipeline (angle cls on), OCR one bundled test image, print
timing + results, save the rendered overlay.
"""
import os
import sys
import time

import cv2

from onnxocr_tpu import ONNXPaddleOcr, sav2Img


def find_test_image():
    candidates = [
        "onnxocr_tpu/test_images/715873facf064583b44ef28295126fa7.jpg",
        "/root/reference/onnxocr/test_images/715873facf064583b44ef28295126fa7.jpg",
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    print("no test image found", file=sys.stderr)
    sys.exit(1)


model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False)

img = cv2.imread(find_test_image())
s = time.time()
result = model.ocr(img)
e = time.time()
print("total time: {:.3f}".format(e - s))
print("result:", result[0][:5], "..." if len(result[0]) > 5 else "")

sav2Img(img, result)
print("saved draw_ocr.jpg")
