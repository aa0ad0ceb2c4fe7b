"""Diagnose 00018069/french_0 misses: det-only box counts vs drop_score."""
import sys, time, threading
import numpy as np, cv2
import onnxocr_tpu  # noqa
from onnxocr_tpu import ONNXPaddleOcr

def absorb():
    import jax; np.asarray(jax.device_put(np.ones(8, np.uint8)))
threading.Thread(target=absorb, daemon=True).start()

m0 = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False, drop_score=0.0)
for f in ("00018069.jpg", "french_0.jpg", "00015504.jpg"):
    img = cv2.imread("/root/reference/onnxocr/test_images/" + f)
    boxes = m0.ocr(img, det=True, rec=False)[0]
    res = m0.ocr(img)[0]
    score_ge = sum(1 for r in res if r[1][1] >= 0.5)
    print(f, "det boxes:", len(boxes), "| rec lines(drop0):", len(res),
          "| conf>=0.5:", score_ge, flush=True)
    lows = [(r[1][0], round(float(r[1][1]), 2)) for r in res if r[1][1] < 0.5]
    print("  low-conf:", lows[:12], flush=True)
