"""A/B det knobs on the miss images: limit_side_len and box_thresh."""
import threading
import numpy as np, cv2
import onnxocr_tpu  # noqa
from onnxocr_tpu import ONNXPaddleOcr

def absorb():
    import jax; np.asarray(jax.device_put(np.ones(8, np.uint8)))
threading.Thread(target=absorb, daemon=True).start()

imgs = {f: cv2.imread("/root/reference/onnxocr/test_images/" + f)
        for f in ("00018069.jpg", "french_0.jpg", "ger_1.jpg")}
for kw in ({}, {"det_db_box_thresh": 0.4}, {"det_limit_side_len": 1536},
           {"det_limit_side_len": 1536, "det_db_box_thresh": 0.4},
           {"det_db_thresh": 0.2, "det_db_box_thresh": 0.4}):
    m = ONNXPaddleOcr(use_angle_cls=False, use_gpu=False, **kw)
    counts = {f: len(m.ocr(im, det=True, rec=False)[0]) for f, im in imgs.items()}
    print(kw, counts, flush=True)
    del m
