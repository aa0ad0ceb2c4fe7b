"""One long-lived TPU session: profile pipeline stages, then smoke-train."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import warnings
warnings.filterwarnings("ignore")
import numpy as np
import cv2
import jax

import onnxocr_tpu  # enables compile cache
import bench
from onnxocr_tpu import ONNXPaddleOcr
from onnxocr_tpu.ops import det_pre
import onnxocr_tpu.pipeline.system as system_mod

def log(*a):
    print(*a, flush=True)

t0 = time.time()
import jax.numpy as jnp
_ = jnp.zeros((4,)).sum().block_until_ready()
log("first-op latency:", round(time.time() - t0, 1), "s")

img = cv2.imread("/root/reference/onnxocr/test_images/1.jpg")
model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False, drop_score=0.0)
det = model.text_detector
rh, rw = det_pre.det_resize_target(img.shape[0], img.shape[1],
                                   det.limit_side_len, det.limit_type)
synth = bench.synthetic_text_map(img, rh, rw)
orig = det.infer_prob_map
det.infer_prob_map = lambda im: (synth, orig(im)[1])

t0 = time.time()
res = model.ocr(img)
log("warm ocr (compiles):", round(time.time() - t0, 1), "s boxes:",
    len(res[0]))
for _ in range(3):
    t0 = time.time()
    model.ocr(img)
    log("steady ocr ms:", round((time.time() - t0) * 1000, 1))

for trial in range(2):
    t = {}
    t0 = time.time()
    padded, shape_info, _sz = det_pre.prepare_det_input(
        img, det.limit_side_len, det.limit_type, det.bucket)
    t["host_resize_pad"] = time.time() - t0
    t0 = time.time()
    prob_padded = det.forward(padded)
    prob_padded.block_until_ready()
    t["det_fwd"] = time.time() - t0
    t0 = time.time()
    _ = np.asarray(prob_padded)
    t["map_download"] = time.time() - t0
    t0 = time.time()
    post = det.postprocess_op({"maps": synth[None, None]}, shape_info[None])
    dt_boxes = det.filter_tag_det_res(post[0]["points"], img.shape)
    t["db_post"] = time.time() - t0
    t0 = time.time()
    dt_boxes2 = system_mod.sorted_boxes(dt_boxes)
    quads = np.asarray(dt_boxes2, dtype=np.float32)
    image_dev = jax.device_put(np.ascontiguousarray(img))
    image_dev.block_until_ready()
    t["img_upload"] = time.time() - t0
    t0 = time.time()
    rot180, _cls = model.text_classifier.run_boxes(image_dev, quads)
    t["cls"] = time.time() - t0
    t0 = time.time()
    rec_res = model.text_recognizer.run_boxes(image_dev, quads, rot180)
    t["rec"] = time.time() - t0
    log({k: round(v * 1000, 1) for k, v in t.items()},
        "total", round(sum(t.values()) * 1000, 1), "nboxes", len(quads))

# ---- smoke-train rec 30 steps
log("=== rec train smoke ===")
from tools.train_synthetic import train_rec
train_rec(30, 32, 320, 1e-3, "/tmp/rec_smoke.npz")
log("ALL DONE")
