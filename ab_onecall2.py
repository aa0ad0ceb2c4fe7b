"""A/B the onecall (K_rec, K_det) budgets on the real TPU.

For each config: warm the dominant-bucket program, replay its device ms,
and time a small pipelined round over the dominant-bucket pages.
Prints one JSON line per config.
"""
import concurrent.futures
import glob
import json
import statistics
import sys
import threading
import time

import numpy as np
import cv2

import onnxocr_tpu  # noqa: F401
from onnxocr_tpu import ONNXPaddleOcr
from onnxocr_tpu.ops import resize_dev
from onnxocr_tpu.utils import profiling


def note(m):
    print(m, file=sys.stderr, flush=True)


def absorb():
    import jax
    t0 = time.monotonic()
    np.asarray(jax.device_put(np.ones(128, np.uint8)))
    note("first-download absorbed %.1fs" % (time.monotonic() - t0))


threading.Thread(target=absorb, daemon=True).start()

paths = sorted(glob.glob("/root/reference/onnxocr/test_images/*.jpg") +
               glob.glob("/root/reference/onnxocr/test_images/*.png"))
images = [im for im in (cv2.imread(p) for p in paths) if im is not None]
buckets = {}
for im in images:
    buckets.setdefault(resize_dev.src_bucket_shape(*im.shape[:2]),
                       []).append(im)
key, grp = max(buckets.items(), key=lambda kv: len(kv[1]))
note("dominant bucket %s: %d images" % (key, len(grp)))

CONFIGS = [(32, 1024), (48, 1024), (64, 1024)]

for k_rec, k_det in CONFIGS:
    t0 = time.monotonic()
    model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                          tpu_det_microbatch=False, tpu_rec_microbatch=False,
                          tpu_pipeline="onecall",
                          tpu_onecall_max_boxes=k_rec,
                          tpu_onecall_det_candidates=k_det)
    profiling.CAPTURE.enabled = True
    nbox = []
    for im in grp[:3]:
        nbox.append(len(model.ocr(im)[0]))
    warm_s = time.monotonic() - t0
    dev_ms = profiling.CAPTURE.replay_ms("onecall", n=6)
    # pipelined mini-rounds over the dominant bucket
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        list(pool.map(model.ocr, grp))  # replay warm
    ips = []
    for _ in range(3):
        t1 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            res = list(pool.map(model.ocr, grp))
        ips.append(len(grp) / (time.perf_counter() - t1))
    allbox = [len(r[0]) for r in res]
    print(json.dumps({
        "k_rec": k_rec, "k_det": k_det,
        "device_ms": dev_ms, "warm_s": round(warm_s, 1),
        "round_ips": [round(x, 2) for x in ips],
        "median_ips": round(statistics.median(ips), 2),
        "boxes": allbox}), flush=True)
    del model
