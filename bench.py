"""End-to-end OCR throughput benchmark on one TPU chip.

Prints ONE JSON line:
  {"metric": "e2e_images_per_sec", "value": N, "unit": "images/sec/chip",
   "vs_baseline": N, ...}

Pipeline measured: full det forward (device) → DB postprocess → device
crop-warp + angle cls (real PP-OCRv5 weights) → device rec forward + CTC
decode, over the bundled reference test images — i.e. the complete
det+cls+rec path of ONNXPaddleOcr.ocr().

Baseline: the reference publishes ~200-500 ms/image on CPU onnxruntime
(docs/API_REFERENCE.md:339; BASELINE.md) → 3.33 images/sec at the 300 ms
midpoint. vs_baseline = value / 3.33.

Weights caveat: the reference snapshot ships no det/rec .onnx blobs
(.MISSING_LARGE_BLOBS). The det/rec networks therefore run with their real
architectures (real FLOPs) but untrained weights; to keep the measured
*postprocess + crop + cls + rec* work realistic, the det probability map fed
to box extraction is substituted with a text-region map derived from image
gradients (computed OUTSIDE the timed loop — it stands in for the missing
trained weights, not for pipeline work). When real weights are staged in
onnxocr_tpu/assets/, the substitution is skipped automatically and the mode
field reports "real-weights".
"""
import glob
import json
import os
import sys
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")

IMAGES_DIR = None
for cand in ("onnxocr_tpu/test_images", "/root/reference/onnxocr/test_images"):
    if os.path.isdir(cand):
        IMAGES_DIR = cand
        break

BASELINE_IPS = 1.0 / 0.3  # reference CPU midpoint (BASELINE.md)


def synthetic_text_map(img, rh, rw):
    """Gradient-based text-region map at det-output resolution, shrunk the
    way DB shrink maps are (so unclip 1.5 re-expands sensibly)."""
    import cv2
    gray = cv2.cvtColor(cv2.resize(img, (rw, rh)), cv2.COLOR_BGR2GRAY)
    grad = cv2.morphologyEx(gray, cv2.MORPH_GRADIENT,
                            np.ones((3, 3), np.uint8))
    _, bw = cv2.threshold(grad, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    merged = cv2.morphologyEx(bw, cv2.MORPH_CLOSE,
                              np.ones((3, 17), np.uint8))
    shrunk = cv2.erode(merged, np.ones((5, 5), np.uint8))
    return (shrunk.astype(np.float32) / 255.0) * 0.92


def main():
    import cv2
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu import config as cfg

    if IMAGES_DIR is None:
        print(json.dumps({"metric": "e2e_images_per_sec", "value": 0.0,
                          "unit": "images/sec/chip", "vs_baseline": 0.0,
                          "error": "no test images found"}))
        return

    paths = sorted(glob.glob(os.path.join(IMAGES_DIR, "*.jpg")))[:12]
    images = [cv2.imread(p) for p in paths]
    images = [im for im in images if im is not None]

    # drop_score=0 so result counts reflect detected boxes even while rec
    # weights are untrained (random-weight scores are ~0.001 and would all
    # be filtered, hiding the real cls/rec work done).
    model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False, drop_score=0.0)

    det_path = model.args.det_model_dir
    rec_path = model.args.rec_model_dir

    def _has_weights(p):
        return os.path.exists(p) or os.path.exists(
            os.path.join(os.path.dirname(p), "native_params.npz"))

    real_weights = _has_weights(det_path) and _has_weights(rec_path)
    mode = "real-weights" if real_weights else "synthetic-det-map"

    if not real_weights:
        # Substitute the (untrained) det output with precomputed realistic
        # text maps (keyed by image buffer identity, so the patch is
        # thread-safe); the real det forward still runs and is timed.
        from onnxocr_tpu.ops import det_pre
        det = model.text_detector
        synth = {}
        for im in images:
            rh, rw = det_pre.det_resize_target(im.shape[0], im.shape[1],
                                               det.limit_side_len,
                                               det.limit_type)
            synth[id(im)] = synthetic_text_map(im, rh, rw)
        orig_infer = det.infer_prob_map

        def patched(img):
            prob, shape_info = orig_infer(img)  # timed real forward
            return synth.get(id(img), prob), shape_info

        det.infer_prob_map = patched

    # Warmup: compile every bucket shape this corpus hits.
    box_counts = []
    for im in images:
        res = model.ocr(im)
        box_counts.append(len(res[0]))

    # Serial pass → per-image latency distribution.
    lat = []
    for im in images:
        t0 = time.time()
        model.ocr(im)
        lat.append(time.time() - t0)

    # Pipelined pass → throughput. One engine process owns the chip; worker
    # threads overlap host pre/post of one image with device compute of the
    # next (device dispatch releases the GIL).
    import concurrent.futures
    rounds = 3
    work = [im for _ in range(rounds) for im in images]
    t0 = time.time()
    with concurrent.futures.ThreadPoolExecutor(max_workers=5) as pool:
        list(pool.map(model.ocr, work))
    dt = time.time() - t0

    ips = len(work) / dt
    out = {
        "metric": "e2e_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IPS, 2),
        "mode": mode,
        "images": len(images),
        "mean_boxes_per_image": round(float(np.mean(box_counts)), 1),
        "p50_latency_ms": round(float(np.median(lat)) * 1000, 1),
        "serial_images_per_sec": round(1.0 / float(np.mean(lat)), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
