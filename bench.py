"""End-to-end OCR throughput benchmark on one TPU chip.

Prints ONE JSON line:
  {"metric": "e2e_images_per_sec", "value": N, "unit": "images/sec/chip",
   "vs_baseline": N, ...}

Pipeline measured: full det forward → DB postprocess → device crop-warp +
angle cls → device rec forward + CTC decode (the complete det+cls+rec path
of ONNXPaddleOcr.ocr()) over ALL bundled reference test images.

Two numbers are reported:
  * serial_images_per_sec — one image at a time through the library-default
    pipeline (plus p50/p95 latency and a per-stage wall-time breakdown);
  * value (pipelined) — the serving configuration: worker threads feed one
    engine, concurrent det forwards coalesce through the cross-request page
    batcher, host pre/post of one image overlaps device compute of others.

Baseline: the reference publishes ~200-500 ms/image on CPU onnxruntime
(docs/API_REFERENCE.md:339; BASELINE.md) → 3.33 images/sec at the 300 ms
midpoint. vs_baseline = value / 3.33.

Weights caveat: the reference snapshot ships no det/rec .onnx blobs
(.MISSING_LARGE_BLOBS); this repo commits natively-trained checkpoints and
the bench runs them ("mode": "real-weights"). If the checkpoints are absent
the networks run untrained (real FLOPs) and the det map is substituted with
a gradient-derived text map computed OUTSIDE the timed loop — reported as
"mode": "synthetic-det-map" so no number can masquerade as the real one.
"""
import glob
import json
import os
import statistics
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
PIPELINE_THREADS = int(os.environ.get("BENCH_THREADS", "8"))
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "9"))


def synthetic_text_map(img, rh, rw):
    """Gradient-based text-region map at det-output resolution (stand-in for
    missing trained weights; computed outside the timed loop)."""
    import cv2
    gray = cv2.cvtColor(cv2.resize(img, (rw, rh)), cv2.COLOR_BGR2GRAY)
    grad = cv2.morphologyEx(gray, cv2.MORPH_GRADIENT,
                            np.ones((3, 3), np.uint8))
    _, bw = cv2.threshold(grad, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    merged = cv2.morphologyEx(bw, cv2.MORPH_CLOSE,
                              np.ones((3, 17), np.uint8))
    shrunk = cv2.erode(merged, np.ones((5, 5), np.uint8))
    return (shrunk.astype(np.float32) / 255.0) * 0.92


def _has_weights(model_dir):
    return os.path.exists(model_dir) or os.path.exists(
        os.path.join(os.path.dirname(model_dir), "native_params.npz"))


def main():
    import cv2
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu import config as cfg
    from onnxocr_tpu.utils import profiling

    if IMAGES_DIR is None:
        print(json.dumps({"metric": "e2e_images_per_sec", "value": 0.0,
                          "unit": "images/sec/chip", "vs_baseline": 0.0,
                          "error": "no test images found"}))
        return

    paths = sorted(glob.glob(os.path.join(IMAGES_DIR, "*.jpg")) +
                   glob.glob(os.path.join(IMAGES_DIR, "*.png")))
    images = [im for im in (cv2.imread(p) for p in paths) if im is not None]

    real_weights = _has_weights(cfg.DEFAULTS["det_model_dir"]) and \
        _has_weights(cfg.DEFAULTS["rec_model_dir"])
    mode = "real-weights" if real_weights else "synthetic-det-map"

    # drop_score=0 so result counts reflect detected boxes in either mode.
    common = dict(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                  tpu_allow_untrained=not real_weights)
    model = ONNXPaddleOcr(**common)                       # library default
    # serving configuration: cross-request det page batching (bits wire)
    # + per-page scored cls+rec. Cross-request REC coalescing stays off
    # here: its program shapes depend on wave composition (which pages
    # land together), so timed rounds can hit un-warmed combos and a
    # single mid-round XLA compile (~20-60 s) poisons the round; the
    # per-page path's shapes are image-deterministic and fully warmed.
    model_pipe = ONNXPaddleOcr(tpu_det_microbatch=True, **common)

    if not real_weights:
        from onnxocr_tpu.ops import det_pre
        for m in (model, model_pipe):
            det = m.text_detector
            synth = {}
            for im in images:
                rh, rw = det_pre.det_resize_target(
                    im.shape[0], im.shape[1], det.limit_side_len,
                    det.limit_type)
                synth[id(im)] = synthetic_text_map(im, rh, rw)
            orig_infer = det.infer_prob_map

            def patched(img, _orig=orig_infer, _synth=synth):
                prob, shape_info = _orig(img)  # timed real forward
                return _synth.get(id(img), prob), shape_info

            det.infer_prob_map = patched
            det._page_batcher = None  # synthetic patch only hooks this path

    def note(msg):
        print("[bench] %s" % msg, file=sys.stderr, flush=True)

    # Warmup: compile every shape bucket this corpus hits, on both models.
    import concurrent.futures
    note("warmup serial (%d images)" % len(images))
    box_counts = []
    for i, im in enumerate(images):
        res = model.ocr(im)
        box_counts.append(len(res[0]))
        if (i + 1) % 8 == 0:
            note("warmup serial %d/%d" % (i + 1, len(images)))
    # Deterministically compile every det batch-ladder size: wave
    # composition is timing-dependent, so replay alone can leave a ladder
    # size to compile inside a timed round (a 20-60s spike).
    det_b = model_pipe.text_detector._page_batcher
    if det_b is not None and det_b.post is None:
        cap = det_b.canvas[0] if det_b.canvas else 960
        for n in (1, 2, 4, 8):
            note("warmup det ladder %d" % n)
            batch = {"pages": np.zeros((n, cap, cap, 3), np.uint8),
                     "rhw": np.tile(np.array([[cap, cap]], np.int32),
                                    (n, 1))}
            out = det_b.batcher.fn(batch)
            np.asarray(out[0] if isinstance(out, tuple) else out)

    note("warmup pipelined (full workload replay)")
    # Replay the EXACT timed workload once: cross-request coalescing makes
    # batch shapes load-dependent, so anything short of a replay leaves
    # shapes to compile inside the timed window (r2 lesson: a single
    # mid-pass compile costs ~20-60 s and poisons the mean).
    # (two passes: scored-call shapes are per-image deterministic and the
    # det ladder is warmed above, so this is belt-and-braces)
    warm_work = [im for _ in range(2) for im in images]
    with concurrent.futures.ThreadPoolExecutor(PIPELINE_THREADS) as pool:
        list(pool.map(model_pipe.ocr, warm_work))

    # Serial pass → per-image latency distribution + stage breakdown.
    # Two passes; per-image latency = the min of the two observations so a
    # transient link squall doesn't masquerade as pipeline cost (both
    # passes run the identical compiled programs).
    note("timed serial pass")
    profiling.GLOBAL.enabled = True
    profiling.GLOBAL.reset()
    lat = []
    for _ in range(2):
        for im in images:
            t0 = time.perf_counter()
            model.ocr(im)
            lat.append(time.perf_counter() - t0)
    lat = [min(a, b) for a, b in zip(lat[:len(images)], lat[len(images):])]
    stages = profiling.GLOBAL.summary()
    profiling.GLOBAL.enabled = False
    lat_ms = sorted(x * 1000 for x in lat)

    def pct(p):
        return lat_ms[min(len(lat_ms) - 1, int(p / 100 * len(lat_ms)))]

    # Pipelined pass → throughput in the serving configuration. The
    # tunneled link suffers multi-second latency squalls (a single stall
    # poisons a long pass), so the run is ROUNDS short rounds and the
    # reported value is the MEDIAN round — a robust estimate of the
    # pipeline's sustainable rate; every round is reported alongside.
    note("timed pipelined pass (%d rounds)" % ROUNDS)
    # one untimed wash round: the first post-warmup round consistently
    # pays residual costs (allocator growth, link re-establishment)
    with concurrent.futures.ThreadPoolExecutor(PIPELINE_THREADS) as pool:
        list(pool.map(model_pipe.ocr, images))
    round_ips = []
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(PIPELINE_THREADS) as pool:
            list(pool.map(model_pipe.ocr, images))
        round_ips.append(len(images) / (time.perf_counter() - t0))
        note("round %d: %.2f img/s" % (r, round_ips[-1]))
    ips = statistics.median(round_ips)

    out = {
        "metric": "e2e_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IPS, 2),
        "mode": mode,
        "images": len(images),
        "rounds": ROUNDS,
        "threads": PIPELINE_THREADS,
        "mean_boxes_per_image": round(float(np.mean(box_counts)), 1),
        "serial_images_per_sec": round(len(lat) / sum(lat), 3),
        "p50_latency_ms": round(pct(50), 1),
        "p95_latency_ms": round(pct(95), 1),
        "pipelined_round_ips": [round(x, 2) for x in round_ips],
        "pipelined_round_stdev": round(statistics.pstdev(round_ips), 2),
        "stage_mean_ms": {k: v["mean_ms"] for k, v in sorted(stages.items())},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
