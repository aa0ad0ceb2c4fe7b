"""Measure the det→boxes wire variants against each other on real link
weather (VERDICT r2 #9: the device DB-extraction path ships as an option —
justify it with data).

The bitmap wire defers candidate scoring into the fused rec program, so
the fair unit is the full det+cls+rec pipeline, identical everywhere
except the det wire:
  * maps    — download the full quantized prob map, host DB postprocess
              (tpu_det_wire='maps': the round-1 wire)
  * bitmap  — download only the bitpacked bitmap; scores ride in the fused
              rec program (tpu_det_wire='bitmap': the serving default)
  * device  — on-device DB extraction, only K quads cross the wire
              (tpu_det_postprocess='device', ops/db_device.py)

Prints one JSON line: median e2e ms/page per variant over the corpus +
mean box count (agreement proxy).

Usage:  python tools/bench_det_variants.py [--rounds 3] (needs the TPU)
"""
import argparse
import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGES = None
for cand in ("/root/reference/onnxocr/test_images",
             os.path.join(os.path.dirname(os.path.dirname(
                 os.path.abspath(__file__))), "onnxocr_tpu", "test_images")):
    if os.path.isdir(cand):
        IMAGES = cand
        break


def time_variant(model, images, rounds):
    # warm every shape
    for im in images:
        model.ocr(im)
    lat = []
    boxes = []
    for _ in range(rounds):
        for im in images:
            t0 = time.perf_counter()
            res = model.ocr(im)
            lat.append((time.perf_counter() - t0) * 1000)
            boxes.append(len(res[0] or []))
    return statistics.median(lat), sum(boxes) / max(len(boxes), 1)


def main():
    import cv2
    from onnxocr_tpu import ONNXPaddleOcr

    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--max-images", type=int, default=8)
    args = ap.parse_args()

    paths = sorted(glob.glob(os.path.join(IMAGES, "*.jpg")))
    images = [im for im in (cv2.imread(p) for p in paths)
              if im is not None][:args.max_images]

    out = {"metric": "e2e_ms_per_page_by_det_wire", "images": len(images),
           "rounds": args.rounds, "variants": {}}
    variants = {
        "maps": dict(tpu_det_wire="maps"),
        "bitmap": dict(tpu_det_wire="bitmap"),
        "device": dict(tpu_det_postprocess="device"),
    }
    for name, kw in variants.items():
        model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                              drop_score=0.0, **kw)
        ms, mean_boxes = time_variant(model, images, args.rounds)
        out["variants"][name] = {"median_ms": round(ms, 1),
                                 "mean_boxes": round(mean_boxes, 1)}
        print(f"[det-variants] {name}: {ms:.1f} ms/page, "
              f"{mean_boxes:.1f} boxes", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
