"""Round-2 post-training TPU session: per-family evals, held-out accuracy,
golden recapture, smoke — one process (the tunnel serializes clients).

Usage: python tools/tpu_session_r2.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import warnings
warnings.filterwarnings("ignore")


def main():
    print("=== eval_e2e (synthetic, v5) ===", flush=True)
    from tools import eval_e2e
    sys.argv = ["eval_e2e", "--pages", "4"]
    eval_e2e.main()

    print("=== held-out eval per family ===", flush=True)
    import cv2
    from tools.eval_heldout import GROUND_TRUTH, similarity, REF_IMAGES
    from onnxocr_tpu.service import engine as engine_mod
    em = engine_mod.EngineManager(concurrency=1)
    for family in ("PP-OCRv5", "PP-OCRv4", "ch_ppocr_server_v2.0"):
        try:
            model = em.get_model(family)
        except Exception as e:
            print(f"{family}: load failed: {e}", flush=True)
            continue
        sims, exact, found, total = [], 0, 0, 0
        for fname, gt_lines in GROUND_TRUTH.items():
            img = cv2.imread(os.path.join(REF_IMAGES, fname))
            if img is None:
                continue
            result = model.ocr(img)
            preds = [e[1][0] for e in (result[0] or [])]
            for gt in gt_lines:
                best = max((similarity(gt, p) for p in preds), default=0.0)
                sims.append(best)
                exact += int(best == 1.0)
                found += int(best >= 0.5)
                total += 1
        print(json.dumps({
            "family": family, "gt_lines": total,
            "line_recall@0.5": round(found / max(total, 1), 3),
            "char_accuracy": round(sum(sims) / max(len(sims), 1), 3),
            "exact": exact}), flush=True)

    print("=== goldens recapture ===", flush=True)
    from tools import make_goldens
    make_goldens.capture()

    print("=== smoke (715873...jpg) ===", flush=True)
    import time
    from onnxocr_tpu import ONNXPaddleOcr, sav2Img
    img = cv2.imread(
        "/root/reference/onnxocr/test_images/"
        "715873facf064583b44ef28295126fa7.jpg")
    model = em.get_model("PP-OCRv5")
    t0 = time.time()
    result = model.ocr(img)
    print(f"total time: {time.time() - t0:.3f} n={len(result[0])}",
          flush=True)
    os.makedirs("scratch", exist_ok=True)
    sav2Img(img, result, name="scratch/draw_ocr_r2.jpg")
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
