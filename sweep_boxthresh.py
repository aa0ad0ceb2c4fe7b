"""Sweep det_db_box_thresh over the held-out GT (recall/char-acc/exact)."""
import importlib.util, json, os, threading
import numpy as np, cv2
import onnxocr_tpu  # noqa
from onnxocr_tpu import ONNXPaddleOcr

spec = importlib.util.spec_from_file_location(
    "ev", os.path.join(os.path.dirname(__file__), "tools/eval_heldout.py"))
ev = importlib.util.module_from_spec(spec); spec.loader.exec_module(ev)

def absorb():
    import jax; np.asarray(jax.device_put(np.ones(8, np.uint8)))
threading.Thread(target=absorb, daemon=True).start()

imgs = {f: cv2.imread(os.path.join(ev.REF_IMAGES, f))
        for f in ev.GROUND_TRUTH}

for bt in (0.6, 0.5, 0.45, 0.4, 0.35):
    m = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                      det_db_box_thresh=bt)
    sims, exact, found, total = [], 0, 0, 0
    for fname, gt_lines in ev.GROUND_TRUTH.items():
        img = imgs[fname]
        if img is None: continue
        res = m.ocr(img)[0] or []
        preds = [e[1][0] for e in res]
        for gt in gt_lines:
            best = max((ev.similarity(gt, p) for p in preds), default=0.0)
            sims.append(best); total += 1
            found += best >= 0.5; exact += best == 1.0
    print(json.dumps({"box_thresh": bt,
                      "line_recall@0.5": round(found / total, 3),
                      "char_accuracy": round(sum(sims) / total, 3),
                      "exact": exact}), flush=True)
    del m
