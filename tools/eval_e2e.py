"""Evaluate the full pipeline on synthetic pages with known ground truth:
char accuracy, detection recall, and box-geometry stats (for tuning the
det shrink target / unclip ratio).

Usage: python tools/eval_e2e.py [--pages 5] [--drop-score 0.3]
"""
import argparse
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")

import numpy as np


def render_page(seed, size=640):
    from onnxocr_tpu import config as cfg_mod
    from onnxocr_tpu.train import synth
    dict_path = cfg_mod.find_asset("ppocrv5/ppocrv5_dict.txt")
    c2i = synth.charset_from_dict(dict_path)
    r = synth.TextRenderer(char_to_idx=c2i, seed=seed)
    rng = np.random.default_rng(seed)
    page = np.full((size, size, 3), 235, np.uint8)
    truths = []
    y = 40
    for _ in range(6):
        text = r.random_text(10)
        line = r.render_line(text, int(rng.integers(28, 44)), size - 80)
        lh, lw = line.shape[:2]
        x = int(rng.integers(10, size - lw - 10))
        if y + lh > size - 10:
            break
        page[y:y + lh, x:x + lw] = line
        truths.append((text, (x, y, x + lw, y + lh)))
        y += lh + int(rng.integers(20, 40))
    return page, truths


def char_acc(pred, truth):
    import difflib
    return difflib.SequenceMatcher(None, pred, truth).ratio()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=5)
    ap.add_argument("--drop-score", type=float, default=0.3)
    ap.add_argument("--unclip", type=float, default=1.5)
    args = ap.parse_args()

    from onnxocr_tpu import ONNXPaddleOcr
    model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                          drop_score=args.drop_score,
                          det_db_unclip_ratio=args.unclip,
                          det_limit_side_len=640, tpu_det_bucket=320)

    tot, acc_sum, det_hits, det_total = 0, 0.0, 0, 0
    hratios = []
    for seed in range(args.pages):
        page, truths = render_page(seed + 100)
        boxes = model.text_detector(page)
        res = model.ocr(page)
        preds = [line[1][0] for line in res[0]]
        for text, (x0, y0, x1, y1) in truths:
            det_total += 1
            best_iouish = 0.0
            for b in np.asarray(boxes).reshape(-1, 4, 2) if len(boxes) else []:
                bx0, by0 = b.min(axis=0)
                bx1, by1 = b.max(axis=0)
                ix = max(0, min(x1, bx1) - max(x0, bx0))
                iy = max(0, min(y1, by1) - max(y0, by0))
                inter = ix * iy
                union = (x1 - x0) * (y1 - y0)
                if union > 0 and inter / union > best_iouish:
                    best_iouish = inter / union
                    hratios.append((by1 - by0) / max(y1 - y0, 1))
            if best_iouish > 0.5:
                det_hits += 1
            best = max((char_acc(p, text) for p in preds), default=0.0)
            acc_sum += best
            tot += 1
        print(f"page {seed}: {len(truths)} lines, {len(boxes)} boxes, "
              f"preds={preds}")
    print(f"\ndet recall: {det_hits}/{det_total}")
    print(f"char accuracy: {acc_sum / max(tot, 1):.3f}")
    if hratios:
        print(f"box-height / text-height ratio: "
              f"median {np.median(hratios):.2f}")


if __name__ == "__main__":
    main()
