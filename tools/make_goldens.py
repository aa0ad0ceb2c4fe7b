"""Capture golden pipeline outputs for regression testing.

Runs the full pipeline over deterministic synthetic pages (and any provided
images) and stores boxes/texts/scores to tests/goldens.json. The regression
test (tests/test_goldens.py) re-runs the pipeline and compares — catching
unintended numeric drift in det/warp/cls/rec across refactors.

Usage: python tools/make_goldens.py   (requires TPU or patient CPU)
"""
import json
import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
warnings.filterwarnings("ignore")

# goldens MUST be captured on the same platform the regression test
# replays on (tests/conftest.py forces CPU): a TPU capture bakes in
# device-vs-host numeric drift and test_goldens fails at HEAD. Env var
# alone may not stick (CLAUDE.md) — set the config too, before first use.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens.json")


def capture():
    from onnxocr_tpu import ONNXPaddleOcr
    from tools.eval_e2e import render_page

    model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                          drop_score=0.3, det_limit_side_len=640,
                          tpu_det_bucket=320)
    goldens = {}
    for seed in (100, 101, 102):
        page, truths = render_page(seed)
        res = model.ocr(page)
        goldens[str(seed)] = {
            "truths": [t for t, _ in truths],
            "results": [
                {"box": line[0], "text": line[1][0],
                 "score": round(float(line[1][1]), 4)}
                for line in res[0]
            ],
        }
    with open(GOLDEN_PATH, "w", encoding="utf-8") as f:
        json.dump(goldens, f, ensure_ascii=False, indent=1)
    print("wrote", GOLDEN_PATH)
    for seed, g in goldens.items():
        print(seed, [r["text"] for r in g["results"]])


if __name__ == "__main__":
    capture()
