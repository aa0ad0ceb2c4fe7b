"""Golden regression: the pipeline must reproduce captured outputs on the
deterministic synthetic pages (tools/make_goldens.py). Texts must match
exactly; box coordinates within a few pixels (interp-order tolerance)."""
import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")
from onnxocr_tpu import config as cfg_mod

_HAVE_CKPTS = (
    os.path.exists(cfg_mod.find_asset("ppocrv5/rec/native_params.npz")) and
    os.path.exists(cfg_mod.find_asset("ppocrv5/det/native_params.npz")))

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLDEN_PATH) and _HAVE_CKPTS),
    reason="goldens or checkpoints not captured yet")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH, encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def model():
    import warnings
    from onnxocr_tpu import ONNXPaddleOcr
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                             drop_score=0.3, det_limit_side_len=640,
                             tpu_det_bucket=320)


def test_golden_outputs_reproduce(goldens, model):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from eval_e2e import render_page
    for seed_str, g in goldens.items():
        page, _ = render_page(int(seed_str))
        res = model.ocr(page)
        got_texts = [line[1][0] for line in res[0]]
        want_texts = [r["text"] for r in g["results"]]
        assert got_texts == want_texts, f"seed {seed_str}"
        for line, want in zip(res[0], g["results"]):
            got_box = np.asarray(line[0], dtype=np.float64)
            want_box = np.asarray(want["box"], dtype=np.float64)
            assert np.abs(got_box - want_box).max() <= 3.0
            assert abs(float(line[1][1]) - want["score"]) < 0.05
