"""End-to-end acceptance: render synthetic pages with known text, run the
full det→crop→cls→rec pipeline with the trained native weights, check the
text comes back. Skipped until checkpoints exist (tools/train_synthetic.py).

This is the machine-checked version of the reference's eyeball-only
test_ocr.py smoke test (SURVEY.md §4).
"""
import os

import numpy as np
import pytest

from onnxocr_tpu import config as cfg_mod

REC_CKPT = cfg_mod.find_asset("ppocrv5/rec/native_params.npz")
DET_CKPT = cfg_mod.find_asset("ppocrv5/det/native_params.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REC_CKPT) and os.path.exists(DET_CKPT)),
    reason="trained native det/rec checkpoints not staged")


def _char_accuracy(pred: str, truth: str) -> float:
    import difflib
    if not truth:
        return 1.0
    matcher = difflib.SequenceMatcher(None, pred, truth)
    return matcher.ratio()


@pytest.fixture(scope="module")
def model():
    import warnings
    from onnxocr_tpu import ONNXPaddleOcr
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                             drop_score=0.3,
                             det_limit_side_len=640, tpu_det_bucket=320)


def _render_page(seed: int):
    from onnxocr_tpu.train import synth
    dict_path = cfg_mod.find_asset("ppocrv5/ppocrv5_dict.txt")
    c2i = synth.charset_from_dict(dict_path)
    r = synth.TextRenderer(char_to_idx=c2i, seed=seed)
    # compose page manually so we keep the ground-truth strings
    import cv2
    size = 640
    page = np.full((size, size, 3), 235, np.uint8)
    truths = []
    y = 40
    rng = np.random.default_rng(seed)
    for _ in range(5):
        text = r.random_text(10)
        line = r.render_line(text, int(rng.integers(28, 44)), size - 80)
        lh, lw = line.shape[:2]
        x = int(rng.integers(10, size - lw - 10))
        if y + lh > size - 10:
            break
        page[y:y + lh, x:x + lw] = line
        truths.append(text)
        y += lh + int(rng.integers(20, 40))
    return page, truths


def test_pipeline_reads_synthetic_pages(model):
    total, matched = 0, 0.0
    for seed in (0, 1, 2):
        page, truths = _render_page(seed)
        res = model.ocr(page)
        preds = [line[1][0] for line in res[0]]
        for truth in truths:
            best = max((_char_accuracy(p, truth) for p in preds),
                       default=0.0)
            matched += best
            total += 1
    accuracy = matched / max(total, 1)
    # synthetic-trained mobile models on clean pages: expect most text read
    assert accuracy > 0.75, f"e2e char accuracy {accuracy:.2f}"


def test_detection_finds_lines(model):
    page, truths = _render_page(7)
    boxes = model.text_detector(page)
    # every rendered line should produce at least ~one box
    assert len(boxes) >= max(1, len(truths) - 1)
