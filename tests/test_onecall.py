"""One-call pipeline parity: the single-download program must reproduce
the staged device path (same DB extraction contract) — texts equal, boxes
within the float32-matrix tolerance."""
import os
import sys

import numpy as np
import pytest

from onnxocr_tpu import config as cfg_mod

_HAVE_CKPTS = (
    os.path.exists(cfg_mod.find_asset("ppocrv5/rec/native_params.npz")) and
    os.path.exists(cfg_mod.find_asset("ppocrv5/det/native_params.npz")))

pytestmark = pytest.mark.skipif(not _HAVE_CKPTS,
                                reason="trained checkpoints not available")


@pytest.fixture(scope="module")
def pages():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from eval_e2e import render_page
    return [render_page(s)[0] for s in (100, 101)]


@pytest.fixture(scope="module")
def staged_model():
    from onnxocr_tpu import ONNXPaddleOcr
    return ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                         det_limit_side_len=640, tpu_det_bucket=320,
                         tpu_det_postprocess="device")


@pytest.fixture(scope="module")
def onecall_model():
    from onnxocr_tpu import ONNXPaddleOcr
    return ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                         det_limit_side_len=640, tpu_det_bucket=320,
                         tpu_pipeline="onecall")


def test_onecall_matches_staged_device(pages, staged_model, onecall_model):
    for page in pages:
        ref = staged_model.ocr(page)[0]
        got = onecall_model.ocr(page)[0]
        assert [l[1][0] for l in got] == [l[1][0] for l in ref]
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            gb = np.asarray(g[0], np.float64)
            rb = np.asarray(r[0], np.float64)
            assert np.abs(gb - rb).max() <= 2.0
            assert abs(float(g[1][1]) - float(r[1][1])) < 2e-3


def test_onecall_empty_page(onecall_model):
    blank = np.full((320, 320, 3), 250, np.uint8)
    res = onecall_model.ocr(blank)
    assert res[0] == []


def test_onecall_fixed_canvas_rect_page(staged_model, onecall_model):
    """A rectangular page runs det on the fixed 640² canvas in one-call
    mode but on a 320x640 canvas in the staged device path — activation
    masking (models/dbnet.apply valid_hw) must make the results agree."""
    from onnxocr_tpu import config as cfg_mod
    from onnxocr_tpu.train import synth

    c2i = synth.charset_from_dict(
        cfg_mod.find_asset("ppocrv5/ppocrv5_dict.txt"))
    r = synth.TextRenderer(char_to_idx=c2i, seed=207)
    page = np.full((320, 640, 3), 235, np.uint8)
    for y in (40, 130, 220):
        line = r.render_line(r.random_text(8), 34, 560)
        lh, lw = line.shape[:2]
        page[y:y + lh, 30:30 + lw] = line
    assert onecall_model._onecall is not None
    assert onecall_model._onecall.fixed_canvas
    ref = staged_model.ocr(page)[0]
    got = onecall_model.ocr(page)[0]
    assert len(ref) >= 2
    assert [l[1][0] for l in got] == [l[1][0] for l in ref]
    for g, r_ in zip(got, ref):
        gb = np.asarray(g[0], np.float64)
        rb = np.asarray(r_[0], np.float64)
        assert np.abs(gb - rb).max() <= 2.0


def test_onecall_overflow_remainder(pages, staged_model):
    """A page with more boxes than K_rec must keep the prefix results and
    fused-run the remainder from the packed det block — same texts/boxes
    as the staged device path, no det re-run."""
    from onnxocr_tpu import ONNXPaddleOcr
    tiny = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                         det_limit_side_len=640, tpu_det_bucket=320,
                         tpu_pipeline="onecall", tpu_onecall_max_boxes=2)
    for page in pages:
        ref = staged_model.ocr(page)[0]
        if len(ref) <= 2:
            continue
        got = tiny.ocr(page)[0]
        assert [l[1][0] for l in got] == [l[1][0] for l in ref]
        for g, r in zip(got, ref):
            gb = np.asarray(g[0], np.float64)
            rb = np.asarray(r[0], np.float64)
            assert np.abs(gb - rb).max() <= 2.0


def test_onecall_cls_off(pages):
    from onnxocr_tpu import ONNXPaddleOcr
    m = ONNXPaddleOcr(use_angle_cls=False, drop_score=0.0,
                      det_limit_side_len=640, tpu_det_bucket=320,
                      tpu_pipeline="onecall")
    res = m.ocr(pages[0], cls=False)
    assert len(res[0]) > 0


def test_onecall_wide_line_fallback():
    """A very wide text line (desired_w > onecall rec width) must be
    re-run through the staged bucket path and still decode."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu.train import synth
    dict_path = cfg_mod.find_asset("ppocrv5/ppocrv5_dict.txt")
    c2i = synth.charset_from_dict(dict_path)
    r = synth.TextRenderer(char_to_idx=c2i, seed=7)
    page = np.full((200, 1600, 3), 235, np.uint8)
    text, fkey = r.sample_line(14)
    crop = r.render_line(text, 64, 1500, font_key=fkey)
    h, w = crop.shape[:2]
    page[60:60 + h, 40:40 + w] = crop
    small = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                          tpu_pipeline="onecall",
                          tpu_onecall_rec_width=320)
    big = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0)
    ref = big.ocr(page)[0]
    got = small.ocr(page)[0]
    if len(ref) and len(got):
        # The fallback re-crops on host at a staged bucket width while the
        # wide-rec reference warps on device at its own width — different
        # resamplings of the same line, so demand high agreement rather
        # than byte equality (a synthetic gibberish line sits near the
        # decision boundary for a char or two).
        assert len(got) == len(ref)
        import difflib
        for g, r in zip(got, ref):
            a, b = g[1][0], r[1][0]
            assert a and b
            sim = difflib.SequenceMatcher(None, a, b).ratio()
            assert sim >= 0.7, (a, b, sim)
