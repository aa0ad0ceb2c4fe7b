"""Trained-charset decode masking (tpu_decode_support, VERDICT r2 #5):
the native synthetic-trained recognizers must never emit dictionary
glyphs the trainer couldn't render (round 2 emitted emoji/arrows on real
images because argmax ranged over all 18k indices)."""
import json

import numpy as np

from onnxocr_tpu import config as cfg
from onnxocr_tpu.pipeline import backends


def _support_chars():
    sup_path = cfg.find_asset(
        "ppocrv5/ppocrv5_dict.txt.trained_support.json")
    with open(sup_path) as f:
        return set(json.load(f)["chars"])


def test_trained_support_includes_blank_and_space():
    sup = backends.trained_support(cfg.find_asset("ppocrv5/ppocrv5_dict.txt"))
    assert sup is not None and 0 in sup
    assert len(sup) > 1000  # full renderable latin/greek/cyrillic charset


def test_apply_support_bias_masks_head():
    params = {"head": {"w": np.zeros((4, 10), np.float32),
                       "b": np.arange(10, dtype=np.float32)}}
    out = backends.apply_support_bias(params, np.array([0, 3, 7]))
    b = out["head"]["b"]
    assert (b[[0, 3, 7]] == [0.0, 3.0, 7.0]).all()
    assert (b[[1, 2, 4, 5, 6, 8, 9]] < -1e20).all()
    # original untouched
    assert params["head"]["b"][1] == 1.0


def test_masked_model_only_emits_trained_chars():
    from onnxocr_tpu import ONNXPaddleOcr

    m = ONNXPaddleOcr(use_angle_cls=False, drop_score=0.0)
    allowed = _support_chars()
    rng = np.random.default_rng(5)
    # noise crops: the unmasked round-2 model produced symbol glyphs here
    crops = [rng.integers(0, 256, (48, 180, 3), np.uint8) for _ in range(4)]
    res = m.ocr(crops, det=False, cls=False)[0]
    for text, _score in res:
        assert set(text) <= allowed, f"untrained glyphs in {text!r}"


def test_support_full_disables_mask():
    from onnxocr_tpu import ONNXPaddleOcr

    m = ONNXPaddleOcr(use_angle_cls=False, tpu_decode_support="full")
    b = np.asarray(m.text_recognizer.forward.params["head"]["b"],
                   np.float32)
    assert (b > -1e20).all()
