"""Synthetic-data renderer: per-font charset discipline + dict mapping."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def renderer():
    from onnxocr_tpu.train import synth
    from onnxocr_tpu import config as cfg
    c2i = synth.charset_from_dict(
        cfg.find_asset("ppocrv5/ppocrv5_dict.txt"), charset=None)
    return synth.TextRenderer(char_to_idx=c2i, seed=0)


def test_full_charset_reaches_font_ceiling(renderer):
    # every glyph any DejaVu font can draw, intersected with the v5 dict
    assert len(renderer.charset) > 1200


def test_sampled_text_always_renderable(renderer):
    for _ in range(50):
        text, fkey = renderer.sample_line(12)
        assert all(c in renderer._font_sets[fkey] for c in text)
        line = renderer.render_line(text, 48, 320, font_key=fkey)
        assert line.shape[0] == 48 and line.dtype == np.uint8


def test_rec_batch_encodes_dict_indices(renderer):
    imgs, labels, pads = renderer.rec_batch(4, 128, max_len=6)
    assert imgs.shape == (4, 48, 128, 3)
    assert labels.max() < 18385 and labels.min() >= 0
    # non-padded labels are nonzero (0 is the CTC blank)
    assert ((labels > 0) | (pads == 1.0)).all()


def test_drawable_filter():
    from onnxocr_tpu.train.synth import _drawable
    assert _drawable("a") and _drawable(" ") and _drawable("Ω")
    assert not _drawable("́")   # combining accent
    assert not _drawable("​")   # zero-width space
    assert not _drawable("א")   # RTL (hebrew aleph)
