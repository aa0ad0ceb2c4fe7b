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


def test_structured_lines_renderable_and_bounded():
    from onnxocr_tpu.train import synth
    from onnxocr_tpu import config as cfg
    c2i = synth.charset_from_dict(
        cfg.find_asset("ppocrv5/ppocrv5_dict.txt"), charset=None)
    r = synth.TextRenderer(char_to_idx=c2i, seed=3, structured_frac=1.0)
    assert len(r._lexicon) >= 200  # harvested or fallback word list
    ascii_ish = 0
    for _ in range(60):
        text, fkey = r.sample_line(14)
        assert 0 < len(text) <= 14
        assert all(c in r._font_sets[fkey] for c in text)
        # every char must map to a dict index (encode() silently drops
        # unmapped chars, which would mislabel the rendered image)
        assert len(r.encode(text)) == len([c for c in text if c != " "]) \
            or " " in c2i
        ascii_ish += all(ord(c) < 128 for c in text)
    # structured lines are overwhelmingly ASCII (the real-corpus mix)
    assert ascii_ish >= 50


def test_det_page_table_geometry():
    from onnxocr_tpu.train import synth
    r = synth.TextRenderer(seed=5, structured_frac=0.5)
    for _ in range(3):
        page, smap, mask = r.det_page_table(320)
        assert page.shape == (320, 320, 3) and page.dtype == np.uint8
        assert smap.shape == (320, 320) and mask.shape == (320, 320)
        assert set(np.unique(smap)) <= {0.0, 1.0}
    # table pages usually contain text (shrink map nonempty)
    hits = sum(r.det_page_table(320)[1].sum() > 0 for _ in range(5))
    assert hits >= 3


def test_det_batch_table_frac_mix():
    from onnxocr_tpu.train import synth
    r = synth.TextRenderer(seed=6)
    imgs, maps, masks = r.det_batch(2, 160, hard_frac=0.3, table_frac=0.5)
    assert imgs.shape == (2, 160, 160, 3)
    assert masks.min() == 1.0


def test_drawable_filter():
    from onnxocr_tpu.train.synth import _drawable
    assert _drawable("a") and _drawable(" ") and _drawable("Ω")
    assert not _drawable("́")   # combining accent
    assert not _drawable("​")   # zero-width space
    assert not _drawable("א")   # RTL (hebrew aleph)


def test_lowres_degradation_shapes_and_gating():
    """lowres_frac degrades rec lines (downscale->upscale) without
    changing the output contract; alpha rendering (det compositing) is
    never degraded."""
    from onnxocr_tpu.train import synth
    r = synth.TextRenderer(seed=11, lowres_frac=1.0)
    im = r.render_line("Hello 123")
    assert im.dtype == np.uint8 and im.shape[0] == 48 and im.ndim == 3
    # degraded output loses high-frequency energy vs the clean render
    rc = synth.TextRenderer(seed=11, lowres_frac=0.0)
    clean = rc.render_line("Hello 123")
    def hf(x):
        g = x.mean(axis=-1)
        return float(np.abs(np.diff(g, axis=1)).mean())
    assert hf(im) < hf(clean)
    # alpha path (det page compositing) stays clean
    bgr, alpha = r.render_line("Hi", return_alpha=True)
    assert alpha.shape == bgr.shape[:2]


def test_photo_and_dotmatrix_line_variants():
    from onnxocr_tpu.train import synth
    r = synth.TextRenderer(seed=7, photo_frac=0.5, dotmatrix_frac=0.5)
    p = r.render_line_photo("Palais du LOUVRE")
    d = r.render_line_dotmatrix("MU 2379")
    assert p.dtype == np.uint8 and p.shape[0] == 48
    assert d.dtype == np.uint8 and d.shape[0] == 48
    # dot-matrix ink is sparser than solid glyphs: compare dark-pixel
    # fraction against the photo render's continuous strokes
    g = d.mean(axis=-1)
    dark = float((g < 120).mean())
    assert 0.0 < dark < 0.35
