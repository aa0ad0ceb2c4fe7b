"""Batch layer tests: OCRLogic text structuring + PDF image extraction."""
import os
import zlib

import numpy as np
import pytest


def _make_scanned_pdf(path, img_rgb):
    """Minimal single-page PDF with one FlateDecode RGB image XObject."""
    h, w = img_rgb.shape[:2]
    raw = zlib.compress(img_rgb.tobytes())
    objs = []
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n"
                b"endobj\n")
    objs.append(b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
                b"<< /XObject << /Im0 4 0 R >> >> /MediaBox [0 0 612 792] "
                b"/Contents 5 0 R >>\nendobj\n")
    objs.append(
        b"4 0 obj\n<< /Type /XObject /Subtype /Image /Width " +
        str(w).encode() + b" /Height " + str(h).encode() +
        b" /ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode"
        b" /Length " + str(len(raw)).encode() + b" >>\nstream\n" + raw +
        b"\nendstream\nendobj\n")
    objs.append(b"5 0 obj\n<< /Length 40 >>\nstream\nq 612 0 0 792 0 0 cm "
                b"/Im0 Do Q\nendstream\nendobj\n")
    body = b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n"
    with open(path, "wb") as f:
        f.write(body)


def test_pdf_embedded_image_extraction(tmp_path):
    from onnxocr_tpu.batch import pdf
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 100, 3), dtype=np.uint8)
    p = str(tmp_path / "scan.pdf")
    _make_scanned_pdf(p, img)
    pages = pdf.extract_embedded_images(p)
    assert len(pages) == 1
    np.testing.assert_array_equal(pages[0], img)


def test_pdf_vector_only_raises(tmp_path):
    from onnxocr_tpu.batch import pdf
    p = str(tmp_path / "vector.pdf")
    with open(p, "wb") as f:
        f.write(b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n%%EOF")
    if pdf.fitz is None:
        with pytest.raises(RuntimeError):
            pdf.pdf_to_images(p)


def test_result_to_text_shapes():
    from onnxocr_tpu.batch.logic import OCRLogic
    logic = OCRLogic.__new__(OCRLogic)  # no model init
    box = [[0, 0], [1, 0], [1, 1], [0, 1]]
    assert logic._result_to_text([[[box, ("hi", 0.9)],
                                   [box, ("there", 0.8)]]]) == "hi\nthere"
    assert logic._result_to_text([[]]) == "[未检测到内容]"
    assert logic._result_to_text(None) == "[未检测到内容]"


def test_output_dir_beside_input(tmp_path):
    from onnxocr_tpu.batch.logic import OCRLogic
    logic = OCRLogic.__new__(OCRLogic)
    f = tmp_path / "img.jpg"
    f.write_bytes(b"x")
    out = logic._get_output_dir(str(f))
    assert out == str(tmp_path / "Output_OCR")
    assert os.path.isdir(out)


def _make_vector_pdf(path):
    import zlib
    content = (b"q 0.9 0.9 0.9 rg 40 600 500 80 re f 0 0 0 rg "
               b"BT /F1 24 Tf 60 700 Td (Hello Vector) Tj ET "
               b"BT /F1 14 Tf 60 610 Td 18 TL (first) Tj T* (second) ' ET")
    comp = zlib.compress(content)
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/MediaBox [0 0 612 792] >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
        b"<< /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"
        b"endobj\n",
        b"5 0 obj\n<< /Length " + str(len(comp)).encode() +
        b" /Filter /FlateDecode >>\nstream\n" + comp +
        b"\nendstream\nendobj\n",
    ]
    with open(path, "wb") as f:
        f.write(b"%PDF-1.4\n" + b"".join(objs) + b"%%EOF\n")


def test_vector_pdf_rasterizes(tmp_path):
    from onnxocr_tpu.batch import pdf
    p = str(tmp_path / "vec.pdf")
    _make_vector_pdf(p)
    pages = pdf.pdf_to_images(p)
    assert len(pages) == 1
    page = pages[0]
    assert page.ndim == 3 and page.shape[2] == 3
    # text pixels present (page not blank) and background white
    assert (page < 128).any()
    assert (page == 255).mean() > 0.5
