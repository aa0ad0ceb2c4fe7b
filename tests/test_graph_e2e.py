"""Full-pipeline e2e over the GRAPH backend (user-supplied .onnx files).

The det/rec blobs are missing from the reference snapshot, so per-op
executor tests (test_onnx_ops.py) were the only coverage of the
user-supplied-onnx path. This locks the WHOLE wire end-to-end (VERDICT r3
#8): a synthetic det.onnx (darkness → sigmoid prob map) and rec.onnx
(column-darkness → 2-class CTC probs) are built with tests/onnx_builder,
dropped into the reference's <dir>/det.onnx layout, and the FULL
ONNXPaddleOcr pipeline (resize → graph det → DB postprocess → crop warp →
graph rec → CTC decode) must produce the analytically-known boxes/texts.

Reference contract being exercised: onnxocr/predict_base.py session wiring,
predict_det.py:94-120, predict_rec.py:280-326.
"""
import os

import numpy as np
import pytest

from onnx_builder import build_model, node_bytes


def _write_det_onnx(path):
    """x (N,3,H,W) ImageNet-normalized → sigmoid(-3 * channel-mean):
    ~0 on white paper, ~1 on dark ink."""
    nodes = [
        node_bytes("ReduceMean", ["x"], ["m"], {"axes": [1], "keepdims": 1}),
        node_bytes("Mul", ["m", "neg3"], ["s"]),
        node_bytes("Sigmoid", ["s"], ["prob"]),
    ]
    blob = build_model(nodes, ["x"], ["prob"],
                       {"neg3": np.float32(-3.0).reshape(())})
    with open(path, "wb") as f:
        f.write(blob)


def _write_rec_onnx(path):
    """x (N,3,48,W) in [-1,1] → (N, W//8, 2) softmax probs: class 1 wins
    where the 48×8 cell carries ink (column mean ≤ ~0.3 — the unclip margin
    leaves crops ~half white), class 0 where white. Padded columns decode
    as whatever — the pipeline's valid-T decode restriction excludes them,
    which is exactly the contract this graph exercises."""
    nodes = [
        node_bytes("AveragePool", ["x"], ["pool"],
                   {"kernel_shape": [48, 8], "strides": [48, 8]}),
        # (N,3,1,T) → (N,1,T): channel mean
        node_bytes("ReduceMean", ["pool"], ["m"],
                   {"axes": [1], "keepdims": 0}),
        node_bytes("Mul", ["m", "p4"], ["l0"]),       # +4m - 1.2: white
        node_bytes("Add", ["l0", "nb"], ["light"]),
        node_bytes("Mul", ["m", "n4"], ["d0"]),       # -4m + 1.2: ink
        node_bytes("Add", ["d0", "pb"], ["dark"]),
        node_bytes("Transpose", ["light"], ["lt"], {"perm": [0, 2, 1]}),
        node_bytes("Transpose", ["dark"], ["dt"], {"perm": [0, 2, 1]}),
        node_bytes("Concat", ["lt", "dt"], ["logits"], {"axis": 2}),
        node_bytes("Softmax", ["logits"], ["probs"], {"axis": 2}),
    ]
    blob = build_model(nodes, ["x"], ["probs"],
                       {"p4": np.float32(4.0).reshape(()),
                        "n4": np.float32(-4.0).reshape(()),
                        "pb": np.float32(1.2).reshape(()),
                        "nb": np.float32(-1.2).reshape(())})
    with open(path, "wb") as f:
        f.write(blob)


@pytest.fixture(scope="module")
def graph_model(tmp_path_factory):
    from onnxocr_tpu import ONNXPaddleOcr
    root = tmp_path_factory.mktemp("graphzoo")
    det_dir = root / "det"
    rec_dir = root / "rec"
    det_dir.mkdir()
    rec_dir.mkdir()
    _write_det_onnx(str(det_dir / "det.onnx"))
    _write_rec_onnx(str(rec_dir / "rec.onnx"))
    return ONNXPaddleOcr(
        det_model_dir=str(det_dir / "det.onnx"),
        rec_model_dir=str(rec_dir / "rec.onnx"),
        use_angle_cls=False, use_gpu=False, drop_score=0.3,
        det_limit_side_len=320, tpu_det_bucket=320)


BARS = [(40, 60, 280, 88), (40, 130, 200, 158), (80, 210, 260, 238)]


def _bar_page():
    img = np.full((320, 320, 3), 245, np.uint8)
    for (x0, y0, x1, y1) in BARS:
        img[y0:y1, x0:x1] = 8
    return img


def test_graph_backend_full_pipeline(graph_model):
    from onnxocr_tpu.ops.ctc import CTCLabelDecode
    from onnxocr_tpu import config as cfg

    res = graph_model.ocr(_bar_page())
    assert len(res) == 1
    items = res[0]
    assert len(items) == len(BARS), [i[1] for i in items]

    # the decoder's character[1] is what CTC class 1 decodes to
    dec = CTCLabelDecode(cfg.find_asset("ppocrv5/ppocrv5_dict.txt"),
                         use_space_char=True)
    want = dec.character[1]

    # sorted_boxes returns top-to-bottom; each bar center must fall inside
    # its (unclipped) detected quad, and every solid bar reads as ONE
    # dedup-collapsed class-1 char at high confidence
    for (box, (text, score)), bar in zip(items, BARS):
        box = np.asarray(box)
        cx, cy = (bar[0] + bar[2]) / 2, (bar[1] + bar[3]) / 2
        assert box[:, 0].min() < cx < box[:, 0].max(), (box, bar)
        assert box[:, 1].min() < cy < box[:, 1].max(), (box, bar)
        # the interior ink run decodes to a class-1 char run; the toy
        # graph may add one extra char when the final valid-T token mixes
        # white margin with zero padding (pad cells read "dark" here), so
        # assert the alphabet and a tight length, not an exact singleton
        assert set(text) == {want} and 1 <= len(text) <= 2, (text, want)
        assert score > 0.5


def test_graph_backend_det_only(graph_model):
    boxes = graph_model.ocr(_bar_page(), rec=False, cls=False)[0]
    assert len(boxes) == len(BARS)


def test_graph_backend_device_extraction(graph_model):
    """The device DB-extraction path (tpu_det_postprocess='device') over a
    GRAPH det must agree with the host-contract boxes on blob geometry."""
    from onnxocr_tpu import ONNXPaddleOcr
    det_dir = graph_model.args.det_model_dir
    rec_dir = graph_model.args.rec_model_dir
    m2 = ONNXPaddleOcr(det_model_dir=det_dir, rec_model_dir=rec_dir,
                       use_angle_cls=False, use_gpu=False, drop_score=0.3,
                       det_limit_side_len=320, tpu_det_bucket=320,
                       tpu_det_postprocess="device")
    res = m2.ocr(_bar_page())
    items = res[0]
    assert len(items) == len(BARS)
    ref = graph_model.ocr(_bar_page())[0]
    for (b2, (t2, _)), (b1, (t1, _)) in zip(items, ref):
        # same class-1 alphabet; exact repeat count may differ by one at
        # the pad-boundary token when box geometry shifts ~1px between the
        # two extraction contracts (see test_graph_backend_full_pipeline)
        assert set(t2) == set(t1) and abs(len(t2) - len(t1)) <= 1
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=4)
