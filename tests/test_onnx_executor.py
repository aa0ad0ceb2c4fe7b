"""ONNX wire parser + JAX graph executor tests."""
import numpy as np
import pytest

from onnxocr_tpu.onnx import ir
from onnxocr_tpu.onnx.executor import GraphExecutor


def test_parse_cls_model(cls_onnx_path):
    m = ir.load_model(cls_onnx_path)
    assert m.opset == 11
    assert m.graph.inputs[0].name == "x"
    assert m.graph.outputs[0].shape[-1] == 2
    op_types = {n.op_type for n in m.graph.nodes}
    assert {"Conv", "BatchNormalization", "HardSigmoid", "Softmax"} <= op_types


def test_executor_cls_softmax(cls_onnx_path):
    ex = GraphExecutor(cls_onnx_path, name="cls")
    x = np.random.default_rng(0).random((3, 3, 48, 192),
                                        dtype=np.float32) * 2 - 1
    out = np.asarray(ex(x)[0])
    assert out.shape == (3, 2)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)
    assert (out >= 0).all()


def test_executor_shape_bucket_cache(cls_onnx_path):
    ex = GraphExecutor(cls_onnx_path, name="cls")
    a = np.zeros((1, 3, 48, 192), np.float32)
    b = np.zeros((2, 3, 48, 192), np.float32)
    ex(a)
    ex(b)
    ex(a)
    assert len(ex._jitted) == 2  # one compile per shape signature


def test_executor_run_api(cls_onnx_path):
    ex = GraphExecutor(cls_onnx_path)
    x = np.zeros((1, 3, 48, 192), np.float32)
    outs = ex.run(None, {"x": x})
    assert isinstance(outs[0], np.ndarray)
    outs2 = ex.run([ex.output_names[0]], {"x": x})
    np.testing.assert_array_equal(outs[0], outs2[0])


def _make_conv_model():
    """Hand-encode a tiny ONNX model (Conv+Relu) to test the wire parser
    round-trip against numpy."""
    import struct

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def tag(f, w):
        return varint((f << 3) | w)

    def ld(f, payload):
        return tag(f, 2) + varint(len(payload)) + payload

    def vi(f, v):
        return tag(f, 0) + varint(v)

    def tensor(name, arr):
        t = b""
        for d in arr.shape:
            t += vi(1, d)
        t += vi(2, 1)  # float32
        t += ld(8, name.encode())
        t += ld(9, arr.astype("<f4").tobytes())
        return t

    w = np.random.default_rng(1).random((4, 3, 3, 3)).astype(np.float32)
    conv = (ld(1, b"x") + ld(1, b"w") + ld(2, b"c") + ld(4, b"Conv") +
            ld(5, ld(1, b"pads") + vi(8, 1) + vi(8, 1) + vi(8, 1) + vi(8, 1)
               + vi(20, 7)))
    relu = ld(1, b"c") + ld(2, b"y") + ld(4, b"Relu")
    vinfo_x = ld(1, b"x")
    vinfo_y = ld(1, b"y")
    graph = (ld(1, conv) + ld(1, relu) + ld(2, b"g") + ld(5, tensor("w", w))
             + ld(11, vinfo_x) + ld(12, vinfo_y))
    model = vi(1, 6) + ld(7, graph) + ld(8, ld(1, b"") + vi(2, 11))
    return model, w


def test_executor_tiny_conv_vs_numpy():
    blob, w = _make_conv_model()
    m = ir.parse_model(blob)
    ex = GraphExecutor(m, name="tiny")
    x = np.random.default_rng(2).random((1, 3, 8, 8)).astype(np.float32)
    out = np.asarray(ex({"x": x})[0])
    # direct numpy conv reference
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    ref = np.zeros((1, 4, 8, 8), np.float32)
    for o in range(4):
        for i in range(3):
            for dy in range(3):
                for dx in range(3):
                    ref[0, o] += xp[0, i, dy:dy + 8, dx:dx + 8] * w[o, i, dy, dx]
    ref = np.maximum(ref, 0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_bn_folding_preserves_outputs(cls_onnx_path):
    from onnxocr_tpu.onnx import ir as ir_mod
    ex_opt = GraphExecutor(ir_mod.load_model(cls_onnx_path), name="opt",
                           optimize=True)
    ex_raw = GraphExecutor(ir_mod.load_model(cls_onnx_path), name="raw",
                           optimize=False)
    assert ex_opt.folded_bn > 30  # 35 BN nodes in the cls graph
    assert len(ex_opt.nodes) < len(ex_raw.nodes)
    x = (np.random.default_rng(5).random((2, 3, 48, 192), dtype=np.float32)
         * 2 - 1)
    np.testing.assert_allclose(np.asarray(ex_opt(x)[0]),
                               np.asarray(ex_raw(x)[0]), atol=3e-5)
