"""Executor op coverage on synthesized graphs, validated against numpy /
torch(cpu) oracles."""
import numpy as np
import pytest

from onnxocr_tpu.onnx import ir
from onnxocr_tpu.onnx.executor import GraphExecutor

from onnx_builder import build_model, node_bytes


def _run(nodes, feeds, inputs, outputs, inits=None, opset=11):
    blob = build_model(nodes, inputs, outputs, inits, opset)
    ex = GraphExecutor(ir.parse_model(blob), name="t")
    return [np.asarray(o) for o in ex(feeds)]


def test_maxpool_ceil_mode():
    x = np.arange(1 * 1 * 5 * 5, dtype=np.float32).reshape(1, 1, 5, 5)
    [out] = _run([node_bytes("MaxPool", ["x"], ["y"],
                             {"kernel_shape": [2, 2], "strides": [2, 2],
                              "ceil_mode": 1})], {"x": x}, ["x"], ["y"])
    assert out.shape == (1, 1, 3, 3)
    assert out[0, 0, 2, 2] == 24  # last partial window


def test_averagepool_pads_exclude():
    x = np.ones((1, 1, 4, 4), np.float32)
    [out] = _run([node_bytes("AveragePool", ["x"], ["y"],
                             {"kernel_shape": [3, 3], "strides": [1, 1],
                              "pads": [1, 1, 1, 1]})], {"x": x}, ["x"], ["y"])
    # count_include_pad=0 → all ones regardless of border
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_conv_transpose_2x():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(1, 3, 6, 7)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(3, 5, 2, 2)).astype(np.float32)
    [out] = _run([node_bytes("ConvTranspose", ["x", "w"], ["y"],
                             {"strides": [2, 2], "kernel_shape": [2, 2]})],
                 {"x": x}, ["x"], ["y"], inits={"w": w})
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_resize_nearest_asymmetric():
    x = np.arange(4, dtype=np.float32).reshape(1, 1, 2, 2)
    scales = np.array([1, 1, 2, 2], np.float32)
    [out] = _run([node_bytes("Resize", ["x", "roi", "scales"], ["y"],
                             {"mode": "nearest",
                              "coordinate_transformation_mode": "asymmetric",
                              "nearest_mode": "floor"})],
                 {"x": x}, ["x"], ["y"],
                 inits={"roi": np.zeros(0, np.float32), "scales": scales})
    ref = x.repeat(2, axis=2).repeat(2, axis=3)
    np.testing.assert_array_equal(out, ref)


def test_resize_linear_half_pixel():
    import cv2
    x = np.random.default_rng(0).random((1, 1, 8, 10)).astype(np.float32)
    scales = np.array([1, 1, 2, 2], np.float32)
    [out] = _run([node_bytes("Resize", ["x", "roi", "scales"], ["y"],
                             {"mode": "linear",
                              "coordinate_transformation_mode":
                                  "half_pixel"})],
                 {"x": x}, ["x"], ["y"],
                 inits={"roi": np.zeros(0, np.float32), "scales": scales})
    ref = cv2.resize(x[0, 0], (20, 16), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out[0, 0], ref, rtol=1e-4, atol=1e-4)


def test_slice_negative_step():
    x = np.arange(10, dtype=np.float32).reshape(1, 10)
    [out] = _run([node_bytes("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
                 {"x": x}, ["x"], ["y"],
                 inits={"st": np.array([9], np.int64),
                        "en": np.array([-11], np.int64),
                        "ax": np.array([1], np.int64),
                        "sp": np.array([-1], np.int64)})
    np.testing.assert_array_equal(out[0], x[0, ::-1])


def test_lstm_bidirectional_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    T, N, I, H = 7, 2, 5, 4
    x = rng.normal(size=(T, N, I)).astype(np.float32)

    m = torch.nn.LSTM(I, H, bidirectional=True)
    with torch.no_grad():
        y_ref, (h_ref, c_ref) = m(torch.from_numpy(x))

    # torch gate order i,f,g,o → ONNX i,o,f,c
    def reorder(w):
        i, f, g, o = np.split(w, 4, axis=0)
        return np.concatenate([i, o, f, g], axis=0)

    W = np.stack([reorder(m.weight_ih_l0.detach().numpy()),
                  reorder(m.weight_ih_l0_reverse.detach().numpy())])
    R = np.stack([reorder(m.weight_hh_l0.detach().numpy()),
                  reorder(m.weight_hh_l0_reverse.detach().numpy())])
    B = np.stack([
        np.concatenate([reorder(m.bias_ih_l0.detach().numpy()),
                        reorder(m.bias_hh_l0.detach().numpy())]),
        np.concatenate([reorder(m.bias_ih_l0_reverse.detach().numpy()),
                        reorder(m.bias_hh_l0_reverse.detach().numpy())])])

    [Y, Yh, Yc] = _run(
        [node_bytes("LSTM", ["x", "W", "R", "B"], ["Y", "Yh", "Yc"],
                    {"direction": "bidirectional", "hidden_size": H})],
        {"x": x}, ["x"], ["Y", "Yh", "Yc"],
        inits={"W": W, "R": R, "B": B})

    # ONNX Y: (T, num_dir, N, H); torch: (T, N, 2H)
    y_mine = np.concatenate([Y[:, 0], Y[:, 1]], axis=-1)
    np.testing.assert_allclose(y_mine, y_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yh, h_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(Yc, c_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_gemm_transB_bias():
    a = np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(5, 4)).astype(np.float32)
    b = np.random.default_rng(2).normal(size=(5,)).astype(np.float32)
    [out] = _run([node_bytes("Gemm", ["a", "w", "b"], ["y"],
                             {"transB": 1})], {"a": a}, ["a"], ["y"],
                 inits={"w": w, "b": b})
    np.testing.assert_allclose(out, a @ w.T + b, rtol=1e-5, atol=1e-5)


def test_shape_arithmetic_reshape_static():
    # Shape → Gather → Unsqueeze → Concat(-1) → Reshape stays static
    x = np.random.default_rng(0).random((2, 3, 4)).astype(np.float32)
    nodes = [
        node_bytes("Shape", ["x"], ["s"]),
        node_bytes("Gather", ["s", "zero"], ["n"], {"axis": 0}),
        node_bytes("Unsqueeze", ["n"], ["n1"], {"axes": [0]}),
        node_bytes("Concat", ["n1", "minus1"], ["tgt"], {"axis": 0}),
        node_bytes("Reshape", ["x", "tgt"], ["y"]),
    ]
    [out] = _run(nodes, {"x": x}, ["x"], ["y"],
                 inits={"zero": np.array(0, np.int64),
                        "minus1": np.array([-1], np.int64)})
    np.testing.assert_array_equal(out, x.reshape(2, -1))


def test_hardsigmoid_hardswish():
    x = np.linspace(-4, 4, 9, dtype=np.float32).reshape(1, 9)
    [hs] = _run([node_bytes("HardSigmoid", ["x"], ["y"],
                            {"alpha": 1.0 / 6.0, "beta": 0.5})],
                {"x": x}, ["x"], ["y"])
    np.testing.assert_allclose(hs, np.clip(x / 6 + 0.5, 0, 1), atol=1e-6)
    [hw] = _run([node_bytes("HardSwish", ["x"], ["y"])], {"x": x},
                ["x"], ["y"])
    np.testing.assert_allclose(hw, x * np.clip(x / 6 + 0.5, 0, 1), atol=1e-6)
