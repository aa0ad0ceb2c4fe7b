"""Native NHWC models: shapes, weight lift parity, CTC reduce."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from onnxocr_tpu.models import cls as cls_model
from onnxocr_tpu.models import dbnet, svtr, lift
from onnxocr_tpu.models import common as cm
from onnxocr_tpu.ops import ctc as ctc_ops


def test_cls_lift_parity(cls_onnx_path):
    """The hand-written NHWC cls model with lifted weights must reproduce the
    ONNX graph (interpreted by GraphExecutor) bit-close."""
    from onnxocr_tpu.onnx import ir
    from onnxocr_tpu.onnx.executor import GraphExecutor
    m = ir.load_model(cls_onnx_path)
    params = lift.lift_cls(m)
    ex = GraphExecutor(m, name="cls")
    x = (np.random.default_rng(0).random((4, 3, 48, 192), dtype=np.float32)
         * 2 - 1)
    ref = np.asarray(ex(x)[0])
    out = np.asarray(jax.jit(cls_model.apply)(params,
                                              np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(ref, out, atol=2e-5)


def test_cls_real_image_orientation(cls_onnx_path, test_image):
    """Functional test with real weights: an upright text crop should score
    differently when flipped 180°, and the flipped crop should lean more
    towards the '180' class than the upright one."""
    import cv2
    from onnxocr_tpu.onnx import ir
    m = ir.load_model(cls_onnx_path)
    params = lift.lift_cls(m)
    # top band of a document page, resized to cls input
    crop = test_image[40:90, 100:420]
    up = cv2.resize(crop, (192, 48)).astype(np.float32) / 127.5 - 1.0
    down = up[::-1, ::-1].copy()
    probs = np.asarray(jax.jit(cls_model.apply)(
        params, np.stack([up, down])))
    assert probs.shape == (2, 2)
    # P(180 | flipped) > P(180 | upright)
    assert probs[1, 1] > probs[0, 1]


def test_dbnet_shapes():
    p = dbnet.init(jax.random.PRNGKey(0))
    out = jax.jit(dbnet.apply)(p, jnp.zeros((1, 160, 320, 3)))
    assert out.shape == (1, 160, 320)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()


def test_svtr_shapes_and_time_axis():
    p = svtr.init(jax.random.PRNGKey(0), vocab_size=100)
    logits = jax.jit(svtr.apply)(p, jnp.zeros((2, 48, 320, 3)))
    assert logits.shape == (2, 40, 100)  # T = W/8


def test_ctc_reduce_logits_matches_softmax():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, 30)).astype(np.float32)
    idx, prob = ctc_ops.ctc_reduce_logits(jnp.asarray(logits))
    sm = np.exp(logits - logits.max(-1, keepdims=True))
    sm = sm / sm.sum(-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(idx), logits.argmax(-1))
    np.testing.assert_allclose(np.asarray(prob), sm.max(-1), rtol=1e-5)


def test_ctc_label_decode_semantics(tmp_path):
    dict_file = tmp_path / "dict.txt"
    dict_file.write_text("a\nb\nc\n", encoding="utf-8")
    dec = ctc_ops.CTCLabelDecode(str(dict_file), use_space_char=True)
    assert dec.character[:2] == ["blank", "a"]
    # dedup then blank-drop: [1,1,0,2,2,2,0,3] → "abc"
    idx = np.array([[1, 1, 0, 2, 2, 2, 0, 3]])
    prob = np.array([[0.9, 0.8, 0.5, 0.7, 0.6, 0.5, 0.5, 1.0]])
    [(text, score)] = dec.decode_indices(idx, prob, is_remove_duplicate=True)
    assert text == "abc"
    np.testing.assert_allclose(score, np.mean([0.9, 0.7, 1.0]), rtol=1e-6)
    # empty result → conf [0] quirk (rec_postprocess.py:77-78)
    [(t2, s2)] = dec.decode_indices(np.array([[0, 0]]),
                                    np.array([[0.9, 0.9]]),
                                    is_remove_duplicate=True)
    assert t2 == "" and s2 == 0.0


def test_param_cast_bf16():
    p = svtr.init(jax.random.PRNGKey(0), vocab_size=10)
    pb = cm.tree_cast(p, jnp.bfloat16)
    leaf = pb["head"]["w"]
    assert leaf.dtype == jnp.bfloat16


def test_dbnet_canvas_invariance():
    """With valid_hw masking, a padded det canvas computes the same prob
    map over the valid region as the exact-size canvas (the contract the
    fixed-canvas one-call mode and cross-canvas page batching rely on)."""
    import jax.numpy as jnp
    from onnxocr_tpu.models import dbnet

    p = dbnet.init(0)
    rng = np.random.default_rng(7)
    img = rng.standard_normal((1, 160, 320, 3)).astype(np.float32)
    exact = np.asarray(dbnet.apply(
        p, jnp.asarray(img),
        valid_hw=(jnp.asarray([160]), jnp.asarray([320]))))
    big = np.zeros((1, 320, 640, 3), np.float32)
    big[:, :160, :320] = img
    # nonzero garbage in the padding must not leak into the valid region
    big[:, 160:, :] = 3.0
    big[:, :, 320:] = -2.0
    padded = np.asarray(dbnet.apply(
        p, jnp.asarray(big),
        valid_hw=(jnp.asarray([160]), jnp.asarray([320]))))
    # XLA tiles/reassociates conv reductions differently per canvas shape,
    # so agreement is to float-accumulation noise, not bit-exact
    np.testing.assert_allclose(padded[:, :160, :320], exact, atol=1e-3)
    assert np.abs(padded[:, :160, :320] - exact).mean() < 1e-5


def test_svtr_width_mask_invariance():
    """With the attention width mask, a crop's valid tokens are identical
    whether it sits in a 320-wide or 640-wide bucket (the invariance the
    one-call pipeline's single static width relies on)."""
    import jax
    import jax.numpy as jnp
    from onnxocr_tpu.models import svtr

    params = svtr.init(0, vocab_size=32)
    rng = np.random.default_rng(3)
    # valid widths include ones within the conv receptive field of the
    # small bucket's edge (ADVICE r2: without conv-stage re-zeroing these
    # diverged by ~0.1 logits between buckets)
    for vw in (160, 313, 316, 320):
        crop = rng.standard_normal((1, 48, vw, 3)).astype(np.float32)
        small = np.zeros((1, 48, 320, 3), np.float32)
        big = np.full((1, 48, 640, 3), 2.5, np.float32)  # garbage pad
        small[:, :, :vw] = crop
        big[:, :, :vw] = crop
        # columns [vw, vt*8) inside the minimal token-aligned extent must
        # agree between buckets (the warp defines them identically);
        # replicate that here
        vt = int(np.ceil(vw / 8))
        big[:, :, vw:vt * 8] = 0.0
        vt = np.array([vt], np.int32)
        out_s = np.asarray(svtr.apply(params, jnp.asarray(small), vt))
        out_b = np.asarray(svtr.apply(params, jnp.asarray(big), vt))
        k = int(vt[0])
        np.testing.assert_allclose(out_s[:, :k], out_b[:, :k], atol=2e-4)
