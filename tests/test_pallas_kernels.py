"""Pallas kernels, validated in interpreter mode on CPU (compiled-mode
parity is exercised on TPU by bench/integration runs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from onnxocr_tpu.ops.pallas.ctc_head import ctc_head_reduce, \
    ctc_head_reduce_batched


def _reference(x, w, b):
    logits = x @ w + b
    sm = np.exp(logits - logits.max(-1, keepdims=True))
    sm = sm / sm.sum(-1, keepdims=True)
    return logits.argmax(-1), sm.max(-1)


def test_ctc_head_reduce_matches_reference():
    rng = np.random.default_rng(0)
    M, D, V = 100, 192, 5000
    x = rng.normal(size=(M, D)).astype(np.float32)
    w = (rng.normal(size=(D, V)) * 0.1).astype(np.float32)
    b = rng.normal(size=(V,)).astype(np.float32)
    idx, prob = ctc_head_reduce(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), interpret=True)
    ref_idx, ref_prob = _reference(x, w, b)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(prob), ref_prob, rtol=1e-5,
                               atol=1e-6)


def test_ctc_head_reduce_vocab_padding_never_wins():
    rng = np.random.default_rng(1)
    # V chosen so padding to the 2048 tile adds nearly a full tile
    M, D, V = 10, 64, 2049
    x = rng.normal(size=(M, D)).astype(np.float32)
    w = (rng.normal(size=(D, V)) * 0.1).astype(np.float32)
    b = rng.normal(size=(V,)).astype(np.float32)
    idx, prob = ctc_head_reduce(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), interpret=True)
    assert np.asarray(idx).max() < V
    ref_idx, ref_prob = _reference(x, w, b)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(prob), ref_prob, rtol=1e-5,
                               atol=1e-6)


def test_ctc_head_batched_shape():
    rng = np.random.default_rng(2)
    N, T, D, V = 3, 40, 192, 300
    feats = rng.normal(size=(N, T, D)).astype(np.float32)
    w = (rng.normal(size=(D, V)) * 0.1).astype(np.float32)
    b = np.zeros(V, np.float32)
    idx, prob = ctc_head_reduce_batched(jnp.asarray(feats), jnp.asarray(w),
                                        jnp.asarray(b), interpret=True)
    assert idx.shape == (N, T) and prob.shape == (N, T)
    ref_idx, ref_prob = _reference(feats.reshape(-1, D), w, b)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), ref_idx)


# ------------------------------------------------- band-sparse seg reduce
def _seg_refs(slot, vals, K, big=3.4e38):
    n, C = vals.shape
    sums = np.zeros((K, C), np.float32)
    mins = np.full((K, C), big, np.float32)
    for i in range(n):
        s = slot[i]
        if s < K:
            sums[s] += vals[i]
            mins[s] = np.minimum(mins[s], vals[i])
    return sums, mins


def test_seg_bands_match_reference():
    from onnxocr_tpu.ops.pallas import seg_reduce
    rng = np.random.default_rng(2)
    K, N = 256, 3 * seg_reduce.BAND + 1000  # exercises padding + bands
    # raster-local slots: mostly ascending with jitter, plus no-op cells
    base = np.linspace(0, K - 1, N).astype(np.int32)
    slot = np.clip(base + rng.integers(-3, 4, N), 0, K).astype(np.int32)
    slot[rng.random(N) < 0.5] = K  # background cells
    vals = rng.normal(size=(N, 4)).astype(np.float32) * 100
    vals_min = np.where((slot < K)[:, None], vals, 3.4e38).astype(np.float32)
    vals_sum = np.where((slot < K)[:, None], vals, 0.0).astype(np.float32)

    sums = np.asarray(seg_reduce.seg_sum_bands(
        jnp.asarray(slot), jnp.asarray(vals_sum), K, interpret=True))
    mins = np.asarray(seg_reduce.seg_min_bands(
        jnp.asarray(slot), jnp.asarray(vals_min), K, interpret=True))
    ref_sums, ref_mins = _seg_refs(slot, vals_sum, K)
    np.testing.assert_allclose(sums, ref_sums, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(mins, ref_mins, rtol=1e-6, atol=1e-5)


def test_seg_bands_empty_and_full_slots():
    from onnxocr_tpu.ops.pallas import seg_reduce
    K, N = 128, 4000
    slot = np.full((N,), K, np.int32)   # nothing hits
    vals = np.ones((N, 2), np.float32)
    sums = np.asarray(seg_reduce.seg_sum_bands(
        jnp.asarray(slot), jnp.zeros((N, 2), jnp.float32), K,
        interpret=True))
    assert (sums == 0).all()
    mins = np.asarray(seg_reduce.seg_min_bands(
        jnp.asarray(slot), jnp.full((N, 2), 3.4e38, np.float32), K,
        interpret=True))
    assert (mins >= 3.0e38).all()


def test_device_boxes_pallas_mode_cpu_fallback():
    """reduce='pallas' on a non-TPU backend must produce the scan result
    (the kernel is TPU-only; CPU falls back inside device_boxes)."""
    from onnxocr_tpu.ops import db_device
    prob = np.zeros((64, 96), np.float32)
    prob[10:20, 8:60] = 0.9
    prob[30:42, 20:80] = 0.8
    a = db_device.device_boxes(jnp.asarray(prob), 64, 96, max_k=128,
                               reduce="pallas")
    b = db_device.device_boxes(jnp.asarray(prob), 64, 96, max_k=128,
                               reduce="scan")
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_device_boxes_dot_mode_matches_scan():
    """reduce='dot' (MXU one-hot matmul at HIGHEST precision) must match
    the scan lowering on every output (CPU: HIGHEST == exact f32)."""
    from onnxocr_tpu.ops import db_device
    rng = np.random.default_rng(3)
    prob = (rng.random((96, 128)) * 0.25).astype(np.float32)
    prob[12:22, 10:70] = 0.85
    prob[40:52, 30:110] = 0.75
    prob[70:78, 5:40] = 0.9
    a = db_device.device_boxes(jnp.asarray(prob), 96, 128, max_k=128,
                               reduce="dot")
    b = db_device.device_boxes(jnp.asarray(prob), 96, 128, max_k=128,
                               reduce="scan")
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    v = np.asarray(b[2])
    np.testing.assert_allclose(np.asarray(a[0])[v], np.asarray(b[0])[v],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(a[1])[v], np.asarray(b[1])[v],
                               atol=1e-5)


def test_label_keyed_kernels_match_reference():
    from onnxocr_tpu.ops.pallas import seg_reduce2
    rng = np.random.default_rng(7)
    H, W, K = 48, 512, 256
    # raster-local labels: blobs with seeds = first raster index + 1
    lab = np.zeros((H, W), np.int32)
    blobs = []
    for i in range(40):
        y, x = rng.integers(0, H - 6), rng.integers(0, W - 24)
        h, w = rng.integers(2, 6), rng.integers(4, 24)
        lab[y:y + h, x:x + w] = 0  # carve below
        blobs.append((y, x, h, w))
    for y, x, h, w in blobs:
        seed = y * W + x + 1
        lab[y:y + h, x:x + w] = seed
    prob = rng.random((H, W)).astype(np.float32)
    seeds = np.unique(lab[lab > 0])
    maxint = np.int32(2147483647)
    ids = np.full((K,), maxint, np.int32)
    ids[:len(seeds)] = np.sort(seeds)

    sy, sx = 2, 1  # exercise the coordinate scaling
    sums = np.asarray(seg_reduce2.label_moment_sums(
        jnp.asarray(lab), jnp.asarray(prob), jnp.asarray(ids), W=W,
        sy=sy, sx=sx, interpret=True))
    ys, xs = np.mgrid[0:H, 0:W]
    fx = xs * sx + (sx - 1) * 0.5
    fy = ys * sy + (sy - 1) * 0.5
    for k, s in enumerate(seeds):
        m = lab == s
        ref = [m.sum(), fx[m].sum(), fy[m].sum(), (fx[m] ** 2).sum(),
               (fy[m] ** 2).sum(), (fx[m] * fy[m]).sum(), prob[m].sum()]
        np.testing.assert_allclose(sums[k], ref, rtol=1e-5, atol=1e-2)
    assert (sums[len(seeds):] == 0).all()

    axes = rng.normal(size=(K, 2)).astype(np.float32)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    ext = np.asarray(seg_reduce2.label_proj_extents(
        jnp.asarray(lab), jnp.asarray(axes), jnp.asarray(ids), W=W,
        sy=sy, sx=sx, interpret=True))
    for k, s in enumerate(seeds):
        m = lab == s
        ux, uy = axes[k]
        pu = fx[m] * ux + fy[m] * uy
        pv = -fx[m] * uy + fy[m] * ux
        ref = [pu.min(), pv.min(), (-pu).min(), (-pv).min()]
        np.testing.assert_allclose(ext[k], ref, rtol=1e-5, atol=1e-4)
    assert (ext[len(seeds):] >= 3e38).all()


def test_device_boxes_pallas2_cpu_fallback():
    from onnxocr_tpu.ops import db_device
    prob = np.zeros((64, 96), np.float32)
    prob[10:20, 8:60] = 0.9
    prob[30:42, 20:80] = 0.8
    a = db_device.device_boxes(jnp.asarray(prob), 64, 96, max_k=128,
                               reduce="pallas2")
    b = db_device.device_boxes(jnp.asarray(prob), 64, 96, max_k=128,
                               reduce="scan")
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_axis_snap_straightens_small_tilt():
    """tpu_det_axis_snap: a slightly-tilted component yields an exactly
    axis-aligned quad; a strongly-tilted one keeps its PCA axis."""
    from onnxocr_tpu.ops import db_device
    import cv2
    H, W = 128, 256
    # ~1.5 deg tilted bar
    img = np.zeros((H, W), np.float32)
    cv2.ellipse(img, ((100, 40), (140, 12), 1.5), 0.9, -1)
    # ~20 deg tilted bar
    cv2.ellipse(img, ((120, 90), (120, 12), 20.0), 0.9, -1)
    q, s, v = db_device.device_boxes(jnp.asarray(img), H, W, max_k=64,
                                     axis_snap=0.06)
    quads = np.asarray(q)[np.asarray(v)]
    assert len(quads) == 2
    # sort by y: first = small tilt (snapped), second = 20 deg
    quads = quads[np.argsort(quads[:, 0, 1])]
    top, bot = quads[0], quads[1]
    # snapped: top edge exactly horizontal
    assert abs(top[0, 1] - top[1, 1]) < 1e-3
    # unsnapped: strongly tilted edge survives
    assert abs(bot[0, 1] - bot[1, 1]) > 10.0
