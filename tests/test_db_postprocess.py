"""DB postprocess: synthetic prob maps → boxes, matching reference semantics
(onnxocr/db_postprocess.py)."""
import numpy as np
import pytest

from onnxocr_tpu.ops.db_post import DBPostProcess, box_score_fast


def _synthetic_map(h=160, w=320, rects=((20, 30, 120, 55), (40, 80, 300, 110))):
    """Prob map with hot rectangles (x0, y0, x1, y1)."""
    pred = np.zeros((h, w), np.float32)
    for x0, y0, x1, y1 in rects:
        pred[y0:y1, x0:x1] = 0.9
    return pred


def test_boxes_from_synthetic_map():
    pred = _synthetic_map()
    post = DBPostProcess(thresh=0.3, box_thresh=0.6, unclip_ratio=1.5,
                         box_type="quad")
    out = post({"maps": pred[None, None]},
               np.array([[160, 320, 1.0, 1.0]]))
    boxes = out[0]["points"]
    assert len(boxes) == 2
    # Each detected quad must cover its source rect (after 1.5 unclip, the
    # box is larger than the hot region but centered on it).
    centers = sorted([tuple(np.mean(b, axis=0)) for b in boxes])
    expected = sorted([(69.5, 42.0), (169.5, 94.5)])
    for (cx, cy), (ex, ey) in zip(centers, expected):
        assert abs(cx - ex) < 3 and abs(cy - ey) < 3


def test_box_thresh_filters_weak_boxes():
    pred = _synthetic_map(rects=((20, 30, 120, 55),))
    pred[pred > 0] = 0.4  # above thresh=0.3 but below box_thresh=0.6
    post = DBPostProcess(thresh=0.3, box_thresh=0.6)
    out = post({"maps": pred[None, None]}, np.array([[160, 320, 1.0, 1.0]]))
    assert len(out[0]["points"]) == 0


def test_min_size_filter():
    pred = np.zeros((160, 320), np.float32)
    pred[50:52, 100:102] = 0.95  # 2x2 blob < min_size 3
    post = DBPostProcess(thresh=0.3, box_thresh=0.6)
    out = post({"maps": pred[None, None]}, np.array([[160, 320, 1.0, 1.0]]))
    assert len(out[0]["points"]) == 0


def test_rescale_to_source_coords():
    pred = _synthetic_map(rects=((40, 40, 140, 60),))
    post = DBPostProcess(thresh=0.3, box_thresh=0.6, unclip_ratio=1.5)
    # map is 160x320; source was 320x640 (ratio 0.5)
    out = post({"maps": pred[None, None]},
               np.array([[320, 640, 0.5, 0.5]]))
    boxes = out[0]["points"]
    assert len(boxes) == 1
    center = np.mean(boxes[0], axis=0)
    assert abs(center[0] - 180) < 6 and abs(center[1] - 100) < 6
    assert boxes[0].dtype == np.int32


def test_box_score_fast_masked_mean():
    bitmap = np.zeros((50, 50), np.float32)
    bitmap[10:20, 10:30] = 0.8
    box = np.array([[10, 10], [29, 10], [29, 19], [10, 19]], np.float32)
    score = box_score_fast(bitmap, box)
    assert 0.75 <= score <= 0.85


def test_rotated_text_region():
    import cv2
    pred = np.zeros((200, 300), np.float32)
    quad = np.array([[50, 60], [200, 100], [190, 140], [40, 100]], np.int32)
    cv2.fillPoly(pred, [quad], 0.85)
    post = DBPostProcess(thresh=0.3, box_thresh=0.6, unclip_ratio=1.5)
    out = post({"maps": pred[None, None]}, np.array([[200, 300, 1.0, 1.0]]))
    boxes = out[0]["points"]
    assert len(boxes) == 1
    # detected box center close to quad centroid
    c = np.mean(boxes[0], axis=0)
    assert np.allclose(c, quad.mean(axis=0), atol=6)


def test_poly_mode():
    pred = _synthetic_map(rects=((20, 30, 160, 70),))
    post = DBPostProcess(thresh=0.3, box_thresh=0.6, unclip_ratio=1.5,
                         box_type="poly")
    out = post({"maps": pred[None, None]}, np.array([[160, 320, 1.0, 1.0]]))
    boxes = out[0]["points"]
    assert len(boxes) == 1
    assert len(boxes[0]) >= 4


def test_db_postprocess_runs_without_cv2(monkeypatch):
    """The DB postprocess path must be fully native (VERDICT r1 #6):
    block cv2 imports inside ops.db_post/ops.geometry and run every mode."""
    import builtins
    import onnxocr_tpu.ops.db_post as dbp

    real_import = builtins.__import__

    def guarded(name, *a, **k):
        if name == "cv2":
            import inspect
            frame = inspect.stack()[1]
            fn = frame.filename
            if "db_post" in fn or ("ops" in fn and "geometry" in fn):
                raise ImportError("cv2 blocked in DB postprocess path")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", guarded)

    prob = np.zeros((96, 96), np.float32)
    prob[20:40, 10:80] = 0.9
    prob[60:70, 30:60] = 0.95
    shape_list = np.array([[96, 96, 1.0, 1.0]])
    for kwargs in ({"box_type": "quad"},
                   {"box_type": "quad", "use_dilation": True},
                   {"box_type": "poly"},
                   {"box_type": "quad", "score_mode": "slow"}):
        post = dbp.DBPostProcess(thresh=0.3, box_thresh=0.6,
                                 unclip_ratio=1.5, **kwargs)
        out = post({"maps": prob[None, None]}, shape_list)
        assert len(out[0]["points"]) == 2, kwargs


def test_device_boxes_match_host_path():
    """ops/db_device.py (on-device CC + oriented quads) reproduces the host
    DB extraction on text-shaped synthetic maps."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import db_device

    prob = np.zeros((160, 192), np.float32)
    prob[20:40, 10:120] = 0.9                       # wide line
    for t in np.linspace(0, 1, 400):                # rotated bar
        x, y = 30 + t * 100, 70 + t * 55
        prob[int(y):int(y) + 8, int(x):int(x) + 8] = 0.85
    prob[140:142, 150:152] = 0.95                   # tiny → filtered

    quads, scores, valid = db_device.device_boxes(
        jnp.asarray(prob), 160, 192, max_k=16)
    quads = np.asarray(quads)[np.asarray(valid)]
    post = DBPostProcess(thresh=0.3, box_thresh=0.6, unclip_ratio=1.5)
    host = post({"maps": prob[None, None]},
                np.array([[160.0, 192.0, 1.0, 1.0]]))[0]["points"]
    assert len(quads) == len(host) == 2
    # each host quad has a device quad within 2px on every corner
    for hq in host:
        best = min(np.abs(np.sort(q.reshape(-1)) -
                          np.sort(np.asarray(hq, np.float32).reshape(-1))
                          ).max() for q in quads)
        assert best <= 2.5, best


def test_extract_scale_parse():
    from onnxocr_tpu.ops import db_device
    assert db_device.parse_extract_scale(1) == (1, 1)
    assert db_device.parse_extract_scale(2) == (2, 2)
    assert db_device.parse_extract_scale("1x2") == (1, 2)
    assert db_device.parse_extract_scale((2, 1)) == (2, 1)


def test_extract_scale_1x2_keeps_line_separation():
    """The anisotropic working grid must NOT merge text lines with tight
    vertical gaps — the failure that cost recall 0.664→0.615 when the
    isotropic scale-2 max-pool bridged 2 px gaps (round-4 A/B)."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import db_device

    H = W = 160
    prob = np.zeros((H, W), np.float32)
    y = 12  # 2 px gaps at odd alignment: the max-pool worst case
    rows = []
    for _ in range(4):
        prob[y:y + 5, 10:150] = 0.85
        rows.append(y)
        y += 5 + 2

    def n_boxes(scale):
        q, s, v = db_device.device_boxes(
            jnp.asarray(prob), jnp.int32(H), jnp.int32(W), max_k=32,
            thresh=0.3, box_thresh=0.4, unclip_ratio=1.5, min_size=3.0,
            scale=scale)
        return int(np.asarray(v).sum()), np.asarray(q)[np.asarray(v)]

    n1, q1 = n_boxes(1)
    n12, q12 = n_boxes((1, 2))
    assert n1 == 4
    assert n12 == 4  # x-only downsample keeps the 4 lines separate
    # geometry stays within ~1 px of the full-res extraction
    np.testing.assert_allclose(np.sort(q12[:, :, 1].mean(axis=1)),
                               np.sort(q1[:, :, 1].mean(axis=1)), atol=1.0)


def test_score_scale_pools_scores_only():
    """tpu_det_score_scale pools the SCORE grid only: box count and
    geometry are bit-identical to score_scale=1 (extraction is
    untouched); scores move only by the pooled-mean quantization."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import db_device

    H = W = 160
    prob = np.zeros((H, W), np.float32)
    prob[20:40, 10:120] = 0.9
    prob[60:80, 30:140] = 0.7
    prob[110:130, 20:90] = 0.85

    def run(score_scale):
        q, s, v = db_device.device_boxes(
            jnp.asarray(prob), jnp.int32(H), jnp.int32(W), max_k=16,
            thresh=0.3, box_thresh=0.4, unclip_ratio=1.5, min_size=3.0,
            scale=(1, 2), score_scale=score_scale)
        v = np.asarray(v)
        return np.asarray(q)[v], np.asarray(s)[v]

    q1, s1 = run(1)
    q2, s2 = run((2, 1))
    assert len(q1) == len(q2) == 3
    np.testing.assert_array_equal(q1, q2)  # geometry untouched
    # pooled-mean scores are DEFLATED by boundary-row dilution (a pooled
    # edge cell averages bar and background rows): ~2/height relative on
    # hard-edged bars, less on soft DBNet shrink maps. This bias gates
    # against box_thresh — why any non-1x1 value needs a held-out gate.
    np.testing.assert_allclose(s1, s2, rtol=0.13)
    assert (s2 <= s1 + 1e-6).all()


def test_score_k_subset_is_exact():
    """tpu_det_score_k scores only geometric survivors but must be
    OUTPUT-IDENTICAL to scoring everything: (a) typical pages (survivors
    fit the budget) take the subset branch, (b) survivor overflow takes
    the lax.cond full-K fallback — both must reproduce score_k=0 bit-for-
    bit on quads/scores/valid."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import db_device

    H = W = 160
    prob = np.zeros((H, W), np.float32)
    # 6 separated bars (geometric survivors), scores straddling box_thresh
    vals = [0.9, 0.45, 0.7, 0.35, 0.85, 0.5]
    for i, v in enumerate(vals):
        y = 8 + i * 24
        prob[y:y + 10, 10:140] = v
    # speckle field: components that FAIL min_size (present, not geo)
    rng = np.random.default_rng(7)
    for _ in range(30):
        y, x = rng.integers(4, H - 4), rng.integers(145, W - 3)
        prob[y, x] = 0.95
    jprob = jnp.asarray(prob)

    def run(score_k):
        return [np.asarray(a) for a in db_device.device_boxes(
            jprob, jnp.int32(H), jnp.int32(W), max_k=64, thresh=0.3,
            box_thresh=0.4, unclip_ratio=1.5, min_size=3.0,
            scale=(1, 2), score_k=score_k)]

    q0, s0, v0 = run(0)
    # subset branch: 6 survivors < budget 16
    q1, s1, v1 = run(16)
    # overflow branch: 6 survivors > budget 2 → cond falls back to full-K
    q2, s2, v2 = run(2)
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(v0, v2)
    np.testing.assert_array_equal(q0, q1)
    np.testing.assert_array_equal(q0, q2)
    # subset scores match on every VALID row (non-survivors score 0 in
    # the subset branch — they are invalid either way)
    np.testing.assert_array_equal(s0[v0], s1[v1])
    np.testing.assert_array_equal(s0[v0], s2[v2])
    assert v0.sum() >= 3  # the gate: several bars clear box_thresh


def test_db_reduce_scan_matches_scatter():
    """tpu_db_reduce='scan' (_seg_sum_scan/_seg_min_scan) is the same math
    as the scatter reductions, lowered differently — quads/scores/valid
    must agree to float tolerance, including the non-chunk-aligned pad
    path and the 1x2 working grid."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import db_device

    rng = np.random.default_rng(3)
    prob = np.zeros((160, 192), np.float32)
    prob[20:40, 10:120] = 0.9
    for t in np.linspace(0, 1, 400):
        x, y = 30 + t * 100, 70 + t * 55
        prob[int(y):int(y) + 8, int(x):int(x) + 8] = 0.85
    prob[120:134, 20:180] = 0.8 + rng.random((14, 160)).astype(np.float32) * .15
    jprob = jnp.asarray(prob)

    for scale in (1, (1, 2)):
        qa, sa, va = db_device.device_boxes(jprob, 160, 192, max_k=16,
                                            scale=scale, reduce="scatter")
        qb, sb, vb = db_device.device_boxes(jprob, 160, 192, max_k=16,
                                            scale=scale, reduce="scan")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        m = np.asarray(va)
        np.testing.assert_allclose(np.asarray(qa)[m], np.asarray(qb)[m],
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(sa)[m], np.asarray(sb)[m],
                                   atol=1e-4)
