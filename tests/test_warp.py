"""Device crop-warp kernel vs the reference cv2 chain."""
import math

import numpy as np
import pytest

from onnxocr_tpu.ops import warp


def _reference_chain(img, points, out_h, bucket_w, rotate180=False):
    """cv2 replication of get_rotate_crop_image + rec resize_norm_img
    (onnxocr/utils.py:12-53 + predict_rec.py:54-80)."""
    import cv2
    points = points.astype(np.float32)
    w = int(max(np.linalg.norm(points[0] - points[1]),
                np.linalg.norm(points[2] - points[3])))
    h = int(max(np.linalg.norm(points[0] - points[3]),
                np.linalg.norm(points[1] - points[2])))
    pts_std = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    M = cv2.getPerspectiveTransform(points, pts_std)
    dst = cv2.warpPerspective(img, M, (w, h),
                              borderMode=cv2.BORDER_REPLICATE,
                              flags=cv2.INTER_CUBIC)
    if dst.shape[0] / dst.shape[1] >= 1.5:
        dst = np.rot90(dst)
    if rotate180:
        dst = cv2.rotate(dst, 1)
    hh, ww = dst.shape[:2]
    resized_w = bucket_w if math.ceil(out_h * ww / hh) > bucket_w \
        else int(math.ceil(out_h * ww / hh))
    r = cv2.resize(dst, (resized_w, out_h)).astype(np.float32)
    r = (r / 255.0 - 0.5) / 0.5
    out = np.zeros((out_h, bucket_w, 3), np.float32)
    out[:, :resized_w] = r
    return out, resized_w


BOXES = [
    np.array([[50, 50], [250, 60], [248, 110], [48, 100]], np.float32),
    np.array([[300, 100], [340, 105], [330, 300], [290, 295]], np.float32),
    np.array([[100, 200], [400, 210], [398, 260], [98, 250]], np.float32),
]


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:400, 0:600]
    smooth = np.stack([xx % 256, yy % 256, (xx + yy) // 4 % 256], -1)
    noise = rng.integers(0, 30, smooth.shape)
    return np.clip(smooth + noise, 0, 255).astype(np.uint8)


def test_perspective_transform_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    src = np.float32([[50, 50], [250, 60], [248, 110], [48, 100]])
    dst = np.float32([[0, 0], [200, 0], [200, 55], [0, 55]])
    M_cv = cv2.getPerspectiveTransform(src, dst)
    M_my = warp.perspective_transform(src, dst)
    np.testing.assert_allclose(M_cv, M_my, atol=1e-9)


@pytest.mark.parametrize("rotate180", [False, True])
def test_warp_crops_parity(img, rotate180):
    pytest.importorskip("cv2")
    mats, vws, refs = [], [], []
    for b in BOXES:
        M, vw = warp.build_crop_matrix(b, 48, 320, rotate180=rotate180)
        ref, vw_ref = _reference_chain(img, b, 48, 320, rotate180=rotate180)
        assert vw == vw_ref
        mats.append(M)
        vws.append(vw)
        refs.append(ref)
    out = np.asarray(warp.warp_crops(
        img, np.stack(mats), np.array(vws, np.int32), 48, 320, "bicubic"))
    err = np.abs(out - np.stack(refs))
    # Single-resample composition vs the reference's double resample:
    # tolerance covers interpolation-chain differences only.
    assert err.mean() < 0.02
    assert np.percentile(err, 99) < 0.2


def test_warp_identity(img):
    h, w = img.shape[:2]
    box = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    M, vw = warp.build_crop_matrix(box, h, w)
    out = np.asarray(warp.warp_crops(img, M[None], np.array([vw], np.int32),
                                     h, w, "bilinear"))[0]
    ref = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_warp_pad_region_zeroed(img):
    box = np.float32([[50, 50], [150, 50], [150, 98], [50, 98]])
    M, vw = warp.build_crop_matrix(box, 48, 320)
    assert vw < 320
    out = np.asarray(warp.warp_crops(img, M[None], np.array([vw], np.int32),
                                     48, 320, "bilinear"))[0]
    assert np.all(out[:, vw:] == 0.0)


def test_host_warp_matches_device(img):
    mats, vws = [], []
    for b in BOXES:
        M, vw = warp.build_crop_matrix(b, 48, 320)
        mats.append(M)
        vws.append(vw)
    dev = np.asarray(warp.warp_crops(img, np.stack(mats),
                                     np.array(vws, np.int32), 48, 320,
                                     "bicubic"))
    host = warp.warp_crops_host(img, np.stack(mats), np.array(vws), 48, 320)
    assert np.abs(dev - host).mean() < 0.03


def test_staged_separable_matches_gather(img):
    """Upright crops through the staged fast path must match the gather
    warp (both are bilinear; identical up to f32 association)."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import warp as w

    # axis-aligned upright boxes of assorted sizes/positions
    boxes = [
        [[10, 12], [210, 12], [210, 60], [10, 60]],
        [[40, 80], [360, 80], [360, 118], [40, 118]],
        [[5, 5], [60, 5], [60, 22], [5, 22]],
    ]
    mats, widths = [], []
    for b in boxes:
        m, vw = w.build_crop_matrix(np.array(b, np.float32), 48, 320)
        mats.append(m)
        widths.append(vw)
    mats = jnp.asarray(np.stack(mats))
    vw = jnp.asarray(np.array(widths, np.int32))
    fast = w.warp_crops(jnp.asarray(img), mats, vw, 48, 320,
                        interp="bilinear", staged=True)
    slow = w.warp_crops(jnp.asarray(img), mats, vw, 48, 320,
                        interp="bilinear", staged=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=2e-3)


def test_staged_mixed_tilted_and_upright(img):
    """A tilted quad rides the gather path while upright neighbors take
    the staged path — outputs must match the all-gather reference."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import warp as w

    boxes = [
        [[10, 12], [210, 12], [210, 60], [10, 60]],           # upright
        [[50, 40], [240, 70], [230, 110], [40, 80]],          # tilted
    ]
    mats, widths = [], []
    for b in boxes:
        m, vw = w.build_crop_matrix(np.array(b, np.float32), 48, 320)
        mats.append(m)
        widths.append(vw)
    mats = jnp.asarray(np.stack(mats))
    vw = jnp.asarray(np.array(widths, np.int32))
    fast = w.warp_crops(jnp.asarray(img), mats, vw, 48, 320,
                        interp="bilinear", staged=True)
    slow = w.warp_crops(jnp.asarray(img), mats, vw, 48, 320,
                        interp="bilinear", staged=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=2e-3)


def _rot_box(cx, cy, cw, ch, angle_deg):
    th = np.deg2rad(angle_deg)
    ct, st = np.cos(th), np.sin(th)
    box = np.array([[-cw / 2, -ch / 2], [cw / 2, -ch / 2],
                    [cw / 2, ch / 2], [-cw / 2, ch / 2]], np.float64)
    return box @ np.array([[ct, st], [-st, ct]]) + [cx, cy]


def test_staged_shear_upright_exact(img):
    """b = d = 0 crops through the shear staged path reduce to the exact
    separable resample — equal to the gather warp up to f32 order."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import warp as w

    boxes = [
        [[10, 12], [210, 12], [210, 60], [10, 60]],
        [[40, 80], [360, 80], [360, 118], [40, 118]],
    ]
    mats, widths = [], []
    for b in boxes:
        m, vw = w.build_crop_matrix(np.array(b, np.float32), 48, 320)
        mats.append(m)
        widths.append(vw)
    mats = jnp.asarray(np.stack(mats))
    vw = jnp.asarray(np.array(widths, np.int32))
    fast = w.warp_crops(jnp.asarray(img), mats, vw, 48, 320,
                        interp="bilinear", staged="shear")
    slow = w.warp_crops(jnp.asarray(img), mats, vw, 48, 320,
                        interp="bilinear", staged=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               atol=2e-3)


def test_staged_shear_small_tilt_close(img):
    """Small-tilt crops (the real-page regime the axis snap failed on)
    take the shear staged path; the Catmull-Smith decomposition bounds
    the sampling-position error at |d/a| <= 0.3 px, so pixels must stay
    within a few intensity levels of the gather warp."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import warp as w

    mats, widths = [], []
    for (cx, cy, cw, ch, ang) in [(160, 60, 200, 24, 1.2),
                                  (200, 120, 260, 30, -2.4),
                                  (120, 90, 90, 14, 3.0)]:
        m, vw = w.build_crop_matrix(_rot_box(cx, cy, cw, ch, ang), 48, 320)
        mats.append(m)
        widths.append(vw)
    mats_j = jnp.asarray(np.stack(mats).astype(np.float32))
    vw = jnp.asarray(np.array(widths, np.int32))
    elig = np.asarray(w._shear_mask(mats_j, img.shape[0], vw, 48))
    assert elig.all(), f"small tilts must be shear-eligible: {elig}"
    fast = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                   interp="bilinear", staged="shear"))
    slow = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                   interp="bilinear", staged=False))
    for i, rw in enumerate(widths):
        d = np.abs(fast[i, :, :rw] - slow[i, :, :rw]) * 127.5  # levels
        assert d.mean() < 1.0, f"crop {i} mean {d.mean()}"
        # the fixture has a 255->0 sawtooth cliff: a <=0.3 px position
        # error there legitimately moves single pixels tens of levels,
        # so bound the bulk (p99) and leave the max as a sanity cap
        assert np.quantile(d, 0.99) < 10.0, f"crop {i} p99"
        assert d.max() < 80.0, f"crop {i} max {d.max()}"


def test_staged_shear_fallback_bit_equal(img):
    """Crops outside the shear envelope (steep tilt, rot90-composed
    verticals) must fall back to the gather path bit-for-bit."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import warp as w

    steep = _rot_box(160, 100, 180, 30, 25.0)       # 25 deg: way past tol
    tall = [[150, 20], [190, 20], [190, 170], [150, 170]]  # rot90 quirk
    mats, widths = [], []
    for b in (steep, tall):
        m, vw = w.build_crop_matrix(np.asarray(b, np.float32), 48, 320)
        mats.append(m)
        widths.append(vw)
    mats_j = jnp.asarray(np.stack(mats).astype(np.float32))
    vw = jnp.asarray(np.array(widths, np.int32))
    elig = np.asarray(w._shear_mask(mats_j, img.shape[0], vw, 48))
    assert not elig.any(), f"steep/rot90 crops must be ineligible: {elig}"
    fast = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                   interp="bilinear", staged="shear"))
    slow = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                   interp="bilinear", staged=False))
    assert np.array_equal(fast, slow)


def test_staged_shear_rounded_quad_fallback(img):
    """Onecall quads are rounded to integer source coords, deforming
    parallelograms into small-perspective quads whose fitted homography
    BOWS 1-2 px between corners (projective leverage). The interior
    probes must detect that and route such crops to the gather path
    bit-for-bit; integer-parallelogram quads (rounding that preserves
    opposite-side equality) must stay eligible."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import warp as w

    jit = np.array([[0.5, 0.5], [0, 0], [0, 0], [0, -0.5]],
                   np.float64)
    mats, widths, want_elig = [], [], []
    for (cx, cy, cw, ch, ang, j) in [(160, 60, 200, 24, 1.0, True),
                                     (200, 120, 260, 30, -1.7, True),
                                     (160, 60, 200, 24, 1.0, False)]:
        quad = np.round(_rot_box(cx, cy, cw, ch, ang))
        if j:
            quad = quad + jit    # rounding-deformed: genuine perspective
        m, vw = w.build_crop_matrix(quad, 48, 320)
        if j:
            assert max(abs(m[2, 0]), abs(m[2, 1])) > 1e-7
        mats.append(m)
        widths.append(vw)
        want_elig.append(not j)
    mats_j = jnp.asarray(np.stack(mats).astype(np.float32))
    vw = jnp.asarray(np.array(widths, np.int32))
    elig = np.asarray(w._shear_mask(mats_j, img.shape[0], vw, 48))
    assert list(elig) == want_elig, f"eligibility {elig} != {want_elig}"
    fast = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                   interp="bilinear", staged="shear"))
    slow = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                   interp="bilinear", staged=False))
    for i in range(2):   # bowed quads: gather path bit-for-bit
        assert np.array_equal(fast[i], slow[i]), f"crop {i} not fallback"
    d = np.abs(fast[2, :, :widths[2]] - slow[2, :, :widths[2]]) * 127.5
    assert d.mean() < 1.2 and np.quantile(d, 0.99) < 14.0


def test_staged_shear_slow_k_compaction(img):
    """The shear mode's gather leg runs on a compacted slow_k sub-batch
    (the full-K gather costs ~55 M taps/s regardless of locality). With
    ineligible crops <= slow_k the output must equal the uncompacted
    path; overflow (> slow_k) must lax.cond-fall back identically."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import warp as w

    boxes = [
        [[10, 12], [210, 12], [210, 60], [10, 60]],             # upright
        _rot_box(160, 100, 180, 30, 25.0),                      # steep
        _rot_box(300, 200, 200, 26, 1.4),                       # shear-ok
        _rot_box(260, 320, 150, 22, -30.0),                     # steep
        [[150, 20], [190, 20], [190, 170], [150, 170]],         # rot90
    ]
    mats, widths = [], []
    for b in boxes:
        m, vw = w.build_crop_matrix(np.asarray(b, np.float32), 48, 320)
        mats.append(m)
        widths.append(vw)
    mats_j = jnp.asarray(np.stack(mats).astype(np.float32))
    vw = jnp.asarray(np.array(widths, np.int32))
    ref = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                  interp="bilinear", staged="shear",
                                  slow_k=0))
    # 3 ineligible crops fit slow_k=4 → compacted small gather
    small = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                    interp="bilinear", staged="shear",
                                    slow_k=4))
    np.testing.assert_array_equal(small, ref)
    # slow_k=2 overflows (3 ineligible) → full-gather fallback, identical
    over = np.asarray(w.warp_crops(jnp.asarray(img), mats_j, vw, 48, 320,
                                   interp="bilinear", staged="shear",
                                   slow_k=2))
    np.testing.assert_array_equal(over, ref)
