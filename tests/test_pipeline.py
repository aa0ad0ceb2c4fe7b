"""Pipeline-level tests: det preprocessing semantics, sorted_boxes quirk,
batching routes, and the public ONNXPaddleOcr contract."""
import numpy as np
import pytest

from onnxocr_tpu.ops import det_pre
from onnxocr_tpu.pipeline import batching
from onnxocr_tpu.pipeline.system import sorted_boxes


def test_det_resize_target_rounding():
    # reference resize_image_type0 arithmetic (operators.py:99-127)
    assert det_pre.det_resize_target(1150, 720, 960, "max") == (960, 608)
    # note: python3 banker's rounding — 400/32 = 12.5 rounds to 12 → 384,
    # exactly as the reference computes it (operators.py:126-127)
    assert det_pre.det_resize_target(500, 400, 960, "max") == (512, 384)
    assert det_pre.det_resize_target(30, 20, 960, "max") == (32, 32)
    assert det_pre.det_resize_target(100, 2000, 960, "max") == (64, 960)
    assert det_pre.det_resize_target(736, 736, 736, "min") == (736, 736)
    assert det_pre.det_resize_target(368, 736, 736, "min") == (736, 1472)


def test_prepare_det_input_buckets_and_shape_info():
    img = np.zeros((1150, 720, 3), np.uint8)
    padded, shape_info, (rh, rw) = det_pre.prepare_det_input(img, 960, "max",
                                                             bucket=320)
    assert (rh, rw) == (960, 608)
    assert padded.shape == (960, 640, 3)
    src_h, src_w, ratio_h, ratio_w = shape_info
    assert (src_h, src_w) == (1150, 720)
    assert np.isclose(ratio_h, 960 / 1150)
    assert np.isclose(ratio_w, 608 / 720)


def test_prepare_det_input_tiny_image_pad_quirk():
    img = np.full((20, 20, 3), 255, np.uint8)
    padded, shape_info, (rh, rw) = det_pre.prepare_det_input(img, 960, "max",
                                                             bucket=32)
    # h+w < 64 → zero-pad to 32 first (operators.py:57-58, 72-76)
    assert rh >= 32 and rw >= 32


def test_sorted_boxes_bubble_quirk():
    # Same-line boxes (|dy| < 10) must be left-to-right; the pass is a
    # single bubble, not a full sort (predict_system.py:87-96).
    boxes = [np.array([[x, y], [x + 10, y], [x + 10, y + 8], [x, y + 8]],
                      np.float32)
             for x, y in [(200, 50), (10, 52), (100, 48)]]
    out = sorted_boxes(np.stack(boxes))
    xs = [b[0][0] for b in out]
    assert xs == sorted(xs)


def test_batching_buckets():
    ladder = (320, 480, 640)
    assert batching.pick_width_bucket(100, ladder) == 320
    assert batching.pick_width_bucket(480, ladder) == 480
    assert batching.pick_width_bucket(481, ladder) == 640
    # beyond the ladder top: extend on the 320-px grid up to the hard cap
    # instead of compressing very wide lines (ADVICE r1)
    assert batching.pick_width_bucket(700, ladder) == 960
    assert batching.pick_width_bucket(1921, ladder) == 2240
    assert batching.pick_width_bucket(9999, ladder) == batching.WIDTH_HARD_CAP
    groups = batching.group_by_bucket([100, 500, 300, 481], ladder)
    assert groups == {320: [0, 2], 640: [1, 3]}
    assert batching.pick_batch_bucket(3, (1, 2, 4, 8)) == 4
    assert batching.pick_batch_bucket(100, (1, 2, 4, 8)) == 8


@pytest.fixture(scope="module")
def model():
    from onnxocr_tpu import ONNXPaddleOcr
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                             tpu_det_bucket=160,
                             det_limit_side_len=320,
                             tpu_rec_width_buckets=(320,),
                             tpu_batch_buckets=(1, 2, 4, 8))


def test_ocr_det_rec_contract(model, test_image):
    import cv2
    small = cv2.resize(test_image, (360, 575))
    res = model.ocr(small, det=True, rec=True, cls=True)
    # result nesting: [[ [box(4x2 list), (text, score)], ... ]]
    assert isinstance(res, list) and len(res) == 1
    for item in res[0]:
        box, (text, score) = item
        assert len(box) == 4 and len(box[0]) == 2
        assert isinstance(text, str)
        assert 0.0 <= score <= 1.0
        assert score >= model.drop_score  # drop_score filter applied


def test_ocr_det_only_contract(model, test_image):
    import cv2
    small = cv2.resize(test_image, (360, 575))
    res = model.ocr(small, det=True, rec=False)
    assert isinstance(res, list) and len(res) == 1
    for box in res[0]:
        assert len(box) == 4


def test_ocr_rec_only_on_crops(model):
    crops = [np.full((48, 120, 3), 128, np.uint8),
             np.full((32, 200, 3), 200, np.uint8)]
    res = model.ocr(crops, det=False, rec=True, cls=True)
    assert len(res) == 1 and len(res[0]) == 2
    for text, score in res[0]:
        assert isinstance(text, str)


def test_ocr_cls_only_on_crops(model):
    crops = [np.full((48, 120, 3), 128, np.uint8)]
    res = model.ocr(crops, det=False, rec=False, cls=True)
    # returns [[ [label, score], ... ]]
    assert len(res) == 1
    label, score = res[0][0]
    assert label in ("0", "180")


def test_empty_image_gives_empty_results(model):
    blank = np.zeros((64, 64, 3), np.uint8)
    res = model.ocr(blank)
    assert res == [[]] or len(res[0]) >= 0  # must not raise


def test_rec_image_shape_quirk():
    from onnxocr_tpu import ONNXPaddleOcr
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        m = ONNXPaddleOcr(use_angle_cls=False, det_limit_side_len=320,
                          tpu_det_bucket=160)
    # quirk #1: forced to 3,48,320 before kwargs overlay
    assert m.args.rec_image_shape == "3, 48, 320"


def test_flat_src_upload_matches_host_pad():
    """put_src_bucket('flat') reconstructs the edge-padded source canvas
    bit-identically to np.pad(mode='edge') for assorted shapes, including
    ladder boundaries — downstream resize/warp programs see the same
    bytes, so the flat upload changes no result anywhere."""
    from onnxocr_tpu.ops import resize_dev
    rng = np.random.default_rng(9)
    for (h, w) in [(37, 53), (512, 512), (700, 961), (481, 1290)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        padded, _, _ = resize_dev.pad_src_bucket(img)
        canvas, sh, sw = resize_dev.put_src_bucket(img, mode="flat")
        assert (sh, sw) == (h, w)
        np.testing.assert_array_equal(np.asarray(canvas), padded)


def test_flat_len_ladder_is_bounded():
    from onnxocr_tpu.ops import resize_dev
    lad = resize_dev.LEN_LADDER_PX
    assert len(lad) < 16  # every entry is a compile key: keep it coarse
    assert all(b > a for a, b in zip(lad, lad[1:]))
    assert resize_dev.flat_len_bucket(1) == lad[0]
    assert resize_dev.flat_len_bucket(lad[3]) == lad[3]
    # beyond the ladder: exact size (degenerate, but never crashes)
    assert resize_dev.flat_len_bucket(lad[-1] + 7) == lad[-1] + 7
