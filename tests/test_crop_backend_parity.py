"""Invariance: the TPU device-crop hot path and the reference-style host
(cv2) crop path must read the same text from the same page."""
import os

import numpy as np
import pytest

from onnxocr_tpu import config as cfg_mod

_HAVE_CKPTS = (
    os.path.exists(cfg_mod.find_asset("ppocrv5/rec/native_params.npz")) and
    os.path.exists(cfg_mod.find_asset("ppocrv5/det/native_params.npz")))

pytestmark = pytest.mark.skipif(not _HAVE_CKPTS,
                                reason="trained checkpoints not staged")


def _page():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from eval_e2e import render_page
    return render_page(123)


def _texts(model, page):
    res = model.ocr(page)
    return [line[1][0] for line in res[0]]


def test_device_and_host_crop_paths_agree():
    import warnings
    from onnxocr_tpu import ONNXPaddleOcr
    page, truths = _page()
    kwargs = dict(use_angle_cls=True, use_gpu=False, drop_score=0.3,
                  det_limit_side_len=640, tpu_det_bucket=320)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dev = ONNXPaddleOcr(tpu_crop_backend="device", **kwargs)
        host = ONNXPaddleOcr(tpu_crop_backend="host",
                             tpu_det_input="host", **kwargs)
    t_dev = _texts(dev, page)
    t_host = _texts(host, page)
    assert len(t_dev) == len(t_host)
    # identical strings for ≥80% of lines (interp-chain differences may
    # flip an ambiguous glyph occasionally)
    same = sum(a == b for a, b in zip(t_dev, t_host))
    assert same >= max(1, int(0.8 * len(t_dev))), (t_dev, t_host)


def test_det_input_modes_agree():
    import warnings
    from onnxocr_tpu import ONNXPaddleOcr
    page, _ = _page()
    kwargs = dict(use_angle_cls=False, use_gpu=False,
                  det_limit_side_len=640, tpu_det_bucket=320)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dev = ONNXPaddleOcr(tpu_det_input="device", **kwargs)
        host = ONNXPaddleOcr(tpu_det_input="host", **kwargs)
    boxes_dev = np.asarray(
        dev.ocr(page, det=True, rec=False)[0], dtype=np.float64)
    boxes_host = np.asarray(
        host.ocr(page, det=True, rec=False)[0], dtype=np.float64)
    assert len(boxes_dev) == len(boxes_host)
    # same boxes within a few pixels (bilinear resize on device vs cv2)
    d = np.abs(np.sort(boxes_dev.reshape(len(boxes_dev), -1), axis=0) -
               np.sort(boxes_host.reshape(len(boxes_host), -1), axis=0))
    assert d.max() <= 4.0
