"""Wave coalescing parity: concurrent one-call pages batched into one
vmapped program must reproduce the single-page onecall path exactly
(same packed-buffer contract per page). Also checks the deadline
behavior: a lone request dispatches batch-1 without waiting."""
import os
import threading
import time

import numpy as np
import pytest

from onnxocr_tpu import config as cfg_mod

_HAVE_CKPTS = (
    os.path.exists(cfg_mod.find_asset("ppocrv5/rec/native_params.npz")) and
    os.path.exists(cfg_mod.find_asset("ppocrv5/det/native_params.npz")))

pytestmark = pytest.mark.skipif(not _HAVE_CKPTS,
                                reason="trained checkpoints not available")


@pytest.fixture(scope="module")
def pages():
    from onnxocr_tpu.train import synth
    c2i = synth.charset_from_dict(
        cfg_mod.find_asset("ppocrv5/ppocrv5_dict.txt"))
    out = []
    for seed, ys in ((11, (40, 130)), (12, (60, 200))):
        r = synth.TextRenderer(char_to_idx=c2i, seed=seed)
        page = np.full((320, 640, 3), 235, np.uint8)
        for y in ys:
            line = r.render_line(r.random_text(8), 34, 560)
            lh, lw = line.shape[:2]
            page[y:y + lh, 30:30 + lw] = line
        out.append(page)
    return out


@pytest.fixture(scope="module")
def single_model():
    from onnxocr_tpu import ONNXPaddleOcr
    # wave programs keep the gather warp (vmap turns the shear cond into
    # a both-legs select), so the coalesced-vs-single parity reference
    # pins the same warp config
    return ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                         det_limit_side_len=640, tpu_det_bucket=320,
                         tpu_pipeline="onecall", tpu_warp_stage="off")


@pytest.fixture(scope="module")
def wave_model():
    from onnxocr_tpu import ONNXPaddleOcr
    return ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                         det_limit_side_len=640, tpu_det_bucket=320,
                         tpu_pipeline="onecall", tpu_onecall_wave=True,
                         tpu_onecall_wave_tiers="2")


def _results_equal(got, ref):
    assert [l[1][0] for l in got] == [l[1][0] for l in ref]
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        gb = np.asarray(g[0], np.float64)
        rb = np.asarray(r[0], np.float64)
        assert np.abs(gb - rb).max() <= 1e-3
        # 2e-3: lone requests dispatch through the single-page program,
        # which warps eligible crops via the shear-staged path while the
        # pinned reference gathers — scores differ at the sub-pixel
        # resample level, texts are identical
        assert abs(float(g[1][1]) - float(r[1][1])) < 2e-3


def test_wave_coalesced_pair_matches_single(pages, single_model,
                                            wave_model):
    from onnxocr_tpu.ops import resize_dev, det_pre
    oc = wave_model._onecall
    assert oc is not None and oc._wave is not None
    refs = [single_model.ocr(p)[0] for p in pages]

    det = wave_model.text_detector
    cap = det_pre.round_up(int(det.limit_side_len), det.bucket)
    sb = resize_dev.src_bucket_shape(*pages[0].shape[:2]) + (3,)
    # the wave key includes the extraction-window bucket (r5): warm the
    # tier at the window the pages will actually request
    rh, rw = det_pre.det_resize_target(
        pages[0].shape[0], pages[0].shape[1], det.limit_side_len,
        det.limit_type)
    eh, ew = oc._ex_window(rh, rw, cap, cap)
    oc._wave.warm_sync(True, sb, cap, cap, 2, eh, ew)
    key = (True, sb, cap, cap, eh, ew)
    assert (key, 2) in oc._wave._ready

    # hold the dispatcher so both requests queue together, then release
    oc._wave._hold = True
    results = [None, None]

    def run(i):
        results[i] = wave_model.ocr(pages[i])[0]

    threads = [threading.Thread(target=run, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    deadline = time.time() + 60
    while len(oc._wave._queue) < 2 and time.time() < deadline:
        time.sleep(0.02)
    assert len(oc._wave._queue) == 2
    with oc._wave._cv:
        oc._wave._hold = False
        oc._wave._cv.notify_all()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive()

    assert oc._wave.stats["waves"].get(2, 0) >= 1
    for got, ref in zip(results, refs):
        _results_equal(got, ref)


def test_wave_lone_request_runs_batch1(pages, single_model, wave_model):
    oc = wave_model._onecall
    before = dict(oc._wave.stats["waves"])
    got = wave_model.ocr(pages[0])[0]
    ref = single_model.ocr(pages[0])[0]
    _results_equal(got, ref)
    assert oc._wave.stats["waves"].get(1, 0) > before.get(1, 0)
