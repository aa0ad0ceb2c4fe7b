"""Engine manager unit tests (reference intent: docs/SERVICE_REDESIGN.md
test plan — run_ocr field shape + threshold filtering, registry params)."""
import asyncio

import numpy as np
import pytest

from onnxocr_tpu.service import engine as engine_mod


class FakeModel:
    def __init__(self):
        self.calls = 0

    def ocr(self, img, det=True, rec=True, cls=True):
        self.calls += 1
        box = [[0.0, 0.0], [10.0, 0.0], [10.0, 5.0], [0.0, 5.0]]
        return [[[box, ("high", 0.9)], [box, ("low", 0.3)]]]


@pytest.fixture()
def engine():
    engine_mod.reset_engine_manager()
    em = engine_mod.EngineManager(concurrency=2)
    fake = FakeModel()
    for name in engine_mod.MODEL_REGISTRY:
        em._models[name] = fake
    yield em
    engine_mod.reset_engine_manager()


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_run_ocr_returns_time_and_result(engine):
    img = np.zeros((10, 10, 3), np.uint8)
    t, result = _run(engine.run_ocr(img))
    assert t >= 0
    assert len(result[0]) == 2


def test_conf_threshold_post_filter(engine):
    """conf_threshold filters on top of drop_score (app/engine.py:138-145,
    quirk #10)."""
    img = np.zeros((10, 10, 3), np.uint8)
    _, result = _run(engine.run_ocr(img, conf_threshold=0.5))
    assert len(result[0]) == 1
    assert result[0][0][1][0] == "high"
    _, result = _run(engine.run_ocr(img, conf_threshold=None))
    assert len(result[0]) == 2


def test_model_registry_kwargs():
    engine_mod.reset_engine_manager()
    em = engine_mod.EngineManager()
    kw5 = em._get_model_kwargs("PP-OCRv5")
    assert kw5["use_angle_cls"] is True
    assert "ppocrv5" in kw5["det_model_dir"]
    assert "ppocrv5_dict" in kw5["rec_char_dict_path"]
    # quirk: v4 inherits the default (v5) dict — no override key
    kw4 = em._get_model_kwargs("PP-OCRv4")
    assert "rec_char_dict_path" not in kw4
    # server model: det/cls + v1 keys; rec routes to the CRNN family dir
    # (improvement over the reference, which ships no server rec)
    kws = em._get_model_kwargs("ch_ppocr_server_v2.0")
    assert "ch_ppocr_server_v2.0/rec" in kws["rec_model_dir"].replace(
        "\\", "/")
    assert "ppocr_keys_v1" in kws["rec_char_dict_path"]
    engine_mod.reset_engine_manager()


def test_model_cache_single_instance(engine):
    m1 = engine.get_model("PP-OCRv5")
    m2 = engine.get_model("PP-OCRv5")
    assert m1 is m2


def test_concurrency_semaphore_limits(engine):
    import threading
    active = []
    peak = []
    lock = threading.Lock()
    orig = engine._sync_ocr

    def slow(img, model_name=None, conf_threshold=None):
        import time
        with lock:
            active.append(1)
            peak.append(len(active))
        time.sleep(0.05)
        with lock:
            active.pop()
        return orig(img, model_name, conf_threshold)

    engine._sync_ocr = slow
    img = np.zeros((4, 4, 3), np.uint8)

    async def fire():
        await asyncio.gather(*[engine.run_ocr(img) for _ in range(6)])

    _run(fire())
    assert max(peak) <= engine.concurrency


def test_v4_family_checkpoints_load_without_fallback():
    """PP-OCRv4 det/rec have their own committed checkpoints (round-3):
    resolve_backend must load them directly, with no family-fallback
    warning (VERDICT r2 #3)."""
    import warnings
    from onnxocr_tpu import config as cfg
    from onnxocr_tpu.pipeline import backends

    for kind, rel, arch in (("det", "ppocrv4/det/det.onnx", "mbv3"),
                            ("rec", "ppocrv4/rec/rec.onnx", "svtr")):
        path = cfg.find_asset(rel)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any fallback warning fails
            params, src = backends._load_native_params(path, kind, arch)
        assert params is not None, f"no {kind} checkpoint at {path}"
        assert "ppocrv4" in src  # the family's own npz, not a fallback


def test_checkpoint_calibration_applies_and_user_wins():
    """Native det checkpoints ship calibration.json knobs (the synthetic-
    trained det is under-confident on real pages: box_thresh 0.6->0.4
    doubled held-out table recall). Calibration must apply on the default
    path but never override an explicitly passed flag, and the reference
    default must survive in config.DEFAULTS (parity)."""
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu import config as cfg
    from onnxocr_tpu.pipeline import backends

    assert cfg.DEFAULTS["det_db_box_thresh"] == 0.6  # reference parity
    calib = backends.checkpoint_calibration(
        cfg.find_asset("ppocrv5/det/native_params.npz"))
    assert calib.get("det_db_box_thresh") == 0.4

    m = ONNXPaddleOcr(use_angle_cls=False, use_gpu=False)
    assert m.text_detector.postprocess_op.box_thresh == 0.4

    m2 = ONNXPaddleOcr(use_angle_cls=False, use_gpu=False,
                       det_db_box_thresh=0.55)
    assert m2.text_detector.postprocess_op.box_thresh == 0.55

    # missing sidecar -> no calibration
    assert backends.checkpoint_calibration("/nonexistent/x.npz") == {}
