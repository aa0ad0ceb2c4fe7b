"""Drop-in compatibility: reference import paths + app module registration
(the TPU analog of the reference's test_python37.py import checks)."""
import importlib

import numpy as np
import pytest


REFERENCE_IMPORTS = [
    ("onnxocr.onnx_paddleocr", ["ONNXPaddleOcr", "sav2Img"]),
    ("onnxocr.predict_system", ["TextSystem", "sorted_boxes"]),
    ("onnxocr.predict_det", ["TextDetector"]),
    ("onnxocr.predict_rec", ["TextRecognizer"]),
    ("onnxocr.predict_cls", ["TextClassifier"]),
    ("onnxocr.db_postprocess", ["DBPostProcess"]),
    ("onnxocr.rec_postprocess", ["CTCLabelDecode"]),
    ("onnxocr.cls_postprocess", ["ClsPostProcess"]),
    ("onnxocr.ocr_images_pdfs", ["OCRLogic", "pdf_to_images"]),
    ("onnxocr.utils", ["infer_args", "str2bool", "get_rotate_crop_image",
                       "draw_ocr", "base64_to_cv2"]),
]


@pytest.mark.parametrize("module,names", REFERENCE_IMPORTS)
def test_reference_import_paths(module, names):
    mod = importlib.import_module(module)
    for name in names:
        assert hasattr(mod, name), f"{module}.{name} missing"


def test_infer_args_defaults_match_reference():
    from onnxocr.utils import infer_args
    parser = infer_args()
    d = {a.dest: a.default for a in parser._actions}
    # the live flags and their reference defaults (utils.py:251-387)
    assert d["det_limit_side_len"] == 960.0
    assert d["det_limit_type"] == "max"
    assert d["det_db_thresh"] == 0.3
    assert d["det_db_box_thresh"] == 0.6
    assert d["det_db_unclip_ratio"] == 1.5
    assert d["rec_algorithm"] == "SVTR_LCNet"
    assert d["rec_image_shape"] == "3, 48, 320"
    assert d["rec_batch_num"] == 6
    assert d["drop_score"] == 0.5
    assert d["use_angle_cls"] is False
    assert d["cls_image_shape"] == "3, 48, 192"
    assert d["cls_thresh"] == 0.9
    assert d["cls_batch_num"] == 6
    assert d["use_space_char"] is True
    assert d["label_list"] == ["0", "180"]


def test_service_routes_registered():
    from onnxocr_tpu.service.routes import build_app
    app = build_app()
    patterns = [regex.pattern for _m, regex, _f in app._routes]
    for want in ("^/ocr$", "^/health$", "^/api/v2/ocr$",
                 "^/api/v2/healthz$", "^/api/v2/readyz$",
                 "^/api/v2/tasks/(?P<task_id>[^/]+)$",
                 "^/download/(?P<timestamp>[^/]+)$", "^/$"):
        assert want in patterns, f"route {want} not registered"


def test_settings_env_names():
    from onnxocr_tpu.service.settings import Settings
    s = Settings()
    for attr in ("HOST", "PORT", "WORKERS", "THREADS", "DEFAULT_MODEL",
                 "MODEL_POOL_SIZE", "MODEL_CONCURRENCY", "USE_GPU",
                 "WARMUP", "MAX_UPLOAD_MB", "MAX_CONTENT_LENGTH",
                 "LOG_LEVEL", "RESULTS_DIR", "UPLOADS_DIR"):
        assert hasattr(s, attr)
    assert s.DEFAULT_MODEL == "PP-OCRv5"
    assert s.MAX_UPLOAD_MB == 50
