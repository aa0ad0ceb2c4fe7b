"""HTTP contract tests for the v1/v2 service (reference contracts:
app/routers/v1.py, v2.py). Runs against a fake OCR model so contracts are
exercised without device compiles."""
import base64
import json
import os

import numpy as np
import pytest

from onnxocr_tpu.service import engine as engine_mod
from onnxocr_tpu.service.http import TestClient
from onnxocr_tpu.service.routes import build_app
from onnxocr_tpu.service.settings import settings


class FakeModel:
    """Stands in for ONNXPaddleOcr: returns two fixed lines."""

    def ocr(self, img, det=True, rec=True, cls=True):
        box = [[10.0, 10.0], [100.0, 10.0], [100.0, 30.0], [10.0, 30.0]]
        return [[[box, ("hello", 0.95)], [box, ("world", 0.55)]]]


@pytest.fixture()
def client(tmp_path, monkeypatch):
    monkeypatch.setattr(settings, "RESULTS_DIR", str(tmp_path / "results"))
    engine_mod.reset_engine_manager()
    em = engine_mod.get_engine_manager()
    for name in engine_mod.MODEL_REGISTRY:
        em._models[name] = FakeModel()
    em._ready = True
    monkeypatch.setattr(engine_mod.EngineManager, "warmup", lambda self: None)
    yield TestClient(build_app())
    engine_mod.reset_engine_manager()


def _png_bytes():
    import cv2
    img = np.full((40, 60, 3), 200, np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return bytes(buf)


# ---------------------------------------------------------------------- v1
def test_v1_ocr_contract(client):
    b64 = base64.b64encode(_png_bytes()).decode()
    r = client.post("/ocr", json_body={"image": b64})
    assert r.status_code == 200
    data = r.json()
    assert "processing_time" in data
    assert len(data["results"]) == 2
    item = data["results"][0]
    assert set(item) == {"text", "confidence", "bounding_box"}
    assert item["text"] == "hello"
    assert len(item["bounding_box"]) == 4


def test_v1_missing_image_field(client):
    r = client.post("/ocr", json_body={})
    assert r.status_code == 400
    assert "error" in r.json()


def test_v1_bad_base64(client):
    r = client.post("/ocr", json_body={"image": "!!!notbase64"})
    assert r.status_code == 400
    assert "error" in r.json()


# ---------------------------------------------------------------------- v2
def test_v2_single_file_json(client):
    r = client.post("/api/v2/ocr",
                    files=[("file", ("a.png", _png_bytes(), "image/png"))],
                    data={"conf_threshold": "0.5"})
    assert r.status_code == 200
    data = r.json()
    assert "processing_time" in data and "results" in data
    assert data["results"][0]["text"] == "hello"


def test_v2_output_formats(client):
    for fmt, key in (("text", "text"), ("tsv", "tsv"), ("hocr", "hocr")):
        r = client.post("/api/v2/ocr",
                        files=[("file", ("a.png", _png_bytes(),
                                         "image/png"))],
                        data={"output_format": fmt})
        assert r.status_code == 200
        assert key in r.json()
    hocr = client.post("/api/v2/ocr",
                       files=[("file", ("a.png", _png_bytes(),
                                        "image/png"))],
                       data={"output_format": "hocr"}).json()["hocr"]
    assert "ocrx_word" in hocr and "hello" in hocr


def test_v2_no_files_400(client):
    r = client.post("/api/v2/ocr", data={"model_name": "PP-OCRv5"})
    assert r.status_code == 400
    assert r.json()["code"] == "VALIDATION_ERROR"


def test_v2_pdf_415(client):
    r = client.post("/api/v2/ocr",
                    files=[("file", ("doc.pdf", b"%PDF-1.4",
                                     "application/pdf"))])
    assert r.status_code == 415
    assert r.json()["code"] == "UNSUPPORTED_MEDIA_TYPE"


def test_v2_unsupported_type_415(client):
    r = client.post("/api/v2/ocr",
                    files=[("file", ("x.exe", b"MZ", "application/x-dos"))])
    assert r.status_code == 415


def test_v2_size_cap_413(client, monkeypatch):
    monkeypatch.setattr(settings, "MAX_CONTENT_LENGTH", 10)
    r = client.post("/api/v2/ocr",
                    files=[("file", ("a.png", _png_bytes(), "image/png"))])
    assert r.status_code == 413
    assert r.json()["code"] == "FILE_TOO_LARGE"


def test_v2_invalid_model_422(client):
    r = client.post("/api/v2/ocr",
                    files=[("file", ("a.png", _png_bytes(), "image/png"))],
                    data={"model_name": "nope"})
    assert r.status_code == 422


def test_v2_multi_file_text_zip(client):
    blob = _png_bytes()
    r = client.post("/api/v2/ocr",
                    files=[("files", ("a.png", blob, "image/png")),
                           ("files", ("b.png", blob, "image/png"))],
                    data={"output_format": "text"})
    assert r.status_code == 200
    data = r.json()
    assert len(data["items"]) == 2
    assert data["zip_url"].startswith("/download/")
    # and the zip downloads
    r2 = client.get(data["zip_url"])
    assert r2.status_code == 200
    assert r2.body[:2] == b"PK"


def test_v2_multi_file_json(client):
    blob = _png_bytes()
    r = client.post("/api/v2/ocr",
                    files=[("files", ("a.png", blob, "image/png")),
                           ("files", ("b.png", blob, "image/png"))])
    data = r.json()
    assert r.status_code == 200
    assert data["zip_url"] is None
    assert all("results" in item for item in data["items"])


# ------------------------------------------------------------------ health
def test_health_endpoints(client):
    assert client.get("/health").status_code == 200
    assert client.get("/api/v2/healthz").json()["status"] == "ok"
    assert client.get("/api/v2/readyz").json()["status"] == "ready"


def test_readyz_503_when_not_ready(client):
    engine_mod.get_engine_manager()._ready = False
    r = client.get("/api/v2/readyz")
    assert r.status_code == 503


def test_task_store_404(client):
    r = client.get("/api/v2/tasks/nonexistent")
    assert r.status_code == 404
    assert r.json()["code"] == "NOT_FOUND"


def test_request_id_passthrough(client):
    r = client.get("/health", headers={"X-Request-ID": "abc123"})
    assert r.headers["x-request-id"] == "abc123"
    assert "x-process-time" in r.headers


def test_ui_page(client):
    r = client.get("/")
    assert r.status_code == 200
    assert "PP-OCRv5" in r.text


def test_404_unknown_route(client):
    assert client.get("/nope").status_code == 404


def test_v2_return_image_preview(client):
    r = client.post("/api/v2/ocr",
                    files=[("file", ("a.png", _png_bytes(), "image/png"))],
                    data={"return_image": "true"})
    assert r.status_code == 200
    data = r.json()
    assert data["preview_image"]  # base64 JPEG overlay
    import base64 as b64mod
    blob = b64mod.b64decode(data["preview_image"])
    assert blob[:3] == b"\xff\xd8\xff"  # JPEG magic
    # default off
    r2 = client.post("/api/v2/ocr",
                     files=[("file", ("a.png", _png_bytes(), "image/png"))])
    assert r2.json()["preview_image"] is None


def test_ui_page_features(client):
    html = client.get("/").text
    for needle in ("tab-v1", "tab-v2", "conf", "return_image",
                   "bounding boxes", "zip_url", "canvas"):
        assert needle in html, needle
