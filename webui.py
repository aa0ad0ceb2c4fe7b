"""Legacy web-UI launcher (reference: webui.py — Flask batch-upload UI on
port 5000). Serves the TPU build's UI + v1/v2 APIs."""
import asyncio
import logging

from onnxocr_tpu.service.http import serve
from onnxocr_tpu.service.routes import build_app

logging.basicConfig(level=logging.INFO)

if __name__ == "__main__":
    asyncio.run(serve(build_app(), "0.0.0.0", 5000))
