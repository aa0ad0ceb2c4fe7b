"""Legacy Flask-equivalent v1 service launcher (reference: app-service.py —
a Flask app exposing POST /ocr on port 5005). The TPU build serves the same
contract from the stdlib HTTP framework; this launcher preserves the
reference's entry point name and port."""
import asyncio
import logging

from onnxocr_tpu.service.http import serve
from onnxocr_tpu.service.routes import build_app

logging.basicConfig(level=logging.INFO)

if __name__ == "__main__":
    asyncio.run(serve(build_app(), "0.0.0.0", 5005))
