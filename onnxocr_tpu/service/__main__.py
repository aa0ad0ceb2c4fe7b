"""Run the OCR service: python -m onnxocr_tpu.service"""
import asyncio
import logging

from .http import serve
from .routes import build_app
from .settings import settings

logging.basicConfig(level=getattr(logging, settings.LOG_LEVEL.upper(), 20),
                    format="%(asctime)s %(levelname)s %(name)s %(message)s")

app = build_app()
asyncio.run(serve(app, settings.HOST, settings.PORT))
