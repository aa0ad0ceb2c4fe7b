"""Run the OCR service: python -m onnxocr_tpu.service"""
import asyncio
import logging
import os

if os.environ.get("JAX_PLATFORMS"):
    # honor the env var before any jax use — on this image the env alone
    # may not stick (plugins can win platform selection)
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from .http import serve
from .routes import build_app
from .settings import settings

logging.basicConfig(level=getattr(logging, settings.LOG_LEVEL.upper(), 20),
                    format="%(asctime)s %(levelname)s %(name)s %(message)s")

app = build_app()
asyncio.run(serve(app, settings.HOST, settings.PORT))
