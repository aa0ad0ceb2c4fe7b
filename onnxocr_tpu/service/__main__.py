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


def _absorb_first_download():
    """The tunneled TPU charges a one-time 69-208 s stall on the FIRST
    device→host download of a process (CLAUDE.md). Pay it on a side
    thread at boot so it overlaps model init/warmup instead of
    serializing in front of the first request (or the readiness gate)."""
    try:
        import numpy as np
        import jax
        np.asarray(jax.device_put(np.ones(128, np.uint8)))
    except Exception:  # diagnostics only — never block serving
        pass


if os.environ.get("JAX_PLATFORMS", "") != "cpu":
    import threading
    threading.Thread(target=_absorb_first_download, daemon=True).start()

logging.basicConfig(level=getattr(logging, settings.LOG_LEVEL.upper(), 20),
                    format="%(asctime)s %(levelname)s %(name)s %(message)s")

app = build_app()
asyncio.run(serve(app, settings.HOST, settings.PORT))
