"""onnxocr_tpu — a TPU-native OCR engine (JAX/XLA/Pallas) with the public
surface of ding113/OnnxOCR: the det→crop→cls→rec PaddleOCR pipeline, the
ONNXPaddleOcr API, batch image/PDF processing, and the v1/v2 HTTP services.
"""
__version__ = "0.1.0"

from .pipeline.api import ONNXPaddleOcr, sav2Img
from .pipeline.system import TextSystem, sorted_boxes

__all__ = ["ONNXPaddleOcr", "sav2Img", "TextSystem", "sorted_boxes"]

# Persistent XLA compile cache: first-process compiles land on disk and every
# later process (tests, bench, service workers) reuses them. Harmless no-op
# when jax was imported first with a cache already configured.
import os as _os

_cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                             _os.path.expanduser("~/.cache/onnxocr_tpu_xla"))
try:
    import jax as _jax

    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
except Exception:  # pragma: no cover - cache is best-effort
    pass
