"""Engine manager: model pool, concurrency gate, warmup, model registry.

Reference: app/engine.py:19-178. One process owns the TPU; requests pass an
asyncio.Semaphore then run in a thread executor (the jitted device calls
release the GIL during execution, so host pre/post of concurrent requests
overlaps device compute).

Model registry quirks preserved (SURVEY.md §7): PP-OCRv4 decodes with the
PP-OCRv5 dict (app/engine.py:69-74 passes no rec_char_dict_path override),
ch_ppocr_server_v2.0 ships det/cls only + the v1 keys dict.
"""
from __future__ import annotations

import asyncio
import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from .settings import settings
from .. import config as cfg_mod

MODEL_REGISTRY = {
    "PP-OCRv5": {
        "det_model_dir": "ppocrv5/det/det.onnx",
        "rec_model_dir": "ppocrv5/rec/rec.onnx",
        "cls_model_dir": "ppocrv5/cls/cls.onnx",
        "rec_char_dict_path": "ppocrv5/ppocrv5_dict.txt",
    },
    "PP-OCRv4": {
        # quirk: no rec_char_dict_path override → decodes with the v5 dict
        "det_model_dir": "ppocrv4/det/det.onnx",
        "rec_model_dir": "ppocrv4/rec/rec.onnx",
        "cls_model_dir": "ppocrv4/cls/cls.onnx",
    },
    "ch_ppocr_server_v2.0": {
        "det_model_dir": "ch_ppocr_server_v2.0/det/det.onnx",
        "cls_model_dir": "ch_ppocr_server_v2.0/cls/cls.onnx",
        "rec_char_dict_path": "ch_ppocr_server_v2.0/ppocr_keys_v1.txt",
        # improvement over the reference (which ships no server rec at all,
        # app/engine.py:76): route rec to the CRNN family so a trained
        # native checkpoint under this dir makes the model switch functional
        "rec_model_dir": "ch_ppocr_server_v2.0/rec/rec.onnx",
    },
}


class EngineManager:
    def __init__(self, pool_size: Optional[int] = None,
                 concurrency: Optional[int] = None,
                 default_model: Optional[str] = None):
        self.pool_size = pool_size or settings.MODEL_POOL_SIZE
        self.concurrency = concurrency or settings.MODEL_CONCURRENCY
        self.default_model = default_model or settings.DEFAULT_MODEL
        self._models: Dict[str, object] = {}
        self._semaphore = asyncio.Semaphore(self.concurrency)
        self._lock = threading.Lock()
        self._ready = False

    def _get_model_kwargs(self, model_name: str) -> dict:
        kwargs = {"use_angle_cls": True, "use_gpu": settings.USE_GPU}
        reg = MODEL_REGISTRY.get(model_name, {})
        for key, rel in reg.items():
            kwargs[key] = cfg_mod.find_asset(rel)
        if self._det_batch:
            # cross-request det page batching: concurrent requests' DBNet
            # forwards coalesce into one device call (default on — the det
            # forward is the largest per-request device dispatch)
            kwargs["tpu_det_microbatch"] = True
        if self._rec_batch:
            # cross-request cls+rec crop batching: concurrent pages' crop
            # chunks fuse into one multi-source warp→cls→rec device call
            kwargs["tpu_rec_microbatch"] = True
        if self._micro_batch:
            # cross-request cls/rec crop batching through a host-side
            # MicroBatcher queue. Opt-in: it replaces the per-image fused
            # cls+rec call, and the host hop costs more than it saves when
            # device<->host bandwidth is the bottleneck (tunneled TPU).
            kwargs["tpu_fused_cls_rec"] = False
        if self._pipeline_mode == "onecall":
            # PIPELINE_MODE=onecall: one device program + one download per
            # page (pipeline/onecall.py) instead of the staged multi-call
            # path — squall-immune on high-RTT links (bench A/B in
            # PROGRESS.md); overflow pages fall back to staged.
            kwargs["tpu_pipeline"] = "onecall"
            kwargs.pop("tpu_det_microbatch", None)
            kwargs.pop("tpu_rec_microbatch", None)
            if self._wave_batch:
                # concurrent requests' pages coalesce into 2/4-page waves
                # through one vmapped program + one download per wave
                # (deadline-aware: lone requests never wait)
                kwargs["tpu_onecall_wave"] = True
        return kwargs

    @property
    def _pipeline_mode(self) -> str:
        import os
        mode = os.environ.get("PIPELINE_MODE", "")
        if mode:
            return mode
        # default: onecall on real TPU (one program + one download per
        # page — measured squall-immune and faster on the tunneled link,
        # BENCH r3/r4), staged elsewhere (CPU tests keep the cheap path)
        import jax
        return "onecall" if jax.default_backend() == "tpu" else "staged"

    @property
    def _det_batch(self) -> bool:
        import os
        return os.environ.get("DET_BATCH", "1").lower() in ("1", "true") \
            and self.concurrency > 1

    @property
    def _rec_batch(self) -> bool:
        import os
        return os.environ.get("REC_BATCH", "1").lower() in ("1", "true") \
            and self.concurrency > 1

    @property
    def _wave_batch(self) -> bool:
        # Default OFF since round 5: the shear-staged warp is single-page
        # only (vmap turns its lax.cond into a both-legs select), so
        # single-page dispatch beats waves under load — serve A/B @8
        # clients: singles 8.38 img/s p50 412.6 ms vs waves 8.67 / 514.2
        # (scratch/bench_service_r5{b,c}.log). WAVE_BATCH=1 restores
        # wave coalescing (RTT amortization for slow-link deployments).
        import os
        return os.environ.get("WAVE_BATCH", "0").lower() in ("1", "true") \
            and self.concurrency > 1

    @property
    def _micro_batch(self) -> bool:
        import os
        return os.environ.get("MICRO_BATCH", "").lower() in ("1", "true") \
            and self.concurrency > 1

    def get_model(self, model_name: Optional[str] = None):
        from ..pipeline.api import ONNXPaddleOcr
        model_name = model_name or self.default_model
        with self._lock:
            if model_name not in self._models:
                kwargs = self._get_model_kwargs(model_name)
                model = ONNXPaddleOcr(**kwargs)
                if self._det_batch:
                    self._maybe_shard_det(model)
                if self._micro_batch:
                    from ..runtime.batcher import BatchedForward
                    model.text_recognizer.forward = BatchedForward(
                        model.text_recognizer.forward)
                    if model.use_angle_cls:
                        model.text_classifier.forward = BatchedForward(
                            model.text_classifier.forward)
                self._models[model_name] = model
            return self._models[model_name]

    @staticmethod
    def _maybe_shard_det(model):
        """On a multi-chip host, re-enable det page batching with the page
        batch sharded over a data mesh (parallel/mesh.py): the engine's
        request stream fans out across chips with zero collectives."""
        try:
            import jax
            if len(jax.devices()) < 2:
                return
            from ..parallel import mesh as mesh_lib
            mesh = mesh_lib.make_mesh(model_parallel=1)
        except Exception:
            return
        det = getattr(model, "text_detector", None)
        if det is not None:
            det.enable_page_batching(mesh=mesh)

    async def run_ocr(self, img: np.ndarray,
                      model_name: Optional[str] = None,
                      conf_threshold: Optional[float] = None
                      ) -> Tuple[float, List[List]]:
        async with self._semaphore:
            loop = asyncio.get_event_loop()
            return await loop.run_in_executor(
                None, self._sync_ocr, img, model_name, conf_threshold)

    def _sync_ocr(self, img, model_name=None, conf_threshold=None):
        model = self.get_model(model_name)
        start = time.time()
        result = model.ocr(img)
        processing_time = time.time() - start
        # conf_threshold is a POST filter on top of drop_score
        # (app/engine.py:138-145, quirk #10)
        if conf_threshold is not None and result and result[0]:
            filtered = []
            for line in result[0]:
                if len(line) >= 2 and len(line[1]) >= 2:
                    if float(line[1][1]) >= conf_threshold:
                        filtered.append(line)
            result = [filtered]
        return processing_time, result

    def warmup(self):
        """OCR a 64x64 black image; readiness flips only on success
        (app/engine.py:149-163, quirk #13)."""
        if not settings.WARMUP:
            return
        try:
            test_img = np.zeros((64, 64, 3), dtype=np.uint8)
            model = self.get_model(self.default_model)
            model.ocr(test_img)
            self._warm_rec_coalesce(model)
            self._warm_onecall_waves(model)
            self._ready = True
        except Exception:
            self._ready = False

    @staticmethod
    def _warm_rec_coalesce(model):
        """Pre-compile the canonical cross-request rec programs so the
        first concurrent burst never stalls on XLA. The coalesced shape
        set is deterministic (RecCropBatcher.COALESCE_WIDTHS x {2,4} pages
        x max batch) per source bucket; buckets to warm come from
        WARMUP_SRC_BUCKETS ("512x768,1024x768" — HxW, rounded up to the
        256 source granularity). Failures are non-fatal: the persistent
        XLA compile cache makes cold hits a one-time cost anyway."""
        import os
        spec = os.environ.get("WARMUP_SRC_BUCKETS", "")
        if not spec:
            return
        rec = getattr(model, "text_recognizer", None)
        batcher = getattr(rec, "_crop_batcher", None)
        fused = getattr(model, "_fused", None)
        if batcher is None or fused is None:
            return
        det_b = getattr(model.text_detector, "_page_batcher", None)
        prob_shape = det_b.canvas if (det_b is not None and
                                      det_b.wire == "bits") else None
        from ..ops import resize_dev
        for part in spec.split(","):
            try:
                h, w = (int(x) for x in part.lower().split("x"))
            except ValueError:
                continue
            sb = resize_dev.src_bucket_shape(h, w) + (3,)
            batcher.warm_canonical(
                fused, sb, rec.rec_image_shape[1],
                use_cls=bool(model.use_angle_cls), prob_shape=prob_shape)

    @staticmethod
    def _warm_onecall_waves(model):
        """Pre-compile the onecall wave-tier programs for the buckets in
        WARMUP_SRC_BUCKETS (same contract as _warm_rec_coalesce) so the
        first concurrent burst coalesces immediately instead of running
        batch-1 until the background warm lands."""
        import os
        spec = os.environ.get("WARMUP_SRC_BUCKETS", "")
        oc = getattr(model, "_onecall", None)
        if not spec or oc is None or oc._wave is None:
            return
        from ..ops import det_pre, resize_dev
        det = model.text_detector
        cap = det_pre.round_up(int(det.limit_side_len), det.bucket)
        use_cls = bool(model.use_angle_cls)
        for part in spec.split(","):
            try:
                h, w = (int(x) for x in part.lower().split("x"))
            except ValueError:
                continue
            sb = resize_dev.src_bucket_shape(h, w) + (3,)
            # extraction-window key must match live dispatch: pages of
            # this spec size land at the window of their own (rh, rw)
            rh, rw = det_pre.det_resize_target(h, w, det.limit_side_len,
                                               det.limit_type)
            eh, ew = oc._ex_window(rh, rw, cap, cap)
            for tier in oc._wave.tiers:
                oc._wave.warm_sync(use_cls, sb, cap, cap, tier, eh, ew)

    @property
    def ready(self) -> bool:
        return self._ready


_engine_manager: Optional[EngineManager] = None


def get_engine_manager() -> EngineManager:
    global _engine_manager
    if _engine_manager is None:
        _engine_manager = EngineManager()
    return _engine_manager


def reset_engine_manager():
    global _engine_manager
    _engine_manager = None
