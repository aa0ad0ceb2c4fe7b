"""Stage forwards: uniform device-callable wrappers over the two backends.

Each OCR stage (det / cls / rec) gets a `*Forward` object whose __call__ is a
jit-compiled TPU program with a fixed tensor contract, regardless of whether
the underlying network is

* **native** — hand-written NHWC JAX model from onnxocr_tpu/models (weights
  lifted from ONNX where available, loaded from trained checkpoints, or
  random-initialized), or
* **graph** — a user-provided .onnx interpreted by onnx.executor
  (NCHW; the wrapper fuses the uint8→normalized transform and the output
  reduction into the same jit so the contract matches the native path).

This replaces the reference's PredictBase onnxruntime session layer
(onnxocr/predict_base.py).
"""
from __future__ import annotations

import functools
import os
import threading
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..onnx.executor import GraphExecutor
from ..ops import ctc as ctc_ops
from ..ops import det_pre
from ..models import cls as cls_model
from ..models import dbnet, svtr, lift
from ..models import common as cm


class _JitCache:
    """Per-shape jit cache with a lock (GraphExecutor-style)."""

    def __init__(self, build: Callable):
        self._build = build
        self._fns: Dict[tuple, Any] = {}
        self._lock = threading.Lock()

    def get(self, key):
        fn = self._fns.get(key)
        if fn is None:
            with self._lock:
                fn = self._fns.get(key)
                if fn is None:
                    fn = self._build()
                    self._fns[key] = fn
        return fn


class _ParamsAsArgs:
    """Mixin: device-resident params passed as jit ARGUMENTS.

    Closing a jit over the weight pytree embeds every tensor as an HLO
    constant: each compiled program carries its own ~10-45 MB copy of the
    weights, XLA constant-folds over them (minutes-long compiles per shape
    bucket), and every program load re-ships them to the device. Passing
    the pytree as a traced argument keeps ONE HBM-resident copy shared by
    every shape bucket and shrinks program binaries to kilobytes — the
    TPU-serving analogue of the reference keeping one onnxruntime session
    for all input shapes (onnxocr/predict_base.py:7-17).
    """

    @property
    def pdev(self):
        """Device-resident weight pytree to pass as the jit's first arg."""
        if self.backend != "native":
            return self.executor._get_device_weights()
        p = getattr(self, "_pdev", None)
        if p is None:
            p = jax.device_put(self.params)
            self._pdev = p
        return p

    @property
    def pure_fn(self):
        """(params, *args) function suitable for composing into other jits
        (pipeline/fused.py, pipeline/onecall.py)."""
        return self._native_fn if self.backend == "native" else self._graph_fn


class DetForward(_ParamsAsArgs):
    """(Hb, Wb, 3) uint8 → (Hb, Wb) shrink-prob map.

    The wire dtype of the map is configurable (map_dtype): the axon tunnel's
    device→host bandwidth dominates end-to-end latency, so by default the
    map is quantized to uint8 (prob*255) on device and dequantized on host —
    4x fewer bytes for a <0.002 score perturbation.
    """

    def __init__(self, backend: str, model_path: Optional[str] = None,
                 params: Optional[dict] = None, dtype=jnp.float32,
                 map_dtype: str = "float32", arch: str = "mbv3"):
        self.backend = backend
        self.dtype = dtype
        self.map_dtype = map_dtype
        self.arch = arch
        if backend == "graph":
            self.executor = GraphExecutor(model_path, name="det")
        else:
            assert params is not None
            self.params = params
        self._jit = None

    def _encode(self, prob):
        if self.map_dtype == "uint8":
            # floor (not round): round can lift sub-threshold pixels above
            # det_db_thresh, and on maps whose background plateau sits near
            # the threshold that manufactures thousands of speckle contours
            # — enough to push real boxes past max_candidates
            return jnp.floor(prob * 255.0).astype(jnp.uint8)
        if self.map_dtype == "float16":
            return prob.astype(jnp.float16)
        return prob.astype(jnp.float32)

    @staticmethod
    def decode_map(arr: np.ndarray) -> np.ndarray:
        if arr.dtype == np.uint8:
            return arr.astype(np.float32) / 255.0
        return arr.astype(np.float32)

    # valid_hw plumbing: every det canvas is padded to a compile bucket;
    # the native mbv3 backbone masks its SE global pools to the (rh, rw)
    # valid region (models/dbnet.apply) so the prob map over the valid
    # region is canvas-invariant. The graph backend interprets a fixed
    # ONNX graph and keeps the reference's unmasked GlobalAveragePool.
    def _native_fn(self, p, x_u8, vhw):
        x = det_pre.normalize_det(x_u8)[None].astype(self.dtype)
        prob = dbnet.apply(p, x, backbone_arch=self.arch,
                           valid_hw=(vhw[0:1], vhw[1:2]))[0]
        return self._encode(prob.astype(jnp.float32))

    def _graph_fn(self, w, x_u8, vhw):
        x = det_pre.normalize_det(x_u8)[None].astype(jnp.float32)
        x = jnp.transpose(x, (0, 3, 1, 2))  # NCHW for the ONNX graph
        out = self.executor._interpret(w,
                                       {self.executor.input_names[0]: x})[0]
        return self._encode(out[0, 0])  # (1,1,H,W) → (H,W)

    def __call__(self, padded_u8: np.ndarray,
                 valid_hw=None) -> jax.Array:
        if self._jit is None:
            self._jit = jax.jit(self.pure_fn)
        if valid_hw is None:
            valid_hw = padded_u8.shape[:2]
        return self._jit(self.pdev, padded_u8, np.asarray(valid_hw, np.int32))

    # --- pre-normalized float input (device det-resize path) -------------
    def _native_fn_f32(self, p, x_f32, vhw):
        x = x_f32[None].astype(self.dtype)
        prob = dbnet.apply(p, x, backbone_arch=self.arch,
                           valid_hw=(vhw[0:1], vhw[1:2]))[0]
        return self._encode(prob.astype(jnp.float32))

    def _graph_fn_f32(self, w, x_f32, vhw):
        x = jnp.transpose(x_f32[None].astype(jnp.float32), (0, 3, 1, 2))
        out = self.executor._interpret(w,
                                       {self.executor.input_names[0]: x})[0]
        return self._encode(out[0, 0])

    def call_normalized(self, x_f32, valid_hw=None) -> jax.Array:
        if getattr(self, "_jit_f32", None) is None:
            fn = self._native_fn_f32 if self.backend == "native" \
                else self._graph_fn_f32
            self._jit_f32 = jax.jit(fn)
        if valid_hw is None:
            valid_hw = x_f32.shape[:2]
        return self._jit_f32(self.pdev, x_f32,
                             jnp.asarray(valid_hw, jnp.int32))

    # --- bitmap wire: forward + binarize + bitpack in one program --------
    def call_normalized_bits(self, x_f32, valid_hw, thresh: float
                             ) -> Tuple[jax.Array, jax.Array]:
        """Det forward returning (bitpacked DB bitmap (H, W//8) uint8,
        prob map (H, W) f32 STILL ON DEVICE). Only the bitmap crosses the
        wire (det_pre.bitpack_map); the prob map stays in HBM for the
        deferred box scoring inside the rec program
        (pipeline/fused.call_scored)."""
        if getattr(self, "_jit_bits", None) is None:

            def fn(p, x, vhw, th):
                if self.backend == "native":
                    xx = x[None].astype(self.dtype)
                    prob = dbnet.apply(p, xx,
                                       backbone_arch=self.arch,
                                       valid_hw=(vhw[0:1], vhw[1:2]))[0]
                else:
                    xt = jnp.transpose(x[None].astype(jnp.float32),
                                       (0, 3, 1, 2))
                    out = self.executor._interpret(
                        p, {self.executor.input_names[0]: xt})[0]
                    prob = out[0, 0]
                prob = prob.astype(jnp.float32)
                bits = det_pre.bitpack_map(prob, vhw[0], vhw[1], th)
                return bits, prob

            self._jit_bits = jax.jit(fn)
        args = (self.pdev, x_f32, jnp.asarray(valid_hw, jnp.int32),
                jnp.float32(thresh))
        from ..utils.profiling import CAPTURE
        CAPTURE.record("det_bits", self._jit_bits, args)
        return self._jit_bits(*args)

    # --- engine-level page batching, fixed det bucket: N host-resized pages
    # → N prob maps in ONE device call. All pages share one canvas shape, so
    # the only compile axis is the batch-size ladder.
    def call_pages_u8(self, batch) -> jax.Array:
        """{"pages": (B, Hb, Wb, 3) uint8 zero-padded det inputs,
        "rhw": (B, 2) int32 valid extents} → (B, Hb, Wb) encoded prob
        maps (SE pools masked to each page's valid region)."""
        if getattr(self, "_jit_pages_u8", None) is None:

            def fn(p, batch):
                pages, rhw = batch["pages"], batch["rhw"]
                x = det_pre.normalize_det(pages).astype(self.dtype)
                if self.backend == "native":
                    prob = dbnet.apply(p, x,
                                       backbone_arch=self.arch,
                                       valid_hw=(rhw[:, 0], rhw[:, 1]))
                else:
                    xt = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
                    out = self.executor._interpret(
                        p, {self.executor.input_names[0]: xt})[0]
                    prob = out[:, 0]
                return self._encode(prob.astype(jnp.float32))

            self._jit_pages_u8 = jax.jit(fn)
        return self._jit_pages_u8(self.pdev, batch)

    def make_pages_bits_fn(self, thresh: float):
        """Batched bitmap-wire det: {"pages": (B, Hb, Wb, 3) uint8 raw
        canvases OR (B, Hb, Wb, 3) float32 already-normalized canvases
        (the device det-resize path — resize_dev.resize_normalize_det
        output), "rhw": (B, 2) int32} → (bits (B, Hb, Wb//8) uint8,
        probs (B, Hb, Wb) f32). Only the bits cross the wire (the
        batcher's to_host keeps probs device-resident for the deferred
        scoring call); per-page wire cost drops from ~0.9 MB to ~115 KB.
        The dtype branch resolves at trace time, so u8 (host-resized) and
        f32 (device-resized) waves compile as separate programs and
        coexist in one batcher."""

        def fn(p, batch):
            pages, rhw = batch["pages"], batch["rhw"]
            if pages.dtype == jnp.uint8:
                x = det_pre.normalize_det(pages).astype(self.dtype)
            else:
                x = pages.astype(self.dtype)
            if self.backend == "native":
                prob = dbnet.apply(p, x, backbone_arch=self.arch,
                                   valid_hw=(rhw[:, 0], rhw[:, 1]))
            else:
                xt = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
                out = self.executor._interpret(
                    p, {self.executor.input_names[0]: xt})[0]
                prob = out[:, 0]
            prob = prob.astype(jnp.float32)
            bits = jax.vmap(det_pre.bitpack_map,
                            in_axes=(0, 0, 0, None))(
                prob, rhw[:, 0], rhw[:, 1], jnp.float32(thresh))
            return bits, prob

        jitted = jax.jit(fn)
        return lambda batch: jitted(self.pdev, batch)

    def make_pages_boxes_fn(self, pp, max_k: int, extract_scale=1,
                            score_scale=1, reduce="scatter", score_k=0):
        """Batched det + ON-DEVICE box extraction: (B, Hb, Wb, 3) uint8 det
        canvases + (B, 2) resize extents → (B, max_k, 10) packed rows
        [8 quad coords, score, valid] (ops/db_device.py). Only kilobytes
        cross the wire per batch."""
        from ..ops import db_device

        def one(prob, rh, rw):
            quads, scores, valid = db_device.device_boxes(
                prob, rh, rw, max_k=max_k, thresh=pp.thresh,
                box_thresh=pp.box_thresh, unclip_ratio=pp.unclip_ratio,
                min_size=float(pp.min_size),
                scale=db_device.parse_extract_scale(extract_scale),
                score_scale=db_device.parse_extract_scale(score_scale),
                reduce=reduce, score_k=score_k)
            return jnp.concatenate(
                [quads.reshape(max_k, 8), scores[:, None],
                 valid[:, None].astype(jnp.float32)], axis=-1)

        def fn(p, batch):
            pages, rhw = batch["pages"], batch["rhw"]
            x = det_pre.normalize_det(pages).astype(self.dtype)
            if self.backend == "native":
                prob = dbnet.apply(p, x, backbone_arch=self.arch,
                                   valid_hw=(rhw[:, 0], rhw[:, 1]))
            else:
                xt = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
                out = self.executor._interpret(
                    p, {self.executor.input_names[0]: xt})[0]
                prob = out[:, 0]
            return jax.vmap(one)(prob.astype(jnp.float32),
                                 rhw[:, 0], rhw[:, 1])

        jitted = jax.jit(fn)
        return lambda batch: jitted(self.pdev, batch)

    # --- engine-level page batching: N source pages → N prob maps in ONE
    # device call (resize + forward + encode fused). Pages share a source
    # bucket and a det bucket; per-page valid/resize extents ride along as
    # traced scalars so arbitrary page sizes reuse the compiled program.
    def call_pages(self, images_u8: np.ndarray, src_hw: np.ndarray,
                   resize_hw: np.ndarray, out_h: int, out_w: int
                   ) -> jax.Array:
        """images_u8 (B, Hs, Ws, 3) uint8 edge-padded pages; src_hw (B, 2)
        and resize_hw (B, 2) int32 → (B, out_h, out_w) encoded maps."""
        if getattr(self, "_jit_pages", None) is None:
            from ..ops import resize_dev

            def fn(p, imgs, shw, rhw, out_h, out_w):
                x = resize_dev.resize_normalize_det_batch(
                    imgs, shw[:, 0], shw[:, 1], rhw[:, 0], rhw[:, 1],
                    out_h, out_w).astype(self.dtype)
                if self.backend == "native":
                    prob = dbnet.apply(p, x,
                                       backbone_arch=self.arch,
                                       valid_hw=(rhw[:, 0], rhw[:, 1]))
                else:
                    xt = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
                    out = self.executor._interpret(
                        p, {self.executor.input_names[0]: xt})[0]
                    prob = out[:, 0]
                return self._encode(prob.astype(jnp.float32))

            self._jit_pages = jax.jit(fn, static_argnames=("out_h", "out_w"))
        return self._jit_pages(self.pdev, images_u8, src_hw, resize_hw,
                               out_h=out_h, out_w=out_w)


class ClsForward(_ParamsAsArgs):
    """(N, 48, 192, 3) float32 in [-1,1] → (N, 2) softmax probs."""

    def __init__(self, backend: str, model_path: Optional[str] = None,
                 params: Optional[dict] = None, dtype=jnp.float32):
        self.backend = backend
        self.dtype = dtype
        if backend == "graph":
            self.executor = GraphExecutor(model_path, name="cls")
        else:
            assert params is not None
            self.params = params
        self._jit = None

    def _native_fn(self, p, crops):
        return cls_model.apply(p,
                               crops.astype(self.dtype)).astype(jnp.float32)

    def _graph_fn(self, w, crops):
        x = jnp.transpose(crops, (0, 3, 1, 2))
        return self.executor._interpret(
            w, {self.executor.input_names[0]: x})[0]

    def __call__(self, crops) -> jax.Array:
        if self._jit is None:
            self._jit = jax.jit(self.pure_fn)
        return self._jit(self.pdev, crops)


class RecForward(_ParamsAsArgs):
    """(N, 48, W, 3) float32 in [-1,1] → ((N, T) argmax idx, (N, T) prob).

    The vocab axis is reduced on device (ops/ctc.py) — only 2*N*T scalars
    are downloaded instead of the N*T*18385 probability tensor the reference
    pulls through host memory (predict_rec.py:316-320).
    """

    def __init__(self, backend: str, model_path: Optional[str] = None,
                 params: Optional[dict] = None, dtype=jnp.float32):
        self.backend = backend
        self.dtype = dtype
        if backend == "graph":
            self.executor = GraphExecutor(model_path, name="rec")
        else:
            assert params is not None
            self.params = params
        self._jit = None

    arch = "svtr"
    # Fused Pallas head (matmul + online argmax/softmax over vocab tiles,
    # ops/pallas/ctc_head.py) — real win on TPU where it avoids writing the
    # (N*T, 18385) logits to HBM; plain XLA path elsewhere.
    use_pallas_head = True

    def _native_fn(self, p, crops, valid_t=None):
        if self.arch == "crnn":
            # BiLSTM state flows over all T steps; width-masking does not
            # apply — CRNN keeps the per-bucket contract
            from ..models import crnn
            logits = crnn.apply(p, crops.astype(self.dtype))
            return ctc_ops.ctc_reduce_logits(logits.astype(jnp.float32))
        if self.use_pallas_head and jax.default_backend() == "tpu":
            from ..ops.pallas.ctc_head import ctc_head_reduce_batched
            feats = svtr.apply_features(p,
                                        crops.astype(self.dtype), valid_t)
            return ctc_head_reduce_batched(
                feats.astype(jnp.float32), p["head"]["w"],
                p["head"]["b"])
        logits = svtr.apply(p, crops.astype(self.dtype), valid_t)
        return ctc_ops.ctc_reduce_logits(logits.astype(jnp.float32))

    def _graph_fn(self, w, crops, valid_t=None):
        x = jnp.transpose(crops, (0, 3, 1, 2))
        probs = self.executor._interpret(
            w, {self.executor.input_names[0]: x})[0]
        return ctc_ops.ctc_reduce(probs)

    @property
    def masks_width(self) -> bool:
        """True when the forward makes valid-region outputs independent of
        bucket padding (native SVTR attention masking)."""
        return self.backend == "native" and self.arch == "svtr"

    def __call__(self, crops, valid_t=None) -> Tuple[jax.Array, jax.Array]:
        if self._jit is None:
            self._jit = jax.jit(self.pure_fn)
        if valid_t is not None and self.masks_width:
            return self._jit(self.pdev, crops, jnp.asarray(valid_t, jnp.int32))
        return self._jit(self.pdev, crops)


# ------------------------------------------------------------- decode support
_SUPPORT_CACHE: Dict[str, Optional[np.ndarray]] = {}
_SUPPORT_LOCK = threading.Lock()


def trained_support(dict_path: str) -> Optional[np.ndarray]:
    """Dictionary indices the synthetic trainer could emit for this dict:
    blank (0) plus every single-char entry the bundled fonts can render
    (train/synth.TextRenderer's coverage — exactly the label space the
    native checkpoints were trained on). Prefers the committed sidecar
    `<dict>.trained_support.json` (tools/make_support.py); falls back to
    recomputing from font coverage. Returns None when support can't be
    established (→ no masking)."""
    key = os.path.abspath(dict_path)
    with _SUPPORT_LOCK:
        if key in _SUPPORT_CACHE:
            return _SUPPORT_CACHE[key]
    sup: Optional[np.ndarray] = None
    # sidecar next to the dict, else the committed copy in the package's
    # assets tree (the dict itself may live in the read-only reference
    # snapshot, where no sidecar can be written)
    candidates = [dict_path + ".trained_support.json"]
    import glob as _glob
    pkg_assets = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets")
    candidates += _glob.glob(os.path.join(
        pkg_assets, "**", os.path.basename(dict_path) +
        ".trained_support.json"), recursive=True)
    for sidecar in candidates:
        if not os.path.exists(sidecar):
            continue
        import json
        try:
            with open(sidecar) as f:
                sup = np.asarray(sorted(set(json.load(f)["indices"]) |
                                        {0}), np.int64)
            break
        except (ValueError, KeyError, OSError):
            sup = None
    if sup is None:
        try:
            from ..train import synth
            c2i = synth.charset_from_dict(dict_path, charset=None)
            r = synth.TextRenderer(char_to_idx=c2i)
            sup = np.asarray(sorted({0} | {c2i[c] for c in r.charset}),
                             np.int64)
        except Exception:
            sup = None
    with _SUPPORT_LOCK:
        _SUPPORT_CACHE[key] = sup
    return sup


def apply_support_bias(params: dict, support: np.ndarray) -> dict:
    """Mask untrained vocab indices by biasing the CTC head: b[v] -= 1e30
    for v outside the support. argmax then never picks an untrained glyph,
    and the softmax-derived confidence renormalizes over the support
    (exp(-1e30 - max) underflows to exactly 0). Decode semantics
    (rec_postprocess.py:58-86) are otherwise unchanged — this only shrinks
    the effective dictionary to the trained one. Works identically for the
    plain XLA head and the Pallas fused head (both read params['head'])."""
    head = params.get("head")
    if not isinstance(head, dict) or "b" not in head:
        return params
    b = np.asarray(head["b"], np.float32)
    mask = np.full(b.shape, -1e30, np.float32)
    sup = support[support < b.shape[0]]
    mask[sup] = 0.0
    out = dict(params)
    out["head"] = dict(head)
    out["head"]["b"] = (b + mask).astype(np.asarray(head["b"]).dtype)
    return out


# --------------------------------------------------------------------- zoo
def checkpoint_calibration(ckpt_path: str) -> dict:
    """Inference-knob calibration shipped NEXT TO a native checkpoint
    (<ckpt dir>/calibration.json): flag-name → value pairs tuned for that
    checkpoint on the held-out real-image eval (tools/eval_heldout.py).

    The synthetic-trained native models are not the reference's models, so
    the reference's flag defaults are not always their best operating
    point (e.g. the v5 det's prob maps are under-confident on real pages
    — box_thresh 0.6→0.4 doubled table recall, scratch/sweep_bt). The
    pipeline applies these only for flags the caller did NOT explicitly
    pass (args._user_keys), so reference parity is untouched for
    graph-backend models and for any user-set flag."""
    if not ckpt_path:
        return {}
    cal = os.path.join(os.path.dirname(ckpt_path), "calibration.json")
    if os.path.exists(cal):
        import json
        try:
            with open(cal) as f:
                return dict(json.load(f))
        except (ValueError, OSError):  # unreadable sidecar: no calibration
            return {}
    return {}


def _load_native_params(model_dir: str, kind: str = "", arch: str = ""):
    """Load trained native params from <model_dir>/native_params.npz; when a
    registry entry (e.g. PP-OCRv4) has no checkpoint of its own, fall back
    to the ppocrv5 family checkpoint of the same stage/architecture so
    model switching stays functional (warns). Returns (params, npz_path) —
    the path actually loaded, so calibration sidecars follow fallbacks."""
    from ..utils.params_io import load_tree
    path = os.path.join(os.path.dirname(model_dir), "native_params.npz")
    if os.path.exists(path):
        return load_tree(path), path
    if kind in ("det", "rec") and arch in ("mbv3", "svtr"):
        from .. import config as cfg_mod
        fb = cfg_mod.find_asset(f"ppocrv5/{kind}/native_params.npz")
        if os.path.exists(fb) and os.path.abspath(fb) != os.path.abspath(path):
            import warnings
            warnings.warn(f"{kind}: no checkpoint at {path}; using the "
                          f"ppocrv5 family checkpoint {fb}")
            return load_tree(fb), fb
    return None, ""


def pick_arch(kind: str, model_path: str, algorithm: str = "") -> str:
    """Native architecture for a stage: SVTR vs CRNN by rec_algorithm, and
    the ResNet-vd detector backbone for the server model family."""
    if kind == "rec":
        if "CRNN" in (algorithm or "") or "server" in (model_path or ""):
            return "crnn"
        return "svtr"
    if kind == "det":
        return "resnet18" if "server" in (model_path or "") else "mbv3"
    return "mbv3"


def resolve_backend(kind: str, model_path: str, requested: str,
                    vocab_size: int = 0, dtype=jnp.float32,
                    arch: str = "mbv3", allow_untrained: bool = False):
    """Pick the backend for one stage.

    `requested` ∈ {auto, native, graph}. auto: lift weights into the native
    model when we know how (cls), else run the graph; if the .onnx file is
    missing (the reference snapshot ships without det/rec blobs,
    /root/reference/.MISSING_LARGE_BLOBS), fall back to the native model
    with a trained checkpoint.  Randomly initialized weights are an
    explicit opt-in (`allow_untrained` / tpu_allow_untrained=True /
    ONNXOCR_TPU_ALLOW_UNTRAINED=1): the reference fails loudly at session
    construction when a model file is absent, and a silently-untrained
    serving stage would pass warmup/readyz while returning garbage.

    Returns (backend, model_path, params, arch, calibration) — calibration
    is the checkpoint's sidecar knob dict (checkpoint_calibration), empty
    for graph-backend and untrained stages.
    """
    allow_untrained = allow_untrained or \
        os.environ.get("ONNXOCR_TPU_ALLOW_UNTRAINED", "") in ("1", "true")
    have_file = model_path and os.path.exists(model_path)
    if requested == "graph" or (requested == "auto" and have_file
                                and kind != "cls"):
        if not have_file:
            raise FileNotFoundError(
                f"{kind} model not found: {model_path}. Stage the .onnx "
                "into onnxocr_tpu/assets/ (see tools/fetch_assets.py) or "
                "use tpu_backend='native'.")
        return "graph", model_path, None, arch, {}

    # native path
    params = None
    ckpt = ""
    if have_file and kind == "cls":
        from ..onnx import ir
        try:
            params = lift.lift_cls(ir.load_model(model_path))
        except ValueError:
            # unknown cls variant → run the graph directly
            return "graph", model_path, None, arch, {}
    if params is None and model_path:
        params, ckpt = _load_native_params(model_path, kind, arch)
    if params is None and kind == "det" and arch == "resnet18":
        # no trained server-det checkpoint: a working mobile detector beats
        # an untrained ResNet — fall back to the mbv3 family checkpoint
        from .. import config as cfg_mod
        fb = cfg_mod.find_asset("ppocrv5/det/native_params.npz")
        if os.path.exists(fb):
            import warnings
            warnings.warn("det: no server (resnet18) checkpoint; falling "
                          "back to the trained mbv3 detector")
            from ..utils.params_io import load_tree
            params = load_tree(fb)
            ckpt = fb
            arch = "mbv3"
    if params is None:
        if requested == "native" or not have_file:
            if not allow_untrained:
                raise FileNotFoundError(
                    f"{kind}: no weights found — neither a model file at "
                    f"{model_path!r} nor a native checkpoint "
                    "(native_params.npz) next to it. Stage assets (see "
                    "tools/fetch_assets.py), train with "
                    "tools/train_synthetic.py, or opt in to untrained "
                    "weights with tpu_allow_untrained=True / "
                    "ONNXOCR_TPU_ALLOW_UNTRAINED=1.")
            rng = 0  # host-side init seed
            if kind == "det":
                params = dbnet.init(rng, backbone_arch=arch)
            elif kind == "cls":
                params = cls_model.init(rng)
            elif arch == "crnn":
                from ..models import crnn
                params = crnn.init(rng, vocab_size)
            else:
                params = svtr.init(rng, vocab_size)
            import warnings
            warnings.warn(
                f"{kind}: no weights at {model_path!r}; using randomly "
                "initialized native model (functional pipeline, untrained "
                "outputs).")
        else:
            return "graph", model_path, None, arch, {}
    if dtype != jnp.float32:
        params = cm.tree_cast(params, dtype)
    return "native", model_path, params, arch, checkpoint_calibration(ckpt)
