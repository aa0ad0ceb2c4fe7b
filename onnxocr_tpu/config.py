"""Typed config registry for the OCR pipeline.

The flag names and defaults mirror the reference's public kwargs surface
(reference: onnxocr/utils.py:251-387 `infer_args()` — an argparse parser used
purely as a defaults table, harvested by ONNXPaddleOcr at
onnx_paddleocr.py:13-23). Callers pass any of these as keyword arguments to
``ONNXPaddleOcr(**kwargs)``; unknown keys are accepted and stored, matching
the reference's Namespace semantics.

TPU-specific knobs live under the ``tpu_*`` prefix and have no reference
counterpart.
"""
from __future__ import annotations

import os
from pathlib import Path
from types import SimpleNamespace

_PKG_DIR = Path(__file__).resolve().parent

# Where model assets (char dicts, .onnx weight files) are looked up. The
# repo does not vendor the upstream blobs; tools/fetch_assets.py stages them
# into onnxocr_tpu/assets/ and ONNXOCR_TPU_ASSETS overrides the search root.
_ASSET_SEARCH_PATHS = [
    os.environ.get("ONNXOCR_TPU_ASSETS", ""),
    str(_PKG_DIR / "assets"),
    "/root/reference/onnxocr/models",
]


def find_asset(rel_path: str) -> str:
    """Resolve a model-asset path (e.g. 'ppocrv5/det/det.onnx').

    Returns the first existing candidate; otherwise returns the preferred
    (assets-dir) path so error messages point at the right place to stage
    files into.
    """
    rel_path = rel_path.lstrip("/")
    for root in _ASSET_SEARCH_PATHS:
        if not root:
            continue
        cand = os.path.join(root, rel_path)
        if os.path.exists(cand):
            return cand
    return os.path.join(str(_PKG_DIR / "assets"), rel_path)


def str2bool(v) -> bool:
    """Reference-compatible bool parsing (onnxocr/utils.py:247-248)."""
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "t", "1")


# Flag name → default. Same names/defaults as the reference registry; inert
# reference flags (EAST/SAST/PSE/FCE/SR/e2e/mp groups) are kept for kwarg
# compatibility even though nothing consumes them here either.
DEFAULTS = {
    # prediction engine
    "use_gpu": True,          # reference default; on TPU this is ignored
    "use_xpu": False,
    "use_npu": False,
    "ir_optim": True,
    "use_tensorrt": False,
    "min_subgraph_size": 15,
    "precision": "fp32",
    "gpu_mem": 500,
    "gpu_id": 0,
    # text detector
    "image_dir": None,
    "page_num": 0,
    "det_algorithm": "DB",
    "det_model_dir": find_asset("ppocrv5/det/det.onnx"),
    "det_limit_side_len": 960.0,
    "det_limit_type": "max",
    "det_box_type": "quad",
    # DB params
    "det_db_thresh": 0.3,
    "det_db_box_thresh": 0.6,
    "det_db_unclip_ratio": 1.5,
    "max_batch_size": 10,
    "use_dilation": False,
    "det_db_score_mode": "fast",
    # EAST params (inert)
    "det_east_score_thresh": 0.8,
    "det_east_cover_thresh": 0.1,
    "det_east_nms_thresh": 0.2,
    # SAST params (inert)
    "det_sast_score_thresh": 0.5,
    "det_sast_nms_thresh": 0.2,
    # PSE params (inert)
    "det_pse_thresh": 0.0,
    "det_pse_box_thresh": 0.85,
    "det_pse_min_area": 16.0,
    "det_pse_scale": 1,
    # FCE params (inert)
    "scales": [8, 16, 32],
    "alpha": 1.0,
    "beta": 1.0,
    "fourier_degree": 5,
    # text recognizer
    "rec_algorithm": "SVTR_LCNet",
    "rec_model_dir": find_asset("ppocrv5/rec/rec.onnx"),
    "rec_image_inverse": True,
    "rec_image_shape": "3, 48, 320",
    "rec_batch_num": 6,
    "max_text_length": 25,
    "rec_char_dict_path": find_asset("ppocrv5/ppocrv5_dict.txt"),
    "use_space_char": True,
    "vis_font_path": find_asset("fonts/simfang.ttf"),
    "drop_score": 0.5,
    # e2e params (inert)
    "e2e_algorithm": "PGNet",
    "e2e_model_dir": None,
    "e2e_limit_side_len": 768.0,
    "e2e_limit_type": "max",
    "e2e_pgnet_score_thresh": 0.5,
    "e2e_char_dict_path": find_asset("ic15_dict.txt"),
    "e2e_pgnet_valid_set": "totaltext",
    "e2e_pgnet_mode": "fast",
    # text classifier
    "use_angle_cls": False,
    "cls_model_dir": find_asset("ppocrv4/cls/cls.onnx"),
    "cls_image_shape": "3, 48, 192",
    "label_list": ["0", "180"],
    "cls_batch_num": 6,
    "cls_thresh": 0.9,
    # misc engine flags
    "enable_mkldnn": False,
    "cpu_threads": 10,
    "use_pdserving": False,
    "warmup": False,
    # SR params (inert)
    "sr_model_dir": None,
    "sr_image_shape": "3, 32, 128",
    "sr_batch_num": 1,
    # output dirs
    "draw_img_save_dir": str(_PKG_DIR / "inference_results"),
    "save_crop_res": False,
    "crop_res_save_dir": str(_PKG_DIR / "output"),
    # multi-process flags (inert in reference too, utils.py:376-378)
    "use_mp": False,
    "total_process_num": 1,
    "process_id": 0,
    "benchmark": False,
    "save_log_path": str(_PKG_DIR / "log_output"),
    "show_log": True,
    "use_onnx": False,

    # ---- TPU-native knobs (no reference counterpart) ----
    # Round det input sides up to this multiple so each distinct padded
    # shape compiles exactly once (XLA static-shape discipline).
    "tpu_det_bucket": 320,
    # Recognizer width ladder; crops route to the smallest bucket that fits.
    # Deliberately COARSE: on the tunneled TPU every distinct compiled
    # program costs a multi-second compile/load once per process, while the
    # padding FLOPs a coarser bucket wastes cost microseconds (det forward
    # ~4 ms on-chip). Width masking (models/svtr) makes valid-region
    # outputs bucket-invariant, so coarse buckets are exact, not
    # approximate.
    "tpu_rec_width_buckets": (640, 960, 1280),
    # Batch-size ladder for rec/cls calls (pad batch up to one of these).
    # Same economy: 3 sizes, not 7 — padded rows are discarded on host.
    "tpu_batch_buckets": (4, 16, 64),
    # 'device' warps crops on TPU via the homography gather kernel;
    # 'host' uses cv2.warpPerspective like the reference.
    "tpu_crop_backend": "device",
    # 'native' uses the hand-written NHWC JAX models (weights lifted from
    # ONNX when available, else randomly initialized); 'graph' interprets
    # the .onnx graph directly via GraphExecutor; 'auto' prefers native when
    # it can lift the weights, else falls back to graph.
    "tpu_backend": "auto",
    # Compute dtype for the native models: 'float32' or 'bfloat16'.
    "tpu_dtype": "float32",
    # Det-forward-only dtype override ('' = follow tpu_dtype). bf16 here
    # runs just the DBNet convs on the MXU's fast path while extraction,
    # scoring, and the rec/cls stages stay f32 — the round-3 bf16 A/B
    # penalized the whole pipeline and lost mostly in rec (VERDICT r4
    # #1b); this isolates the det win. Accuracy-gated on the held-out set
    # before any default change.
    "tpu_det_dtype": "",
    # Interpolation for device crops: 'bilinear' | 'bicubic'. TPU gathers
    # are index-rate-bound, so bicubic's 16 taps cost ~4x bilinear; the
    # native checkpoints train on un-warped renders and measure slightly
    # BETTER with bilinear (0.944 vs 0.921 synthetic char-acc), so
    # bilinear is the default. 'bicubic' restores cv2 INTER_CUBIC
    # crop-pixel parity with the reference warp.
    "tpu_warp_interp": "bilinear",
    # Staged dense warp fast path (bilinear only): 'off' = per-pixel
    # gather warp everywhere; 'upright' = exact separable staged path
    # for exactly-upright affines (engages ~never on real quads without
    # the rejected axis snap); 'shear' = deskew-PRESERVING staged warp
    # (ops/warp._staged_shear) — small-tilt affine crops resample at
    # the exact Catmull-Smith shear heights via staged rows + dense
    # VPU/MXU passes instead of per-pixel gathers (the warp is the
    # onecall ceiling on doc pages: rec_warp 99 ms + cls_warp 29 ms,
    # profile r5d). Tilts beyond ~±4°, rot90 crops, and perspective
    # quads keep the gather path per crop. Accuracy-gated before any
    # default flip (y-position error ≤ |d/a| ≤ 0.3 px, typ ≤0.04).
    # Default 'shear' (round-5): held-out gates equal-or-better than the
    # gather-only head (r5j: 0.885/0.799, real 0.738/0.692 vs 0.883/
    # 0.795, 0.738/0.685) at doc_a 161->67 ms, dense 150->64 ms
    # (scratch/r5k sweeps; evalgates.jsonl r5_shear_v2/r5_shear_adopt).
    "tpu_warp_stage": "shear",
    # Shear-mode eligibility bound (px) on the map-vs-affine deviation at
    # the interior probes. 0.35 keeps the fast path sub-pixel faithful to
    # the reference homography; larger values additionally "de-bow"
    # rounding-deformed quads through their corner affine (accuracy-gate
    # before changing).
    "tpu_warp_stage_tol": 0.35,
    # Static sub-batch size for the shear mode's gather leg: the full-K
    # gather runs at ~55 M taps/s regardless of index locality (doc_a
    # microbench r5j), so ineligible crops compact into this many slots;
    # more than this many falls back to the full gather via lax.cond.
    # 0 disables the compaction.
    "tpu_warp_slow_k": 16,
    # Wire format of the det prob map download: 'uint8' quantizes to 1/255
    # (box scores shift < 0.002 — the tunnel is the bottleneck, 4x fewer
    # bytes), 'float16', or 'float32' for strict parity.
    "tpu_det_map_dtype": "uint8",
    # 'device': the det input is resized+normalized on TPU from the same
    # HBM image the crop warps read (one upload per image); 'host' uses
    # cv2.resize + a separate upload (exact reference resize arithmetic).
    "tpu_det_input": "device",
    # Source upload wire: 'flat' uploads only the image CONTENT (1-D
    # length ladder, ~15% mean pad waste) and reconstructs the edge-padded
    # canvas on device (resize_dev.put_src_bucket — bit-identical to the
    # host pad); 'padded' uploads the full 2-D bucket canvas (up to +50%
    # bytes + a host edge-pad copy); 'auto' = flat on TPU, padded on CPU.
    "tpu_src_upload": "auto",
    # Fuse cls forward + rotation select + rec forward into ONE device call
    # per width bucket (the 180° flip is applied by homography selection on
    # device instead of a host round trip between cls and rec).
    "tpu_fused_cls_rec": True,
    # Det postprocess location: 'host' (exact reference contract — contours
    # / minAreaRect / unclip on host from the downloaded prob map) or
    # 'device' (connected components + PCA-oriented quads inside the det
    # jit, ops/db_device.py — only ~max_boxes*10 floats cross the wire;
    # geometry within ~1px of the host path on text-shaped regions, not
    # bit-identical). Quad box_type only; falls back to host otherwise.
    "tpu_det_postprocess": "host",
    "tpu_det_max_boxes": 1024,
    # Device DB extraction working grid: 'SYxSX' (or int N = NxN) runs
    # labeling/moments/scoring on a downsampled grid (max-pool mask,
    # mean-pool scores, FULL-coordinate geometry — ops/db_device). Every
    # extraction stage is pixel-bound (78 of onecall's 155 device ms at
    # 960² at scale 1), so the cost drops ~sy·sx×. Default '1x2'
    # (x-only): measured accuracy-neutral on the held-out set, while
    # sy=2 merges text lines with <3 px vertical gaps (dense tables:
    # recall 0.664→0.615). Applies to the device/onecall paths only —
    # the exact host contract never downsamples.
    "tpu_det_extract_scale": "1x2",
    # Additional pooling of the SCORE grid only (on top of the working
    # grid above), 'SYxSX' relative to the working grid. Scoring is a
    # masked mean, so unlike mask y-pooling it cannot merge components —
    # it only quantizes each box's mean-prob estimate (gates box_thresh).
    # '1x1' = score on the working grid (exact w.r.t. the extraction
    # contract); accuracy-gate any other value on the held-out set.
    "tpu_det_score_scale": "1x1",
    # Static budget for the box scorer: only candidates surviving the
    # geometric filters (present, min_size, post-unclip size) are scored
    # — the scorer is linear in K while real pages have <100 survivors.
    # EXACT at any input: if survivors overflow the budget a lax.cond
    # falls back to scoring all tpu_onecall_det_candidates. 0 = score
    # everything unconditionally.
    "tpu_det_score_k": 128,
    # Extraction-window bucket (onecall): slice the prob map to
    # round_up(valid, bucket) — a STATIC top-left window — before DB
    # extraction, so short/thin pages on the fixed 960² canvas stop
    # paying full-canvas extraction (a 160×960-valid page pays ~6× its
    # real extraction cost otherwise). Adds a bounded (ex_h, ex_w)
    # compile axis: ≤(960/bucket)² combos per src bucket. 0 = off.
    # Default 320: round-5 eval gate EXACTLY head-equal at banner-page
    # device 59.7→33.9 ms (evalgates.jsonl r5_pallas2_window).
    "tpu_det_extract_window": 320,
    # Snap near-axis-aligned PCA axes to exact (±1,0)/(0,±1) in device
    # DB extraction (tan(angle) <= this). Text components' covariance
    # carries ~1-2% tilt from ascender/descender asymmetry on perfectly
    # upright lines; snapping removes that sampling skew from the crops
    # and lets upright quads take the staged MXU warp fast path
    # (ops/warp.py). Genuinely rotated text (photos) is unaffected.
    # 0 = off (DEFAULT — the 0.06 gate REGRESSED real pages 0.730→0.680
    # recall: genuine 1-3° tilts on receipts/photos need the deskewing
    # warp; evalgates.jsonl r5_axis_snap).
    "tpu_det_axis_snap": 0.0,
    # Per-component reduction strategy in device DB extraction:
    # 'scatter' = scatter-add / scatter-min (XLA lowers TPU scatters
    # serially); 'scan' = chunked masked-select + dense VPU reduce
    # (_seg_sum_scan/_seg_min_scan) — same math, different lowering.
    # Default decided by on-chip A/B (scan wins the full onecall program
    # 93.4 vs 98.2 ms at 960² and is held-out output-equal: r4 window 3,
    # oc_scan 0.864/0.764 vs oc_scatter 0.862/0.763, real subtotal
    # identical); both are exact up to f32 sum order. 'pallas'/'pallas2'
    # = band-sparse Mosaic kernels (ops/pallas/seg_reduce{,2}) — slots
    # are raster-local, so one map band only references a narrow slot
    # range and non-intersecting (tile, band) blocks are skipped.
    # Default 'pallas2' (label-keyed, round-5): extraction 33→15 ms and
    # full onecall 59.7→41.8 ms on the profiled page at an EXACTLY
    # head-equal eval gate (evalgates.jsonl r5_pallas2_window); CPU
    # backends silently take the equivalent scan lowering.
    "tpu_db_reduce": "pallas2",
    # det→host wire: 'bitmap' downloads only the bitpacked DB bitmap (8x
    # smaller than the quantized map; ~12 ms vs ~90 ms on the tunneled
    # link) and defers box scoring to the fused cls+rec program against
    # the HBM-resident prob map (pipeline/system._call_bitmap_wire).
    # 'map' restores the quantized-map download + host scoring.
    "tpu_det_wire": "bitmap",
    # Fixed det canvas in the bitmap wire: 'auto' = on TPU only (collapse
    # the det compile axis; padding is invisible under activation
    # masking), 'always' / 'never' force it.
    "tpu_det_fixed_canvas": "auto",
    # One-call pipeline: det→DB boxes→cls→rec as ONE jit with a single
    # ~50KB download per image (pipeline/onecall.py). Huge win over the
    # tunneled TPU link where every download costs a ~30ms round trip;
    # uses the device DB extraction contract (see tpu_det_postprocess
    # note). 'staged' keeps the default multi-call pipeline.
    "tpu_pipeline": "staged",
    "tpu_onecall_rec_width": 640,
    # K_rec: the static crop budget the one-call program warps/cls/recs.
    # Pages with more boxes keep the prefix results and fused-run only the
    # remainder (onecall.py overflow path), so this is a throughput knob,
    # not a correctness cap. A/Bs on the v5e (scratch/ab_onecall*.log,
    # 7-page dominant bucket): at the pre-calibration box counts (mean 21)
    # K=32 beat 64 (3.46 vs 2.96 img/s); after the det box_thresh
    # calibration roughly doubled boxes/page (13-61 on the same pages),
    # K=48 wins — 3.39 vs 3.27 (K=32, 5/7 pages overflowing) and 3.07
    # (K=64, no overflow but a worst-case warp budget every page).
    "tpu_onecall_max_boxes": 48,
    # candidate-component budget BEFORE score filtering — must match the
    # staged device path's tpu_det_max_boxes: real pages can carry
    # hundreds of speckle components, and a lower cap (raster-first
    # truncation, mirroring the reference's first-1000-contours order)
    # silently drops real boxes further down the page. 512 measured ~5%
    # faster (scratch/ab_onecall) but was rejected for that reason.
    "tpu_onecall_det_candidates": 1024,
    # One det canvas (round_up(limit_side_len, det bucket)²) for every
    # page in one-call mode: masked SE pools + valid-region DB extraction
    # make padding invisible, and collapsing the canvas compile axis cuts
    # warmup from (src × canvas) fused-program compiles to src-only.
    "tpu_onecall_fixed_canvas": True,
    # Multi-page wave coalescing (onecall serving path): concurrent
    # requests' prepared pages merge into one vmapped program + ONE
    # download per wave (pipeline/onecall._WaveCoalescer). Deadline-aware
    # by construction — a lone request dispatches immediately; only
    # backlog coalesces, into the largest WARM tier below. Off for the
    # library (it adds a dispatcher thread); the serving engine enables it
    # when request concurrency > 1.
    "tpu_onecall_wave": False,
    # Wave tiers (page batch sizes) the coalescer may use. Each (source
    # bucket × canvas × tier) is a distinct XLA program, compiled by a
    # background warm pass the first time a key shows backlog — until
    # then waves run batch-1, never stalling a live request on a compile.
    "tpu_onecall_wave_tiers": "2,4",
    # Cross-request det page batching: concurrent images' DBNet forwards
    # coalesce into one device call (runtime/batcher.DetPageBatcher). Adds
    # up to tpu_microbatch_wait_ms latency per call, so it defaults off for
    # the library and is enabled by the serving engine / batch layer.
    "tpu_det_microbatch": False,
    # Batched det input source (bits wire + fixed canvas only): 'device'
    # resizes each page's det canvas ON TPU from the HBM-resident source
    # the crop warps already use (DetPageBatcher.submit_bits_dev — no
    # second ~2.7 MB/page canvas upload); 'host' keeps the cv2-resize +
    # upload path (exact reference resize arithmetic).
    "tpu_det_batch_input": "device",
    # Cross-request cls+rec crop batching: concurrent pages' crop chunks of
    # the same (source bucket, width bucket) coalesce into one fused
    # warp→cls→warp→rec device call (runtime/batcher.RecCropBatcher over
    # ops/warp.warp_crops_multi). Same latency tradeoff as det batching, so
    # it defaults off for the library and is enabled by the serving engine.
    "tpu_rec_microbatch": False,
    "tpu_microbatch_wait_ms": 8.0,
    # Opt-in to randomly initialized weights when neither a model file nor
    # a trained checkpoint exists (default: fail loudly like the reference
    # does at session construction; env ONNXOCR_TPU_ALLOW_UNTRAINED=1 also
    # enables it).
    "tpu_allow_untrained": False,
    # Decode support for the NATIVE synthetic-trained recognizers:
    # 'trained' restricts the CTC argmax to dictionary indices the trainer
    # could actually render (the font-coverage charset) plus blank, by
    # biasing the CTC head's unsupported logits to -1e30 at load — argmax
    # can no longer pick glyphs the model never saw (round-2 held-out runs
    # emitted emoji/arrows on real images), and confidences renormalize
    # over the support. 'full' disables the mask (strict reference decode
    # over the whole dictionary; graph-backend models are never masked —
    # their weights know the full dictionary).
    "tpu_decode_support": "trained",
}


def make_params(**kwargs) -> SimpleNamespace:
    """Build a params namespace: defaults overlaid with kwargs.

    Mirrors ONNXPaddleOcr.__init__ (reference onnx_paddleocr.py:11-26)
    including the rec_image_shape force-set quirk (:20) — that happens in
    pipeline/api.py, not here.
    """
    params = dict(DEFAULTS)
    params.update(kwargs)
    ns = SimpleNamespace(**params)
    # which flags the caller set explicitly — checkpoint calibration
    # (backends.checkpoint_calibration) never overrides these
    ns._user_keys = set(kwargs)
    return ns


def parse_shape(s) -> tuple:
    """Parse "3, 48, 320" → (3, 48, 320)."""
    if isinstance(s, (tuple, list)):
        return tuple(int(v) for v in s)
    return tuple(int(v) for v in str(s).split(","))
