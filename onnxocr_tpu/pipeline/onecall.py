"""One-call OCR: det → DB extraction → crop matrices → cls → rec in ONE
XLA program, with a single device→host download per image.

Motivation (measured on the tunneled TPU, scratch/probe4): uploads stream
at ~1 GB/s, but EVERY download costs a ~30 ms round trip regardless of
size. The staged pipeline spends 3-5 downloads per image (det map or det
boxes, then one per rec width bucket); this module collapses them to one:

    upload padded source → [resize+normalize → DBNet → device DB boxes
    (ops/db_device.py) → rescale/clockwise/clip/side-filter
    (ops/warp_dev.py) → compact valid boxes to a K_rec prefix →
    warp cls crops → cls forward → 180° verdict selects rec homographies →
    warp rec crops at ONE static width → rec forward → CTC reduce]
    → download one packed (K_rec+1, 12+2T) float32 buffer (~50 KB)

Running every crop at one static width W is exact, not approximate: a crop
whose bucketed width would be w < W pads columns ≥ w with zeros in BOTH
designs, and the models' valid-width masking + valid-T decode restriction
make the extra padding invisible. Crops that would exceed W (desired_w >
W) are re-run by the host through the staged per-bucket path against the
same HBM-resident image — one extra call on the rare page with very wide
lines.

K_rec (the static crop budget the program warps/classifies/recognizes) is
deliberately smaller than K_det: the packed download carries ALL K_det
filtered quads, so when a page has more than K_rec boxes the host keeps
the K_rec prefix results and runs only the REMAINDER through the staged
fused path against the same HBM-resident image — no det re-run, no full
staged fallback. That makes a small K_rec safe: typical pages (≤K_rec
boxes) pay one program + one download; dense pages pay one extra fused
call for the tail instead of warping a worst-case box budget every page.

Box geometry follows the device DB extraction contract (PCA-oriented
components — see ops/db_device.py docstring for the documented divergences
from the host contour path).
"""
from __future__ import annotations

import math
import threading
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import det_pre, resize_dev, db_device, warp_dev
from ..ops import warp as warp_ops


class OneCallPipeline:
    def __init__(self, detector, recognizer, fused, args):
        self.detector = detector
        self.recognizer = recognizer
        self.fused = fused
        self.args = args
        self.rec_w = int(getattr(args, "tpu_onecall_rec_width", 640))
        self.k_rec = int(getattr(args, "tpu_onecall_max_boxes", 64))
        self.k_det = int(getattr(args, "tpu_onecall_det_candidates", 256))
        self.imgH = recognizer.rec_image_shape[1]
        # Fixed det canvas: every page runs the det stage on ONE
        # round_up(limit_side_len, bucket)² canvas instead of a per-page
        # bucket. Masked SE pools (models/dbnet.apply valid_hw) + the
        # valid-region DB extraction make the result independent of the
        # padding, so this only trades a little det compute for a
        # src-bucket-only compile axis — each distinct fused program costs
        # minutes of XLA compile, and (src × canvas) combos multiply.
        self.fixed_canvas = bool(getattr(args, "tpu_onecall_fixed_canvas",
                                         True))
        self.extract_scale = db_device.parse_extract_scale(
            getattr(args, "tpu_det_extract_scale", 1))
        self.score_scale = db_device.parse_extract_scale(
            getattr(args, "tpu_det_score_scale", 1))
        self.db_reduce = str(getattr(args, "tpu_db_reduce", "scatter"))
        self.score_k = int(getattr(args, "tpu_det_score_k", 0))
        self.ex_bucket = int(getattr(args, "tpu_det_extract_window", 0))
        self.axis_snap = float(getattr(args, "tpu_det_axis_snap", 0.0))
        self._jit = {}
        self._jit_batched = {}
        self._jit_lock = threading.Lock()
        # Multi-page wave coalescing (serving path): concurrent requests'
        # prepared pages merge into one vmapped program + ONE download per
        # wave. Single in-flight requests never wait (the loop dispatches
        # whatever is queued NOW — deadline-aware by construction).
        self._wave = None
        if getattr(args, "tpu_onecall_wave", False):
            tiers = str(getattr(args, "tpu_onecall_wave_tiers", "2,4"))
            tier_list = sorted({int(t) for t in tiers.split(",")
                                if t.strip() and int(t) > 1})
            if tier_list:
                self._wave = _WaveCoalescer(self, tier_list)

    # ------------------------------------------------------------- program
    def _build(self, use_cls: bool):
        return jax.jit(self._make_step(use_cls),
                       static_argnames=("out_h", "out_w", "ex_h", "ex_w"))

    def _ex_window(self, rh: int, rw: int, hb: int, wb: int
                   ) -> Tuple[int, int]:
        """Static extraction-window bucket for a page's valid size. 0s =
        full canvas (window off)."""
        b = self.ex_bucket
        if not b:
            return 0, 0
        return (min(hb, det_pre.round_up(max(rh, 1), b)),
                min(wb, det_pre.round_up(max(rw, 1), b)))

    def sharded_batch_fn(self, use_cls: bool, mesh, out_h: int = 0,
                         out_w: int = 0):
        """Data-parallel batched onecall: the SAME per-page program, vmapped
        over a page batch and sharded over the mesh's `data` axis (weights
        replicated, zero collectives — pages are independent). This is the
        multi-chip story for the default pipeline (VERDICT r3 #5): a B-page
        wave on an N-chip mesh runs B/N pages per chip in one dispatch.

        The det canvas (out_h, out_w) is a BUILD-time argument (pjit with
        in_shardings takes no kwargs; with the fixed-canvas default there
        is exactly one canvas anyway — defaults to it when 0).

        Returns fn(det_p, cls_p, rec_p, images (B, Hs, Ws, 3) u8,
        src_h/src_w/r_h/r_w (B,) i32) → (B, rows, wbuf) packed buffers,
        each row-block decoding exactly like the single-page __call__
        download."""
        import jax.sharding as shd
        P = shd.PartitionSpec
        if not out_h or not out_w:
            from ..ops import det_pre
            cap = det_pre.round_up(int(self.detector.limit_side_len),
                                   self.detector.bucket)
            out_h = out_h or cap
            out_w = out_w or cap
        repl = shd.NamedSharding(mesh, P())
        data1 = shd.NamedSharding(mesh, P("data"))
        data4 = shd.NamedSharding(mesh, P("data", None, None, None))
        step = self._make_step(use_cls, wave=True)

        def batched(det_p, cls_p, rec_p, images_u8, src_h, src_w,
                    r_h, r_w):
            return jax.vmap(
                lambda im, sh, sw, rh, rw: step(
                    det_p, cls_p, rec_p, im, sh, sw, rh, rw,
                    out_h=out_h, out_w=out_w)
            )(images_u8, src_h, src_w, r_h, r_w)

        return jax.jit(
            batched,
            in_shardings=(repl, repl, repl, data4, data1, data1, data1,
                          data1),
            out_shardings=shd.NamedSharding(mesh, P("data", None, None)))

    def _make_step(self, use_cls: bool, wave: bool = False):
        """wave=True for the vmapped (wave / sharded) builders: vmap turns
        the shear warp's lax.cond into a select that executes BOTH gather
        legs AND the staged fast path on top, so batched programs keep
        the plain gather warp (stage off)."""
        det_fwd = self.detector.forward
        pp = self.detector.postprocess_op
        fused = self.fused
        cls_fn = fused.cls_forward.pure_fn if \
            fused.cls_forward is not None else None
        rec_fn = fused.rec_forward.pure_fn
        imgH = self.imgH
        rec_w = self.rec_w
        k_rec = self.k_rec
        k_det = self.k_det
        axis_snap = self.axis_snap

        def step(det_p, cls_p, rec_p, image_u8, src_h, src_w, r_h, r_w,
                 out_h: int, out_w: int, ex_h: int = 0, ex_w: int = 0):
            # --- det forward from the HBM-resident source
            x = resize_dev.resize_normalize_det(
                image_u8, src_h, src_w, r_h, r_w, out_h, out_w)
            if det_fwd.backend == "native":
                from ..models import dbnet
                prob = dbnet.apply(
                    det_p, x[None].astype(det_fwd.dtype),
                    backbone_arch=det_fwd.arch,
                    valid_hw=(jnp.reshape(r_h, (1,)),
                              jnp.reshape(r_w, (1,))))[0]
            else:
                xt = jnp.transpose(x[None].astype(jnp.float32),
                                   (0, 3, 1, 2))
                prob = det_fwd.executor._interpret(
                    det_p,
                    {det_fwd.executor.input_names[0]: xt})[0][0, 0]

            # --- extraction window: every extraction stage is
            # pixel-bound in the GRID shape, so a 160×960-valid page on
            # the fixed 960² canvas pays 6× its real extraction cost.
            # ex_h/ex_w come from a STATIC bucket ladder of the valid
            # size (host side, CLAUDE.md invariant: no per-page shapes) —
            # a static top-left slice of the prob map; map coordinates
            # are unchanged.
            if ex_h and ex_w and (ex_h < out_h or ex_w < out_w):
                prob = prob[:ex_h, :ex_w]

            # --- DB box extraction on device (map coords)
            quads_m, scores, valid = db_device.device_boxes(
                prob.astype(jnp.float32), r_h, r_w, max_k=k_det,
                thresh=pp.thresh, box_thresh=pp.box_thresh,
                unclip_ratio=pp.unclip_ratio, min_size=float(pp.min_size),
                scale=self.extract_scale, score_scale=self.score_scale,
                reduce=self.db_reduce, score_k=self.score_k,
                axis_snap=axis_snap)

            # --- rescale map → source coords (unpack_boxes contract:
            # round, clip to [0, src])
            fw = src_w.astype(jnp.float32)
            fh = src_h.astype(jnp.float32)
            qx = jnp.clip(jnp.round(
                quads_m[..., 0] / r_w.astype(jnp.float32) * fw), 0, fw)
            qy = jnp.clip(jnp.round(
                quads_m[..., 1] / r_h.astype(jnp.float32) * fh), 0, fh)
            quads_s = jnp.stack([qx, qy], axis=-1)

            # --- clockwise + clip + side filter (filter_tag_det_res)
            quads_s = warp_dev.order_points_clockwise(quads_s)
            quads_s, keep = warp_dev.clip_filter_boxes(quads_s, src_h,
                                                       src_w)
            valid = valid & keep
            n_valid = jnp.sum(valid.astype(jnp.int32))

            # --- compact valid rows into the K_rec prefix (raster order
            # preserved: stable argsort on the inverted mask)
            order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
            take = order[:k_rec]
            quads_c = quads_s[take]
            scores_c = scores[take]
            valid_c = valid[take]

            # --- crop matrices on device
            rec_m, rec_m_rot, rec_vw, desired = warp_dev.crop_matrices(
                quads_c, valid_c, imgH, rec_w)
            rec_vw = jnp.where(valid_c, rec_vw, 0)
            if use_cls:
                cls_m, _, cls_vw, _ = warp_dev.crop_matrices(
                    quads_c, valid_c, fused.cls_h, fused.cls_w)
                cls_vw = jnp.where(valid_c, cls_vw, 0)
                cls_crops = warp_ops.warp_crops(
                    image_u8, cls_m, cls_vw, fused.cls_h, fused.cls_w,
                    fused.interp, False if wave else fused.stage,
                    fused.stage_tol, fused.slow_k)
                cls_probs = cls_fn(cls_p, cls_crops)
                rot = (jnp.argmax(cls_probs, axis=1) == fused.idx180) & \
                    (cls_probs[:, fused.idx180] > fused.cls_thresh)
                mats = jnp.where(rot[:, None, None], rec_m_rot, rec_m)
            else:
                mats = rec_m
            crops = warp_ops.warp_crops(image_u8, mats, rec_vw, imgH,
                                        rec_w, fused.interp,
                                        False if wave else fused.stage,
                                        fused.stage_tol, fused.slow_k)
            if fused.rec_forward.masks_width:
                idx, prob_max = rec_fn(rec_p, crops, (rec_vw + 7) // 8)
            else:
                idx, prob_max = rec_fn(rec_p, crops)

            # --- pack everything into one buffer: one download, one RTT
            T = idx.shape[1]
            wbuf = 12 + 2 * T
            body = jnp.concatenate([
                quads_c.reshape(k_rec, 8),
                scores_c[:, None],
                valid_c[:, None].astype(jnp.float32),
                rec_vw[:, None].astype(jnp.float32),
                desired[:, None].astype(jnp.float32),
                idx.astype(jnp.float32),
                prob_max.astype(jnp.float32)], axis=-1)
            tail = jnp.zeros((1, wbuf), jnp.float32)
            tail = tail.at[0, 0].set(n_valid.astype(jnp.float32))
            # det block: ALL K_det filtered quads (+valid flag), flattened
            # into wbuf-wide rows — the overflow path's box source (~36 KB
            # extra on the same single download)
            det_flat = jnp.concatenate(
                [quads_s.reshape(k_det, 8),
                 valid[:, None].astype(jnp.float32)], axis=-1).reshape(-1)
            n_det_rows = -(-det_flat.shape[0] // wbuf)
            det_block = jnp.concatenate(
                [det_flat,
                 jnp.zeros((n_det_rows * wbuf - det_flat.shape[0],),
                           jnp.float32)]).reshape(n_det_rows, wbuf)
            return jnp.concatenate([body, tail, det_block], axis=0)

        return step

    # ---------------------------------------------------------------- host
    def __call__(self, img: np.ndarray, cls: bool
                 ) -> Optional[Tuple[np.ndarray, List[Tuple[str, float]]]]:
        """Returns (dt_boxes (N,4,2) float32, rec_res) in device (raster)
        order — the caller applies sorted_boxes pairing and drop_score.
        Pages with more than K_rec boxes keep the prefix results and run
        the remainder through the staged fused path (same HBM image)."""
        use_cls = bool(cls and self.fused.cls_forward is not None and
                       self.fused.idx180 is not None)
        image_dev, src_h, src_w = resize_dev.put_src_bucket(
            img, getattr(self.args, "tpu_src_upload", "auto"))
        rh, rw = det_pre.det_resize_target(
            src_h, src_w, self.detector.limit_side_len,
            self.detector.limit_type)
        if self.fixed_canvas:
            cap = det_pre.round_up(int(self.detector.limit_side_len),
                                   self.detector.bucket)
            hb = wb = max(cap, det_pre.round_up(max(rh, rw),
                                                self.detector.bucket))
        else:
            hb = det_pre.round_up(rh, self.detector.bucket)
            wb = det_pre.round_up(rw, self.detector.bucket)
        eh, ew = self._ex_window(rh, rw, hb, wb)
        if self._wave is not None:
            packed = self._wave.run(use_cls, image_dev, src_h, src_w,
                                    rh, rw, hb, wb, eh, ew)
        else:
            packed = self._run_single(use_cls, image_dev, src_h, src_w,
                                      rh, rw, hb, wb, eh, ew)
        return self._decode_packed(packed, image_dev, use_cls)

    def _params(self, use_cls: bool):
        det_p = self.detector.forward.pdev
        cls_p = self.fused.cls_forward.pdev if \
            (use_cls and self.fused.cls_forward is not None) else {}
        rec_p = self.fused.rec_forward.pdev
        return det_p, cls_p, rec_p

    def _run_single(self, use_cls, image_dev, src_h, src_w, rh, rw,
                    hb, wb, eh=0, ew=0) -> np.ndarray:
        with self._jit_lock:
            fn = self._jit.get(use_cls)
            if fn is None:
                fn = self._build(use_cls)
                self._jit[use_cls] = fn
        det_p, cls_p, rec_p = self._params(use_cls)
        args = (det_p, cls_p, rec_p,
                image_dev, jnp.int32(src_h), jnp.int32(src_w),
                jnp.int32(rh), jnp.int32(rw))
        from ..utils.profiling import CAPTURE
        CAPTURE.record("onecall",
                       lambda *a, _f=fn, _h=hb, _w=wb, _eh=eh, _ew=ew:
                       _f(*a, out_h=_h, out_w=_w, ex_h=_eh, ex_w=_ew),
                       args)
        return np.asarray(fn(*args, out_h=hb, out_w=wb, ex_h=eh, ex_w=ew))

    def _get_batched(self, use_cls: bool, B: int, out_h: int, out_w: int,
                     ex_h: int = 0, ex_w: int = 0):
        """One jitted vmap-over-pages program per (use_cls, B, canvas,
        window) — the single-device analog of sharded_batch_fn, used by
        the wave coalescer. Output row-blocks decode exactly like the
        single-page packed buffer."""
        key = (use_cls, B, out_h, out_w, ex_h, ex_w)
        with self._jit_lock:
            fn = self._jit_batched.get(key)
            if fn is None:
                step = self._make_step(use_cls, wave=True)

                def batched(det_p, cls_p, rec_p, images_u8, src_h, src_w,
                            r_h, r_w):
                    return jax.vmap(
                        lambda im, sh, sw, rhh, rww: step(
                            det_p, cls_p, rec_p, im, sh, sw, rhh, rww,
                            out_h=out_h, out_w=out_w, ex_h=ex_h,
                            ex_w=ex_w)
                    )(images_u8, src_h, src_w, r_h, r_w)

                fn = jax.jit(batched)
                self._jit_batched[key] = fn
        return fn

    def close(self):
        if self._wave is not None:
            self._wave.close()

    def _decode_packed(self, packed: np.ndarray, image_dev, use_cls: bool
                       ) -> Tuple[np.ndarray, List[Tuple[str, float]]]:
        body = packed[:self.k_rec]
        n_valid = int(packed[self.k_rec, 0])
        valid = body[:, 9] > 0.5
        rows = body[valid]
        if n_valid == 0 or rows.shape[0] == 0:
            return np.zeros((0, 4, 2), np.float32), []
        boxes = rows[:, :8].reshape(-1, 4, 2).astype(np.float32)
        rec_vw = rows[:, 10].astype(np.int32)
        desired = rows[:, 11].astype(np.int32)
        T = (body.shape[1] - 12) // 2
        idx = rows[:, 12:12 + T].astype(np.int32)
        prob_max = rows[:, 12 + T:]
        stride = self.rec_w // T
        valid_t = [min(T, int(math.ceil(w / stride))) for w in rec_vw]
        rec_res = self.recognizer.postprocess_op.decode_indices(
            idx, prob_max, is_remove_duplicate=True, valid_t=valid_t)

        wide = np.nonzero(desired > self.rec_w)[0]
        if len(wide):
            # rare wide lines: staged per-bucket pass on the same HBM image
            redo = self.recognizer.run_boxes_fused(
                image_dev, boxes[wide], self.fused,
                (self.fused.cls_h, self.fused.cls_w), use_cls=use_cls)
            for i, res in zip(wide, redo):
                rec_res[i] = res

        if n_valid > self.k_rec:
            # overflow: the det block carries every filtered quad — keep
            # the K_rec prefix results and fused-run only the remainder
            det_flat = packed[self.k_rec + 1:].reshape(-1)
            det_rows = det_flat[:self.k_det * 9].reshape(self.k_det, 9)
            boxes_all = det_rows[det_rows[:, 8] > 0.5, :8].reshape(
                -1, 4, 2).astype(np.float32)
            rest = boxes_all[self.k_rec:]
            rec_rest = self.recognizer.run_boxes_fused(
                image_dev, rest, self.fused,
                (self.fused.cls_h, self.fused.cls_w), use_cls=use_cls)
            return boxes_all, rec_res + rec_rest
        return boxes, rec_res


class _WaveReq:
    __slots__ = ("key", "image_dev", "src_h", "src_w", "rh", "rw",
                 "event", "packed", "error")

    def __init__(self, key, image_dev, src_h, src_w, rh, rw):
        self.key = key
        self.image_dev = image_dev
        self.src_h = src_h
        self.src_w = src_w
        self.rh = rh
        self.rw = rw
        self.event = threading.Event()
        self.packed = None
        self.error = None


class _WaveCoalescer:
    """Coalesce concurrent one-call pages into multi-page waves.

    Serving requests arrive on engine executor threads (reference analog:
    app/engine.py's semaphore + thread pool); each prepared page enqueues
    here and a single dispatcher thread batches whatever is queued at
    dispatch time into the largest WARM tier (2/4 pages → one vmapped
    program, ONE download per wave). Deadline-aware by construction:
    nothing ever waits on a timer — a lone request dispatches immediately
    through the already-compiled single-page program, so unloaded latency
    is unchanged while backlogged waves amortize the per-call RTT and the
    per-page download (~30 ms each on the tunneled link).

    Compile discipline (CLAUDE.md invariant): a (src bucket, canvas, B)
    batch program is a distinct XLA compile, so tiers activate only after
    a background warm pass compiles them (triggered the first time a key
    shows backlog; device-resident zeros, no upload). Until then waves
    run batch-1 — never a surprise multi-minute stall on a live request.
    """

    def __init__(self, pipe: OneCallPipeline, tiers: List[int]):
        self.pipe = pipe
        self.tiers = sorted(tiers, reverse=True)  # e.g. [4, 2]
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._queue: List[_WaveReq] = []
        self._ready = set()      # (key, B) with a compiled batch program
        self._warming = set()
        self._closed = False
        self._hold = False       # test hook: pause dispatch
        self.stats = {"waves": {}, "pages": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="onecall-wave")
        self._thread.start()

    # ------------------------------------------------------------- client
    def run(self, use_cls, image_dev, src_h, src_w, rh, rw, hb, wb,
            eh=0, ew=0) -> np.ndarray:
        key = (bool(use_cls), tuple(image_dev.shape), int(hb), int(wb),
               int(eh), int(ew))
        req = _WaveReq(key, image_dev, int(src_h), int(src_w),
                       int(rh), int(rw))
        with self._cv:
            if self._closed:
                raise RuntimeError("wave coalescer closed")
            self._queue.append(req)
            self._cv.notify()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.packed

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()

    # ---------------------------------------------------------- dispatcher
    def _loop(self):
        while True:
            with self._cv:
                while (not self._queue or self._hold) and not self._closed:
                    self._cv.wait(0.1)
                if self._closed and not self._queue:
                    return
                if self._hold and not self._closed:
                    continue
                key = self._queue[0].key
                group = [r for r in self._queue if r.key == key]
                want = next((t for t in self.tiers if t <= len(group)), 1)
                B = next((t for t in self.tiers
                          if t <= len(group) and (key, t) in self._ready),
                         1)
                if want > B and (key, want) not in self._warming:
                    self._warming.add((key, want))
                    threading.Thread(target=self._warm, daemon=True,
                                     args=(key, want)).start()
                batch = group[:B]
                for r in batch:
                    self._queue.remove(r)
            try:
                self._dispatch(key, batch)
            except Exception as e:  # noqa: BLE001 — report to the callers
                for r in batch:
                    r.error = e
                    r.event.set()

    def _dispatch(self, key, batch: List[_WaveReq]):
        use_cls, _, hb, wb, eh, ew = key
        pipe = self.pipe
        self.stats["pages"] += len(batch)
        self.stats["waves"][len(batch)] = \
            self.stats["waves"].get(len(batch), 0) + 1
        if len(batch) == 1:
            r = batch[0]
            r.packed = pipe._run_single(use_cls, r.image_dev, r.src_h,
                                        r.src_w, r.rh, r.rw, hb, wb,
                                        eh, ew)
            r.event.set()
            return
        fn = pipe._get_batched(use_cls, len(batch), hb, wb, eh, ew)
        det_p, cls_p, rec_p = pipe._params(use_cls)
        images = jnp.stack([r.image_dev for r in batch])
        sh = jnp.array([r.src_h for r in batch], jnp.int32)
        sw = jnp.array([r.src_w for r in batch], jnp.int32)
        rh = jnp.array([r.rh for r in batch], jnp.int32)
        rw = jnp.array([r.rw for r in batch], jnp.int32)
        out = np.asarray(fn(det_p, cls_p, rec_p, images, sh, sw, rh, rw))
        for i, r in enumerate(batch):
            r.packed = out[i]
            r.event.set()

    def _warm(self, key, B: int):
        """Compile the (key, B) batch program off the request path, on
        device-resident zeros (no host upload)."""
        try:
            use_cls, src_shape, hb, wb, eh, ew = key
            fn = self.pipe._get_batched(use_cls, B, hb, wb, eh, ew)
            det_p, cls_p, rec_p = self.pipe._params(use_cls)
            images = jnp.zeros((B,) + tuple(src_shape), jnp.uint8)
            ones = jnp.full((B,), 32, jnp.int32)
            jax.block_until_ready(
                fn(det_p, cls_p, rec_p, images, ones, ones, ones, ones))
            with self._cv:
                self._ready.add((key, B))
        except Exception:
            pass
        finally:
            with self._cv:
                self._warming.discard((key, B))

    def warm_sync(self, use_cls: bool, src_shape, hb: int, wb: int,
                  B: int, eh: int = 0, ew: int = 0):
        """Blocking tier warm-up (engine warmup / tests)."""
        key = (bool(use_cls), tuple(src_shape), int(hb), int(wb),
               int(eh), int(ew))
        self._warm(key, B)
