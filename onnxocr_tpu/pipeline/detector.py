"""Text detector: resize → device DBNet forward → DB postprocess → quads.

Reference contract: onnxocr/predict_det.py TextDetector.__call__(img) →
(N, 4, 2) float32 boxes ordered clockwise, filtered to sides > 3px. The
TPU version pads the resized image to a compile bucket and slices the prob
map back to the exact (resize_h, resize_w) before postprocessing, so box
coordinates match the reference geometry.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops import det_pre, geometry
from ..ops.db_post import DBPostProcess
from .. import config as cfg_mod
from . import backends


class TextDetector:
    def __init__(self, args):
        self.args = args
        self.limit_side_len = args.det_limit_side_len
        self.limit_type = args.det_limit_type
        # fixed-shape resize mode (DetResizeForTest type1) when set
        self.image_shape = getattr(args, "det_image_shape", None)
        self.keep_ratio = getattr(args, "det_keep_ratio", False)
        self.bucket = int(getattr(args, "tpu_det_bucket", 320))
        # tpu_det_dtype overrides tpu_dtype for the det forward alone:
        # the round-3 whole-pipeline bf16 A/B lost accuracy mostly in the
        # rec stage; det-only bf16 (extraction/scoring stay f32 — the
        # prob map is cast back) is the cheap MXU win candidate
        # (VERDICT r4 #1b).
        det_dt = getattr(args, "tpu_det_dtype", "") or \
            getattr(args, "tpu_dtype", "float32")
        dtype = jnp.bfloat16 if det_dt == "bfloat16" else jnp.float32
        arch = backends.pick_arch("det", args.det_model_dir)
        backend, path, params, arch, calib = backends.resolve_backend(
            "det", args.det_model_dir,
            getattr(args, "tpu_backend", "auto"), dtype=dtype, arch=arch,
            allow_untrained=getattr(args, "tpu_allow_untrained", False))
        # Checkpoint calibration: a native checkpoint may ship tuned
        # inference knobs (calibration.json beside the npz — see
        # backends.checkpoint_calibration). Applied only for flags the
        # caller did not explicitly pass, so user settings and reference
        # defaults for graph models always win.
        user_keys = getattr(args, "_user_keys", set()) or set()
        for k, v in calib.items():
            if k.startswith("det_") and k not in user_keys:
                setattr(args, k, v)
        self.postprocess_op = DBPostProcess(
            thresh=args.det_db_thresh,
            box_thresh=args.det_db_box_thresh,
            max_candidates=1000,
            unclip_ratio=args.det_db_unclip_ratio,
            use_dilation=args.use_dilation,
            score_mode=args.det_db_score_mode,
            box_type=args.det_box_type,
        )
        self.forward = backends.DetForward(
            backend, path, params, dtype,
            map_dtype=getattr(args, "tpu_det_map_dtype", "float32"),
            arch=arch)
        self._page_batcher = None
        if getattr(args, "tpu_det_microbatch", False):
            self.enable_page_batching(
                max_wait_ms=float(getattr(args, "tpu_microbatch_wait_ms",
                                          8.0)))

    def enable_page_batching(self, max_wait_ms: float = 8.0,
                             mesh=None) -> bool:
        """Cross-request det batching: concurrent pages share one DBNet
        device call (runtime/batcher.DetPageBatcher). Requires the default
        limit_type='max' sizing (bounded canvas); returns False otherwise.
        With `mesh`, the page batch shards over the mesh's `data` axis
        (multi-chip serving; native backend only)."""
        if self.image_shape is not None or self.limit_type != "max":
            return False
        if mesh is not None and self.forward.backend != "native":
            mesh = None
        post = None
        if getattr(self.args, "tpu_det_postprocess", "host") == "device" \
                and self.args.det_box_type == "quad" \
                and not self.args.use_dilation:
            post = self.postprocess_op  # boxes mode: device DB extraction
        wire = "maps"
        if post is None and \
                getattr(self.args, "tpu_det_wire", "bitmap") == "bitmap" \
                and self.args.det_box_type == "quad" \
                and self.args.det_db_score_mode == "fast":
            wire = "bits"
        from ..runtime.batcher import DetPageBatcher
        self._page_batcher = DetPageBatcher(
            self.forward, self.limit_side_len, self.limit_type,
            max_wait_ms=max_wait_ms, mesh=mesh, post=post,
            max_boxes=int(getattr(self.args, "tpu_det_max_boxes", 256)),
            bucket=self.bucket, wire=wire,
            det_thresh=self.postprocess_op.thresh,
            extract_scale=getattr(self.args, "tpu_det_extract_scale", 1),
            score_scale=getattr(self.args, "tpu_det_score_scale", 1),
            db_reduce=str(getattr(self.args, "tpu_db_reduce", "scatter")),
            score_k=int(getattr(self.args, "tpu_det_score_k", 0)))
        return True

    def order_points_clockwise(self, pts: np.ndarray) -> np.ndarray:
        return geometry.order_points_clockwise(pts)

    def clip_det_res(self, points, img_height, img_width):
        points = np.array(points)
        points[:, 0] = np.clip(points[:, 0], 0, img_width - 1)
        points[:, 1] = np.clip(points[:, 1], 0, img_height - 1)
        return points

    def filter_tag_det_res(self, dt_boxes, image_shape):
        """Clockwise order, clip to image, drop boxes with side <= 3px
        (reference predict_det.py:67-81)."""
        img_height, img_width = image_shape[:2]
        out = []
        for box in dt_boxes:
            if isinstance(box, list):
                box = np.array(box)
            box = self.order_points_clockwise(box)
            box = self.clip_det_res(box, img_height, img_width)
            rect_width = int(np.linalg.norm(box[0] - box[1]))
            rect_height = int(np.linalg.norm(box[0] - box[3]))
            if rect_width <= 3 or rect_height <= 3:
                continue
            out.append(box)
        return np.array(out)

    def filter_tag_det_res_only_clip(self, dt_boxes, image_shape):
        img_height, img_width = image_shape[:2]
        out = []
        for box in dt_boxes:
            if isinstance(box, list):
                box = np.array(box)
            box = self.clip_det_res(box, img_height, img_width)
            out.append(box)
        return np.array(out)

    def infer_prob_map(self, img: np.ndarray):
        """Run the device forward; returns (prob_map (rh, rw) float32 numpy,
        shape_info). Exposed separately for bench/engine batching."""
        padded, shape_info, (rh, rw) = det_pre.prepare_det_input(
            img, self.limit_side_len, self.limit_type, self.bucket,
            image_shape=self.image_shape, keep_ratio=self.keep_ratio)
        prob_padded = self.forward(padded, valid_hw=(rh, rw))
        # download the full bucketed map and slice on HOST: a device-side
        # slice compiles a new program per distinct (rh, rw) — each a
        # multi-second compile/load round on the tunneled backend — while
        # the extra canvas bytes cost only milliseconds of link bandwidth
        prob = backends.DetForward.decode_map(
            np.asarray(prob_padded)[:rh, :rw])
        return prob, shape_info

    # ------------------------------------------------- device box extraction
    def infer_boxes_device(self, image_dev, src_h: int, src_w: int):
        """Fast path (tpu_det_postprocess='device'): resize → DBNet →
        connected components → oriented quads, all in ONE jit; only
        ~max_k × 10 floats cross the device→host boundary instead of the
        prob map (ops/db_device.py). Returns (N, 4, 2) float boxes in
        source coords (pre filter_tag_det_res)."""
        from ..ops import resize_dev, db_device
        import jax
        import jax.numpy as jnp

        rh, rw = det_pre.det_resize_target(src_h, src_w,
                                           self.limit_side_len,
                                           self.limit_type)
        hb = det_pre.round_up(rh, self.bucket)
        wb = det_pre.round_up(rw, self.bucket)
        pp = self.postprocess_op
        max_k = int(getattr(self.args, "tpu_det_max_boxes", 256))

        if getattr(self, "_jit_boxes", None) is None:
            fwd = self.forward

            def fn(p, image_u8, s_h, s_w, r_h, r_w, out_h, out_w):
                x = resize_dev.resize_normalize_det(
                    image_u8, s_h, s_w, r_h, r_w, out_h, out_w)
                if fwd.backend == "native":
                    from ..models import dbnet
                    prob = dbnet.apply(
                        p, x[None].astype(fwd.dtype),
                        backbone_arch=fwd.arch,
                        valid_hw=(jnp.reshape(r_h, (1,)),
                                  jnp.reshape(r_w, (1,))))[0]
                else:
                    xt = jnp.transpose(x[None].astype(jnp.float32),
                                       (0, 3, 1, 2))
                    prob = fwd.executor._interpret(
                        p, {fwd.executor.input_names[0]: xt})[0][0, 0]
                quads, scores, valid = db_device.device_boxes(
                    prob.astype(jnp.float32), r_h, r_w, max_k=max_k,
                    thresh=pp.thresh, box_thresh=pp.box_thresh,
                    unclip_ratio=pp.unclip_ratio, min_size=float(pp.min_size),
                    scale=db_device.parse_extract_scale(
                        getattr(self.args, "tpu_det_extract_scale", 1)),
                    score_scale=db_device.parse_extract_scale(
                        getattr(self.args, "tpu_det_score_scale", 1)),
                    reduce=str(getattr(self.args, "tpu_db_reduce",
                                       "scatter")),
                    score_k=int(getattr(self.args, "tpu_det_score_k", 0)),
                    axis_snap=float(getattr(self.args,
                                            "tpu_det_axis_snap", 0.0)))
                return jnp.concatenate(
                    [quads.reshape(max_k, 8), scores[:, None],
                     valid[:, None].astype(jnp.float32)], axis=-1)

            self._jit_boxes = jax.jit(fn,
                                      static_argnames=("out_h", "out_w"))

        packed = np.asarray(self._jit_boxes(
            self.forward.pdev, image_dev, jnp.int32(src_h),
            jnp.int32(src_w), jnp.int32(rh),
            jnp.int32(rw), out_h=hb, out_w=wb))
        return db_device.unpack_boxes(packed, rw, rh, src_w, src_h)

    def infer_prob_map_device(self, image_dev, src_h: int, src_w: int):
        """Device det-resize path: the HBM-resident (edge-padded) original
        is resized+normalized on device (ops/resize_dev.py) and fed straight
        to the det forward — no second host→device upload, no host resize."""
        from ..ops import resize_dev
        import jax.numpy as jnp
        if self.image_shape is not None:
            rh, rw = self.image_shape
        else:
            rh, rw = det_pre.det_resize_target(src_h, src_w,
                                               self.limit_side_len,
                                               self.limit_type)
        hb = det_pre.round_up(rh, self.bucket)
        wb = det_pre.round_up(rw, self.bucket)
        x = resize_dev.resize_normalize_det(
            image_dev, jnp.int32(src_h), jnp.int32(src_w), jnp.int32(rh),
            jnp.int32(rw), hb, wb)
        prob_padded = self.forward.call_normalized(x, valid_hw=(rh, rw))
        prob = backends.DetForward.decode_map(
            np.asarray(prob_padded)[:rh, :rw])  # host slice (see above)
        shape_info = np.array([src_h, src_w, rh / float(src_h),
                               rw / float(src_w)], dtype=np.float64)
        return prob, shape_info

    def boxes_from_prob(self, prob: np.ndarray, shape_info: np.ndarray,
                        ori_shape) -> Optional[np.ndarray]:
        preds = {"maps": prob[None, None]}
        post_result = self.postprocess_op(preds, shape_info[None])
        dt_boxes = post_result[0]["points"]
        if self.args.det_box_type == "poly":
            return self.filter_tag_det_res_only_clip(dt_boxes, ori_shape)
        return self.filter_tag_det_res(dt_boxes, ori_shape)

    def __call__(self, img: np.ndarray) -> Optional[np.ndarray]:
        if self._page_batcher is not None:
            if self._page_batcher.post is not None:
                raw = self._page_batcher.submit_boxes(img)
                return self.filter_tag_det_res(raw, img.shape)
            if self._page_batcher.wire == "bits":
                # det-only callers still need host scores: download the
                # page's map slice from the device-resident wave probs
                _bm, prob_dev, (rh, rw), shape_info = \
                    self._page_batcher.submit_bits(img)
                prob = backends.DetForward.decode_map(
                    np.asarray(prob_dev)[:rh, :rw])  # host slice
                return self.boxes_from_prob(prob, shape_info, img.shape)
            prob, shape_info = self._page_batcher.submit(img)
        else:
            prob, shape_info = self.infer_prob_map(img)
        return self.boxes_from_prob(prob, shape_info, img.shape)
