"""DB (Differentiable Binarization) postprocessing.

Reference behavior: onnxocr/db_postprocess.py — threshold the shrink-prob map
(pred > 0.3), find contours, min-area-rect each, score by masked mean
(box_score_fast), drop below box_thresh (0.6), unclip by 1.5, min-area-rect
again, rescale to source coords, clip+int32 (boxes_from_bitmap :104-149).

Split for TPU: binarization is a trivial device op fused into the det model
call; the irregular, data-dependent box extraction runs on host. The host
path prefers the in-repo C++ runtime (runtime/native) and falls back to
cv2 + the numpy geometry in ops/geometry.py.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from . import geometry


def _min_area_quad(points: np.ndarray) -> Tuple[np.ndarray, float]:
    """Min-area rect corners sorted the DB way; returns (4x2 pts, short side)
    (reference get_mini_boxes, db_postprocess.py:159-180). Runs on the
    in-repo geometry stack (C++ runtime rotating calipers via
    runtime/native, numpy fallback) — cv2 is only a test oracle here."""
    from ..runtime import native
    if native.available():
        rect = native.min_area_rect(points.astype(np.float64))
        corners = geometry.box_points(rect)
    else:
        rect = geometry.min_area_rect(points)
        corners = geometry.box_points(rect)
    sside = min(rect[1])
    pts = sorted(corners.tolist(), key=lambda p: p[0])
    if pts[1][1] > pts[0][1]:
        i1, i4 = 0, 1
    else:
        i1, i4 = 1, 0
    if pts[3][1] > pts[2][1]:
        i2, i3 = 2, 3
    else:
        i2, i3 = 3, 2
    box = np.array([pts[i1], pts[i2], pts[i3], pts[i4]], dtype=np.float32)
    return box, float(sside)


def box_score_fast(bitmap: np.ndarray, box: np.ndarray) -> float:
    """Mean prob inside the quad (axis-aligned crop + polygon mask),
    reference db_postprocess.py:182-197. C++ raster scan when the native
    runtime is loaded (identical even-odd semantics), numpy otherwise."""
    from ..runtime import native
    if native.has_box_score():
        return native.box_score(bitmap, box)
    h, w = bitmap.shape[:2]
    pts = box.copy()
    xmin = int(np.clip(np.floor(pts[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(pts[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(pts[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(pts[:, 1].max()), 0, h - 1))
    pts[:, 0] -= xmin
    pts[:, 1] -= ymin
    mask = geometry.fill_poly_mask((ymax - ymin + 1, xmax - xmin + 1),
                                   pts.astype(np.int32))
    region = bitmap[ymin:ymax + 1, xmin:xmax + 1]
    denom = mask.sum()
    if denom == 0:
        return 0.0
    return float((region * mask).sum() / denom)


def box_score_slow(bitmap: np.ndarray, contour: np.ndarray) -> float:
    """Mean prob inside the exact contour polygon
    (reference db_postprocess.py:199-218)."""
    from ..runtime import native
    if native.has_box_score():
        return native.box_score(bitmap,
                                np.reshape(contour, (-1, 2)))
    h, w = bitmap.shape[:2]
    pts = np.reshape(contour.copy(), (-1, 2)).astype(np.float64)
    xmin = int(np.clip(pts[:, 0].min(), 0, w - 1))
    xmax = int(np.clip(pts[:, 0].max(), 0, w - 1))
    ymin = int(np.clip(pts[:, 1].min(), 0, h - 1))
    ymax = int(np.clip(pts[:, 1].max(), 0, h - 1))
    pts[:, 0] -= xmin
    pts[:, 1] -= ymin
    mask = geometry.fill_poly_mask((ymax - ymin + 1, xmax - xmin + 1),
                                   pts.astype(np.int32))
    region = bitmap[ymin:ymax + 1, xmin:xmax + 1]
    denom = mask.sum()
    if denom == 0:
        return 0.0
    return float((region * mask).sum() / denom)


def _find_contours(bitmap_u8: np.ndarray) -> List[np.ndarray]:
    """Contour extraction (RETR_LIST + CHAIN_APPROX_SIMPLE semantics).

    Prefers the in-repo C++ tracer (runtime/native), falls back to cv2.
    Returns a list of (K, 2) int arrays in (x, y) order.
    """
    from ..runtime import native
    if native.available():
        try:
            return native.find_contours(bitmap_u8)
        except native.NativeOverflow:
            pass  # pathological page: fall through to cv2
    import cv2
    outs = cv2.findContours(bitmap_u8, cv2.RETR_LIST,
                            cv2.CHAIN_APPROX_SIMPLE)
    contours = outs[0] if len(outs) == 2 else outs[1]
    return [c.reshape(-1, 2) for c in contours]


def _candidate_contours(bitmap_u8: np.ndarray, min_sq: float,
                        max_candidates: int) -> List[np.ndarray]:
    """Contours eligible for the DB quad loop: first max_candidates by
    ORIGINAL raster index (reference `contours[:max_candidates]`), minus
    those whose bbox area < min_sq — an exact prefilter (min-area-rect
    sside ≤ √(bbox area)) that keeps speckle out of the per-contour
    geometry calls. Runs inside the C++ tracer when available."""
    from ..runtime import native
    if native.has_filtered_contours():
        try:
            return native.find_contours_filtered(bitmap_u8, min_sq,
                                                 max_candidates)
        except native.NativeOverflow:
            pass  # pathological page: fall through to the generic path
    return [c for c in _find_contours(bitmap_u8)[:max_candidates]
            if float(np.ptp(c[:, 0])) * float(np.ptp(c[:, 1])) >= min_sq]


class DBPostProcess:
    """Same knobs and output contract as the reference class
    (db_postprocess.py:29-246)."""

    def __init__(self, thresh=0.3, box_thresh=0.7, max_candidates=1000,
                 unclip_ratio=2.0, use_dilation=False, score_mode="fast",
                 box_type="quad", **kwargs):
        assert score_mode in ("slow", "fast")
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.min_size = 3
        self.score_mode = score_mode
        self.box_type = box_type
        self.use_dilation = use_dilation

    def boxes_from_bitmap(self, pred: np.ndarray, bitmap: np.ndarray,
                          dest_width: int, dest_height: int):
        height, width = bitmap.shape
        boxes = []
        scores = []
        for contour in _candidate_contours(
                (bitmap * 255).astype(np.uint8),
                float(self.min_size) ** 2, self.max_candidates):
            points, sside = _min_area_quad(contour.reshape(-1, 2))
            if sside < self.min_size:
                continue
            if self.score_mode == "fast":
                score = box_score_fast(pred, points.reshape(-1, 2))
            else:
                score = box_score_slow(pred, contour)
            if self.box_thresh > score:
                continue
            expanded = geometry.unclip(points, self.unclip_ratio)
            box, sside = _min_area_quad(expanded.astype(np.float32))
            if sside < self.min_size + 2:
                continue
            box = np.array(box)
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width),
                                0, dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height),
                                0, dest_height)
            boxes.append(box.astype(np.int32))
            scores.append(score)
        return np.array(boxes, dtype=np.int32), scores

    def candidates_from_bitmap(self, bitmap: np.ndarray, dest_width: int,
                               dest_height: int
                               ) -> Tuple[np.ndarray, np.ndarray]:
        """Score-DEFERRED boxes_from_bitmap for the bitmap wire: the same
        contour → min-area-quad → unclip chain, but WITHOUT the prob map —
        box scoring runs on device against the HBM-resident map
        (pipeline/fused.call_scored) and the box_thresh filter applies
        when the scores come back (same final set and order as the
        reference flow; unclip merely runs on candidates the reference
        would have score-dropped first). quad + score_mode='fast' only.

        Returns (pre_quads (K, 4, 2) float32 in MAP coords — the
        pre-unclip quads the reference scores, db_postprocess.py:124-137 —
        and boxes (K, 4, 2) int32 in source coords)."""
        height, width = bitmap.shape
        pre_quads = []
        boxes = []
        for contour in _candidate_contours(
                (bitmap * 255).astype(np.uint8),
                float(self.min_size) ** 2, self.max_candidates):
            points, sside = _min_area_quad(contour.reshape(-1, 2))
            if sside < self.min_size:
                continue
            expanded = geometry.unclip(points, self.unclip_ratio)
            box, sside = _min_area_quad(expanded.astype(np.float32))
            if sside < self.min_size + 2:
                continue
            box = np.array(box)
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width),
                                0, dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height),
                                0, dest_height)
            pre_quads.append(points)
            boxes.append(box.astype(np.int32))
        return (np.asarray(pre_quads, np.float32).reshape(-1, 4, 2),
                np.asarray(boxes, np.int32).reshape(-1, 4, 2))

    def polygons_from_bitmap(self, pred: np.ndarray, bitmap: np.ndarray,
                             dest_width: int, dest_height: int):
        height, width = bitmap.shape
        boxes = []
        scores = []
        contours = _find_contours((bitmap * 255).astype(np.uint8))
        for contour in contours[:self.max_candidates]:
            c = contour.reshape(-1, 2).astype(np.int32)
            epsilon = 0.002 * geometry.arc_length(c, closed=True)
            points = geometry.approx_poly_dp(c, epsilon, closed=True)
            points = points.reshape((-1, 2))
            if points.shape[0] < 4:
                continue
            score = box_score_fast(pred, points.reshape(-1, 2))
            if self.box_thresh > score:
                continue
            expanded = geometry.unclip(points, self.unclip_ratio)
            if expanded.shape[0] < 3:
                continue
            box = expanded.reshape(-1, 2)
            _, sside = _min_area_quad(box.astype(np.float32))
            if sside < self.min_size + 2:
                continue
            box = np.array(box)
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width),
                                0, dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height),
                                0, dest_height)
            boxes.append(box.tolist())
            scores.append(score)
        return boxes, scores

    def __call__(self, outs_dict, shape_list):
        pred = outs_dict["maps"]
        pred = pred[:, 0, :, :]
        segmentation = pred > self.thresh
        boxes_batch = []
        for batch_index in range(pred.shape[0]):
            src_h, src_w, ratio_h, ratio_w = shape_list[batch_index]
            mask = segmentation[batch_index]
            if self.use_dilation:
                mask = geometry.dilate2x2(mask.astype(np.uint8))
            if self.box_type == "poly":
                boxes, scores = self.polygons_from_bitmap(
                    pred[batch_index], mask, src_w, src_h)
            elif self.box_type == "quad":
                boxes, scores = self.boxes_from_bitmap(
                    pred[batch_index], mask, src_w, src_h)
            else:
                raise ValueError("box_type can only be one of ['quad', 'poly']")
            boxes_batch.append({"points": boxes})
        return boxes_batch


class DistillationDBPostProcess:
    """Multi-head variant (reference db_postprocess.py:249-276; unused by
    the pipeline but part of the public surface)."""

    def __init__(self, model_name=("student",), key=None, thresh=0.3,
                 box_thresh=0.6, max_candidates=1000, unclip_ratio=1.5,
                 use_dilation=False, score_mode="fast", box_type="quad",
                 **kwargs):
        self.model_name = list(model_name)
        self.key = key
        self.post_process = DBPostProcess(
            thresh=thresh, box_thresh=box_thresh,
            max_candidates=max_candidates, unclip_ratio=unclip_ratio,
            use_dilation=use_dilation, score_mode=score_mode,
            box_type=box_type)

    def __call__(self, predicts, shape_list):
        return {k: self.post_process(predicts[k], shape_list=shape_list)
                for k in self.model_name}
