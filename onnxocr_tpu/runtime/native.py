"""ctypes loader for the C++ host-runtime library (libocrhost.so).

The library implements the irregular host-side pieces of DB postprocessing —
connected-component contour tracing, min-area rect, and polygon offsetting —
natively, replacing the reference's reliance on OpenCV/pyclipper C++ wheels
(reference: onnxocr/db_postprocess.py:104-157). Built from
onnxocr_tpu/runtime/native/*.cc via tools/build_native.py; all call sites
fall back to cv2/numpy implementations when the library is absent.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_CANDIDATES = [
    os.environ.get("ONNXOCR_TPU_NATIVE_LIB", ""),
    os.path.join(_HERE, "native", "libocrhost.so"),
]


def _try_build() -> None:
    """Best-effort build of libocrhost.so from the bundled sources (g++ is
    part of the toolchain; see tools/build_native.py for the manual path)."""
    import subprocess
    src_dir = os.path.join(_HERE, "native")
    srcs = [os.path.join(src_dir, f) for f in sorted(os.listdir(src_dir))
            if f.endswith(".cc")]
    if not srcs:
        return
    out = os.path.join(src_dir, "libocrhost.so")
    try:
        subprocess.run(["g++", "-std=c++17", "-shared", "-fPIC", "-O2",
                        "-o", out, *srcs, "-lm"],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not any(p and os.path.exists(p) for p in _CANDIDATES):
        _try_build()
    for path in _CANDIDATES:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.ocr_find_contours.restype = ctypes.c_int
            lib.ocr_find_contours.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),  # bitmap
                ctypes.c_int, ctypes.c_int,      # h, w
                ctypes.POINTER(ctypes.c_int32),  # out points (x,y)*
                ctypes.POINTER(ctypes.c_int32),  # out contour lengths
                ctypes.c_int, ctypes.c_int,      # max_points, max_contours
            ]
            lib.ocr_min_area_rect.restype = None
            lib.ocr_min_area_rect.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),  # out: cx,cy,w,h,angle
            ]
            lib.ocr_offset_polygon.restype = ctypes.c_int
            lib.ocr_offset_polygon.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ]
            try:  # absent in libraries built before this symbol existed
                lib.ocr_find_contours_filtered.restype = ctypes.c_int
                lib.ocr_find_contours_filtered.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int, ctypes.c_int,
                    ctypes.c_double,    # min bbox area
                    ctypes.c_longlong,  # max traced index
                ]
            except AttributeError:
                pass
            try:  # absent in libraries built before this symbol existed
                lib.ocr_box_score.restype = ctypes.c_double
                lib.ocr_box_score.argtypes = [
                    ctypes.POINTER(ctypes.c_float),  # prob map
                    ctypes.c_int, ctypes.c_int,      # h, w
                    ctypes.POINTER(ctypes.c_double),  # poly (x,y)*
                    ctypes.c_int,                    # n vertices
                ]
            except AttributeError:
                pass
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


class NativeOverflow(RuntimeError):
    """The C++ tracer's output buffers overflowed even after retrying with
    the worst-case size — callers should fall back to the Python path."""


def _unpack_contours(n: int, pts: np.ndarray,
                     lens: np.ndarray) -> List[np.ndarray]:
    out = []
    off = 0
    for i in range(n):
        k = lens[i]
        out.append(pts[off:off + k].copy())
        off += k
    return out


def _trace(call, h: int, w: int) -> List[np.ndarray]:
    """Run a tracer entry point, retrying once with worst-case buffers.

    trace_contours returns -1 when out_pts/out_lens overflow. h*w+4 points
    is usually plenty but IS reachable (a 1 px-wide stroke emits its border
    pixels twice), and silently treating -1 as "no contours" made such
    pages detect nothing. Retry with the true worst case — each pixel's
    border point can be emitted at most 4 times (once per Moore-trace
    direction) — then raise NativeOverflow so the caller can fall back."""
    for mult, max_contours in ((1, 8192), (4, 1 << 20)):
        max_points = mult * h * w + 8
        pts = np.empty((max_points, 2), dtype=np.int32)
        lens = np.empty(max_contours, dtype=np.int32)
        n = call(pts, lens, max_points, max_contours)
        if n >= 0:
            return _unpack_contours(n, pts, lens)
    raise NativeOverflow("contour buffers overflowed (h=%d w=%d)" % (h, w))


def find_contours(bitmap_u8: np.ndarray) -> List[np.ndarray]:
    lib = _load()
    h, w = bitmap_u8.shape
    bitmap_u8 = np.ascontiguousarray(bitmap_u8)

    def call(pts, lens, max_points, max_contours):
        return lib.ocr_find_contours(
            bitmap_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_points, max_contours)

    return _trace(call, h, w)


def has_filtered_contours() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "ocr_find_contours_filtered")


def find_contours_filtered(bitmap_u8: np.ndarray, min_bbox_area: float,
                           max_index: int) -> List[np.ndarray]:
    """Raster-order contours whose bbox area ≥ min_bbox_area, among the
    first max_index traced (the DB `contours[:max_candidates]` slice by
    ORIGINAL index) — the speckle prefilter runs in C++ so thousands of
    1-2 px contours never reach Python."""
    lib = _load()
    h, w = bitmap_u8.shape
    bitmap_u8 = np.ascontiguousarray(bitmap_u8)

    def call(pts, lens, max_points, max_contours):
        return lib.ocr_find_contours_filtered(
            bitmap_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_points, max_contours, float(min_bbox_area), int(max_index))

    return _trace(call, h, w)


def min_area_rect(points: np.ndarray):
    lib = _load()
    pts = np.ascontiguousarray(points.astype(np.float32).reshape(-1, 2))
    res = np.empty(5, dtype=np.float32)
    lib.ocr_min_area_rect(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        res.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return (float(res[0]), float(res[1])), (float(res[2]), float(res[3])), \
        float(res[4])


def offset_polygon(poly: np.ndarray, distance: float) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(poly.astype(np.float64).reshape(-1, 2))
    max_out = len(pts) * 64 + 64
    out = np.empty((max_out, 2), dtype=np.float64)
    n = lib.ocr_offset_polygon(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        float(distance),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_out)
    return out[:n].copy()


def has_box_score() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "ocr_box_score") and \
        getattr(lib.ocr_box_score, "restype", None) is ctypes.c_double


def box_score(prob: np.ndarray, poly: np.ndarray) -> float:
    """Mean prob inside the polygon (C++ even-odd raster scan)."""
    lib = _load()
    prob = np.ascontiguousarray(prob, dtype=np.float32)
    pts = np.ascontiguousarray(poly, dtype=np.float64).reshape(-1, 2)
    return float(lib.ocr_box_score(
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        prob.shape[0], prob.shape[1],
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts)))
