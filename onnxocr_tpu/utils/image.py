"""Host image utilities: crop warps, base64 decode, simple resize.

Reference: onnxocr/utils.py:12-88, 238-244. The host warp path exists for
the reference-compatible crop-list APIs and for parity testing; the pipeline
hot path warps on device (ops/warp.py).
"""
from __future__ import annotations

import numpy as np

from ..ops import geometry
from ..ops.warp import perspective_transform


def get_rotate_crop_image(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Perspective-crop a quad, rotating 90° if h/w >= 1.5
    (reference onnxocr/utils.py:12-53)."""
    import cv2
    assert len(points) == 4, "shape of points must be 4*2"
    points = np.asarray(points, dtype=np.float32)
    img_crop_width = int(max(np.linalg.norm(points[0] - points[1]),
                             np.linalg.norm(points[2] - points[3])))
    img_crop_height = int(max(np.linalg.norm(points[0] - points[3]),
                              np.linalg.norm(points[1] - points[2])))
    pts_std = np.float32([[0, 0], [img_crop_width, 0],
                          [img_crop_width, img_crop_height],
                          [0, img_crop_height]])
    M = perspective_transform(points, pts_std)
    dst_img = cv2.warpPerspective(
        img, M, (img_crop_width, img_crop_height),
        borderMode=cv2.BORDER_REPLICATE, flags=cv2.INTER_CUBIC)
    dst_h, dst_w = dst_img.shape[0:2]
    if dst_h * 1.0 / dst_w >= 1.5:
        dst_img = np.rot90(dst_img)
    return dst_img


def get_minarea_rect_crop(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Min-area-rect crop for poly boxes (reference onnxocr/utils.py:56-76)."""
    box = minarea_quad(points)
    return get_rotate_crop_image(img, box)


def minarea_quad(points: np.ndarray) -> np.ndarray:
    """Min-area rect of a point set, corners in the DB order
    (x-sorted pairing, reference utils.py:58-74)."""
    rect = geometry.min_area_rect(np.asarray(points, dtype=np.float32))
    pts = sorted(geometry.box_points(rect).tolist(), key=lambda p: p[0])
    if pts[1][1] > pts[0][1]:
        ia, id_ = 0, 1
    else:
        ia, id_ = 1, 0
    if pts[3][1] > pts[2][1]:
        ib, ic = 2, 3
    else:
        ib, ic = 3, 2
    return np.array([pts[ia], pts[ib], pts[ic], pts[id_]], dtype=np.float32)


def resize_img(img: np.ndarray, input_size: int = 600) -> np.ndarray:
    """Limit the longest side to input_size (reference utils.py:79-88)."""
    import cv2
    img = np.asarray(img)
    im_scale = float(input_size) / max(img.shape[:2])
    return cv2.resize(img, None, None, fx=im_scale, fy=im_scale)


def base64_to_cv2(b64str: str) -> np.ndarray:
    import base64
    import cv2
    data = base64.b64decode(b64str.encode("utf8"))
    data = np.frombuffer(data, np.uint8)
    return cv2.imdecode(data, cv2.IMREAD_COLOR)
