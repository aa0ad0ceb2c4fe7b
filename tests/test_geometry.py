"""Polygon geometry tests (pyclipper/shapely/cv2 replacements)."""
import numpy as np
import pytest

from onnxocr_tpu.ops import geometry


def test_min_area_rect_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    for _ in range(100):
        pts = rng.uniform(0, 200, (int(rng.integers(3, 15)), 2)) \
            .astype(np.float32)
        r_cv = cv2.minAreaRect(pts)
        r_my = geometry.min_area_rect(pts)
        a_cv = r_cv[1][0] * r_cv[1][1]
        a_my = r_my[1][0] * r_my[1][1]
        assert abs(a_cv - a_my) <= 1e-3 * max(a_cv, 1.0)


def test_box_points_reconstruct_rect():
    rect = ((50.0, 30.0), (40.0, 20.0), 30.0)
    pts = geometry.box_points(rect)
    rect2 = geometry.min_area_rect(pts)
    assert np.isclose(sorted(rect2[1]), sorted(rect[1]), atol=1e-3).all()
    assert np.allclose(rect2[0], rect[0], atol=1e-3)


def test_unclip_rectangle_analytic():
    # area*ratio/perimeter offset of an axis-aligned rectangle grows each
    # side by 2*distance (db_postprocess.py:151-157 semantics).
    box = np.array([[10, 10], [110, 10], [110, 40], [10, 40]], np.float64)
    d = (100 * 30) * 1.5 / (2 * (100 + 30))
    expanded = geometry.unclip(box, 1.5)
    rect = geometry.min_area_rect(expanded)
    assert np.allclose(sorted(rect[1]), sorted((100 + 2 * d, 30 + 2 * d)),
                       atol=0.1)


def test_unclip_rotated_quad():
    base = np.array([[0, 0], [80, 0], [80, 20], [0, 20]], np.float64)
    theta = 0.5
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    rot = base @ R.T + 50
    d = (80 * 20) * 1.5 / (2 * (80 + 20))
    expanded = geometry.unclip(rot, 1.5)
    rect = geometry.min_area_rect(expanded)
    assert np.allclose(sorted(rect[1]), sorted((80 + 2 * d, 20 + 2 * d)),
                       atol=0.2)


def test_order_points_clockwise():
    pts = np.array([[10, 10], [90, 12], [88, 40], [8, 38]], np.float32)
    for perm in ([0, 1, 2, 3], [2, 0, 3, 1], [3, 2, 1, 0]):
        out = geometry.order_points_clockwise(pts[perm])
        np.testing.assert_allclose(out, pts)


def test_fill_poly_mask_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(3)
    for _ in range(20):
        poly = rng.uniform(2, 38, (4, 2)).astype(np.int32)
        hull = geometry.convex_hull(poly).astype(np.int32)
        if len(hull) < 3:
            continue
        ref = np.zeros((40, 40), np.uint8)
        cv2.fillPoly(ref, hull.reshape(1, -1, 2), 1)
        mine = geometry.fill_poly_mask((40, 40), hull)
        # Fill conventions differ on boundary pixels only: the strict
        # interior of cv2's mask must be inside mine, and mine must stay
        # within cv2's mask dilated by one pixel.
        kernel = np.ones((3, 3), np.uint8)
        eroded = cv2.erode(ref, kernel)
        dilated = cv2.dilate(ref, kernel)
        assert np.all(mine[eroded == 1] == 1)
        assert np.all(dilated[mine == 1] == 1)


def test_polygon_area_perimeter():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    assert np.isclose(abs(geometry.polygon_area(sq)), 100)
    assert np.isclose(geometry.polygon_perimeter(sq), 40)


def test_dilate2x2_matches_cv2():
    import cv2
    rng = np.random.default_rng(3)
    for _ in range(10):
        m = (rng.random((25, 31)) > 0.8).astype(np.uint8)
        ref = cv2.dilate(m, np.ones((2, 2), np.uint8))
        assert np.array_equal(geometry.dilate2x2(m), ref)


def test_arc_length_matches_cv2():
    import cv2
    rng = np.random.default_rng(4)
    for closed in (True, False):
        pts = rng.integers(0, 200, (15, 2)).astype(np.int32)
        ref = cv2.arcLength(pts.reshape(-1, 1, 2), closed)
        assert abs(geometry.arc_length(pts, closed) - ref) < 1e-3 * ref


def test_approx_poly_dp_simplifies():
    # a noisy rectangle outline should collapse to ~4 corners, and every
    # dropped vertex must lie within epsilon of the simplified polygon
    t = np.linspace(0, 1, 25)[:-1]
    edges = []
    for (a, b) in [((0, 0), (100, 0)), ((100, 0), (100, 40)),
                   ((100, 40), (0, 40)), ((0, 40), (0, 0))]:
        seg = np.outer(1 - t, a) + np.outer(t, b)
        edges.append(seg)
    poly = np.vstack(edges)
    rng = np.random.default_rng(5)
    noisy = poly + rng.uniform(-0.5, 0.5, poly.shape)
    eps = 0.02 * geometry.arc_length(noisy, True)
    out = geometry.approx_poly_dp(noisy, eps, closed=True)
    assert 4 <= len(out) <= 8
