"""Device-side crop-matrix construction from detector quads.

The staged pipeline builds perspective-crop homographies on host
(ops/warp.build_crop_matrix) because boxes normally live there after DB
postprocess. In the one-call pipeline (pipeline/onecall.py) the quads are
born ON DEVICE (ops/db_device.py), and shipping them to host just to build
3x3 matrices would cost the round trip the design is trying to kill — so
this module re-states the whole host chain in jax, vmapped over K boxes:

    order clockwise → clip → side filter (reference predict_det.py:50-81)
    → crop geometry + rect→quad homography (reference utils.py:12-53 with
      roles swapped, ops/warp.perspective_transform)
    → rot90-if-tall quirk, 180° variant, resize affine
      (ops/warp.build_crop_matrix contract)

Numerics: float32 on device vs float64 on host — matrices agree to ~1e-5
relative, which moves sampled pixels by far less than the bicubic kernel's
sensitivity; parity is tested in tests/test_onecall.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def order_points_clockwise(quads: jax.Array) -> jax.Array:
    """(K, 4, 2) → [tl, tr, br, bl] per quad (reference
    predict_det.py:50-59: two smallest-x points become the left pair, each
    pair sorted by y; jnp.argsort is stable so x-ties resolve by index)."""

    def one(q):
        order = jnp.argsort(q[:, 0], stable=True)
        left = q[order[:2]]
        right = q[order[2:]]
        left = jnp.where((left[0, 1] <= left[1, 1])[None, None],
                         left, left[::-1])
        right = jnp.where((right[0, 1] <= right[1, 1])[None, None],
                          right, right[::-1])
        return jnp.stack([left[0], right[0], right[1], left[1]])

    return jax.vmap(one)(quads)


def clip_filter_boxes(quads: jax.Array, src_h, src_w
                      ) -> Tuple[jax.Array, jax.Array]:
    """Reference filter_tag_det_res (predict_det.py:67-81): clip to the
    image, drop boxes whose int side lengths are <= 3 px.

    quads: (K, 4, 2) clockwise-ordered, source coords.
    Returns (clipped quads, keep mask)."""
    x = jnp.clip(quads[..., 0], 0, src_w.astype(jnp.float32) - 1.0)
    y = jnp.clip(quads[..., 1], 0, src_h.astype(jnp.float32) - 1.0)
    q = jnp.stack([x, y], axis=-1)
    rect_w = jnp.floor(jnp.linalg.norm(q[:, 0] - q[:, 1], axis=-1))
    rect_h = jnp.floor(jnp.linalg.norm(q[:, 0] - q[:, 3], axis=-1))
    keep = (rect_w > 3) & (rect_h > 3)
    return q, keep


def _solve_homography_rect(cw, ch, pts):
    """H mapping the axis-aligned rect (0,0)-(cw,ch) corners onto pts
    (4, 2) — the device twin of ops/warp.perspective_transform with
    src = [[0,0],[cw,0],[cw,ch],[0,ch]]."""
    zeros = jnp.zeros(())
    ones = jnp.ones(())
    src = jnp.stack([
        jnp.stack([zeros, zeros]), jnp.stack([cw, zeros]),
        jnp.stack([cw, ch]), jnp.stack([zeros, ch])])
    rows = []
    rhs = []
    for i in range(4):
        x, y = src[i, 0], src[i, 1]
        u, v = pts[i, 0], pts[i, 1]
        rows.append(jnp.stack([x, y, ones, zeros, zeros, zeros,
                               -u * x, -u * y]))
        rows.append(jnp.stack([zeros, zeros, zeros, x, y, ones,
                               -v * x, -v * y]))
        rhs.append(u)
        rhs.append(v)
    A = jnp.stack(rows)
    b = jnp.stack(rhs)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones(1)]).reshape(3, 3)


def _affine(a, b, c, d, tx, ty):
    one = jnp.ones(())
    zero = jnp.zeros(())
    return jnp.stack([
        jnp.stack([a * one, b * one, tx * one]),
        jnp.stack([c * one, d * one, ty * one]),
        jnp.stack([zero, zero, one])])


def crop_matrices(quads: jax.Array, valid: jax.Array, out_h: int,
                  bucket_w: int
                  ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Device twin of ops/warp.build_crop_matrix, vmapped over K quads.

    quads: (K, 4, 2) clockwise source-coord boxes; valid masks rows whose
    homography should be solved (invalid rows get a safe identity target
    so jnp.linalg.solve never sees a singular system).

    Returns (mats (K,3,3), mats_rot180 (K,3,3), valid_w (K,) int32 —
    resized width capped at bucket_w — and desired_w (K,) int32, the
    uncapped ceil(out_h*ratio) the host uses to detect crops that need a
    wider bucket)."""

    def one(q, ok):
        cw = jnp.floor(jnp.maximum(jnp.linalg.norm(q[0] - q[1]),
                                   jnp.linalg.norm(q[2] - q[3])))
        ch = jnp.floor(jnp.maximum(jnp.linalg.norm(q[0] - q[3]),
                                   jnp.linalg.norm(q[1] - q[2])))
        cw = jnp.maximum(cw, 1.0)
        ch = jnp.maximum(ch, 1.0)
        safe = jnp.stack([
            jnp.stack([jnp.zeros(()), jnp.zeros(())]),
            jnp.stack([cw, jnp.zeros(())]),
            jnp.stack([cw, ch]),
            jnp.stack([jnp.zeros(()), ch])])
        pts = jnp.where(ok, q, safe)
        M_inv = _solve_homography_rect(cw, ch, pts)

        tall = ch / cw >= 1.5
        rot90 = _affine(0.0, -1.0, 1.0, 0.0, cw - 1.0, 0.0)
        M_inv = jnp.where(tall, M_inv @ rot90, M_inv)
        cw2 = jnp.where(tall, ch, cw)
        ch2 = jnp.where(tall, cw, ch)

        rot180 = _affine(-1.0, 0.0, 0.0, -1.0, cw2 - 1.0, ch2 - 1.0)
        M_rot = M_inv @ rot180

        ratio = cw2 / ch2
        desired = jnp.ceil(out_h * ratio)
        resized_w = jnp.clip(desired, 1.0, float(bucket_w))
        sx = cw2 / resized_w
        sy = ch2 / float(out_h)
        rs = _affine(sx, 0.0, 0.0, sy, 0.5 * sx - 0.5, 0.5 * sy - 0.5)
        return (M_inv @ rs).astype(jnp.float32), \
            (M_rot @ rs).astype(jnp.float32), \
            resized_w.astype(jnp.int32), desired.astype(jnp.int32)

    return jax.vmap(one)(quads, valid)
