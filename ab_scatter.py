"""A/B device_boxes' per-component reductions:
  moments:  scatter-add (current)  vs  one-hot matmul on the MXU
  minmax:   scatter-min (current)  vs  broadcast masked-min reduce
"""
import time, threading
import numpy as np
import jax, jax.numpy as jnp

import onnxocr_tpu  # noqa
from onnxocr_tpu.ops import db_device

def absorb():
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
threading.Thread(target=absorb, daemon=True).start()

H = W = 1024
K = 256  # match device_boxes' production max_k
rng = np.random.default_rng(0)
prob_np = np.zeros((H, W), np.float32)
for _ in range(60):
    y = rng.integers(0, H - 20); x = rng.integers(0, W - 220)
    w = int(rng.integers(40, 200))
    prob_np[y:y + 12, x:x + w] = 0.9
prob = jnp.asarray(prob_np)
ys, xs = np.mgrid[0:H, 0:W]
ys_j, xs_j = jnp.asarray(ys), jnp.asarray(xs)
mask = jax.jit(lambda p: (p > 0.3) & (ys_j < 1000) & (xs_j < 1000))(prob)
seed = jnp.where(mask, (ys_j * W + xs_j + 1).astype(jnp.int32), 0)
lab = jax.jit(db_device._flood_scans)(seed, mask)
lab = jax.jit(db_device._dilate_converge)(lab, mask)

def slots(lab, seed, mask):
    reps = (mask & (lab == seed)).reshape(-1)
    seed_flat = seed.reshape(-1)
    maxint = jnp.int32(2147483647)
    rank = jnp.cumsum(reps.astype(jnp.int32)) - reps.astype(jnp.int32)
    tgt = jnp.where(reps & (rank < K), rank, K)
    ids = jnp.full((K + 1,), maxint, jnp.int32)
    ids = ids.at[tgt].min(jnp.where(reps, seed_flat, maxint))[:K]
    flat_lab = lab.reshape(-1)
    lt = jnp.sum((ids[None, :] < flat_lab[:, None]).astype(jnp.int32), axis=1)
    le = jnp.sum((ids[None, :] <= flat_lab[:, None]).astype(jnp.int32), axis=1)
    hit = (le > lt) & (flat_lab > 0)
    return jnp.where(hit, lt, K), hit

slot, hit = jax.jit(slots)(lab, seed, mask)
jax.block_until_ready(slot)

fx = xs_j.reshape(-1).astype(jnp.float32)
fy = ys_j.reshape(-1).astype(jnp.float32)
fp = prob.reshape(-1)

def timeit(name, fn, *args, n=7):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    print("%-30s %7.1f ms (min %.1f)" % (name, sorted(ts)[n // 2], min(ts)),
          flush=True)
    return out

def mom_scatter(slot, hit, fp):
    stats = jnp.stack([jnp.ones_like(fx), fx, fy, fx * fx, fy * fy,
                       fx * fy, fp], axis=-1)
    acc = jnp.zeros((K + 1, 7), jnp.float32)
    return acc.at[slot].add(jnp.where(hit[:, None], stats, 0.0))[:K]

def mom_matmul(slot, hit, fp):
    stats = jnp.stack([jnp.ones_like(fx), fx, fy, fx * fx, fy * fy,
                       fx * fy, fp], axis=-1)
    stats = jnp.where(hit[:, None], stats, 0.0)
    onehot = (slot[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
    return jnp.einsum("nk,nc->kc", onehot, stats,
                      preferred_element_type=jnp.float32)

a = timeit("moments scatter (current)", jax.jit(mom_scatter), slot, hit, fp)
b = timeit("moments one-hot matmul", jax.jit(mom_matmul), slot, hit, fp)
print("moments agree:", bool(jnp.allclose(a, b, atol=1e-2)), flush=True)

ux = jnp.ones((K,), jnp.float32) * 0.9
uy = jnp.ones((K,), jnp.float32) * 0.1

def mm_scatter(slot, hit):
    cs = jnp.clip(slot, 0, K - 1)
    pu = fx * ux[cs] + fy * uy[cs]
    pv = fy * ux[cs] - fx * uy[cs]
    big = jnp.float32(3.4e38)
    cols = jnp.stack([pu, pv, -pu, -pv], -1)
    cols = jnp.where(hit[:, None], cols, big)
    ext = jnp.full((K + 1, 4), big, jnp.float32)
    return ext.at[slot].min(cols)[:K]

def mm_bcast(slot, hit):
    cs = jnp.clip(slot, 0, K - 1)
    pu = fx * ux[cs] + fy * uy[cs]
    pv = fy * ux[cs] - fx * uy[cs]
    big = jnp.float32(3.4e38)
    cols = jnp.stack([pu, pv, -pu, -pv], -1)          # (n, 4)
    cols = jnp.where(hit[:, None], cols, big)
    m = (slot[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :])  # (n,K)
    return jnp.min(jnp.where(m[:, :, None], cols[:, None, :], big), axis=0)

def mom_matmul_scan(slot, hit, fp, chunk=16384):
    stats = jnp.stack([jnp.ones_like(fx), fx, fy, fx * fx, fy * fy,
                       fx * fy, fp], axis=-1)
    stats = jnp.where(hit[:, None], stats, 0.0)
    n = slot.shape[0]
    nch = n // chunk
    ks = jnp.arange(K, dtype=jnp.int32)

    def body(acc, inp):
        sl, st = inp
        oh = (sl[:, None] == ks[None, :]).astype(jnp.float32)
        return acc + jnp.einsum("nk,nc->kc", oh, st,
                                preferred_element_type=jnp.float32), None
    acc0 = jnp.zeros((K, 7), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (slot.reshape(nch, chunk),
                                       stats.reshape(nch, chunk, 7)))
    return out

def mom_sum_scan(slot, hit, fp, chunk=8192):
    # mask-select + VPU f32 sum (no MXU): exact, unlike the bf16 einsum
    stats = jnp.stack([jnp.ones_like(fx), fx, fy, fx * fx, fy * fy,
                       fx * fy, fp], axis=-1)
    stats = jnp.where(hit[:, None], stats, 0.0)
    n = slot.shape[0]
    nch = n // chunk
    ks = jnp.arange(K, dtype=jnp.int32)

    def body(acc, inp):
        sl, st = inp
        m = sl[:, None] == ks[None, :]                 # (chunk, K)
        part = jnp.sum(jnp.where(m[:, :, None], st[:, None, :], 0.0),
                       axis=0)                          # (K, 7)
        return acc + part, None
    acc0 = jnp.zeros((K, 7), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (slot.reshape(nch, chunk),
                                       stats.reshape(nch, chunk, 7)))
    return out

def mm_min_scan(slot, hit, chunk=8192):
    cs = jnp.clip(slot, 0, K - 1)
    pu = fx * ux[cs] + fy * uy[cs]
    pv = fy * ux[cs] - fx * uy[cs]
    big = jnp.float32(3.4e38)
    cols = jnp.stack([pu, pv, -pu, -pv], -1)
    cols = jnp.where(hit[:, None], cols, big)
    n = slot.shape[0]
    nch = n // chunk
    ks = jnp.arange(K, dtype=jnp.int32)

    def body(acc, inp):
        sl, cl = inp
        m = sl[:, None] == ks[None, :]                 # (chunk, K)
        part = jnp.min(jnp.where(m[:, :, None], cl[:, None, :], big),
                       axis=0)                          # (K, 4)
        return jnp.minimum(acc, part), None
    acc0 = jnp.full((K, 4), big, jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (slot.reshape(nch, chunk),
                                       cols.reshape(nch, chunk, 4)))
    return out

c = timeit("minmax scatter (current)", jax.jit(mm_scatter), slot, hit)
e = timeit("moments matmul scan", jax.jit(mom_matmul_scan), slot, hit, fp)
print("moments scan agree:", bool(jnp.allclose(a, e, atol=1e-2)), flush=True)
g = timeit("moments sum scan", jax.jit(mom_sum_scan), slot, hit, fp)
print("moments sum-scan agree:", bool(jnp.allclose(a, g, rtol=1e-5)),
      flush=True)
f = timeit("minmax min scan", jax.jit(mm_min_scan), slot, hit)
print("minmax scan agree:", bool(jnp.allclose(c, f)), flush=True)
