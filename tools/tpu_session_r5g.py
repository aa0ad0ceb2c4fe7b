"""Round-5 session G: warp_crops micro-A/B on the chip.

Isolates the staged separable path: same (32, 48, 640) crop workload
from a (1024, 1024, 3) source under four matrix populations:
  tilted    — 1-2% tilt (the doc_a reality pre-snap)
  upright   — exactly axis-aligned, staged ON
  upright_g — exactly axis-aligned, staged OFF (pure gather)
  degen     — all-degenerate matrices (gather floor)

    python -u tools/tpu_session_r5g.py 2>&1 | tee scratch/tpu_r5g.log
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

T0 = time.time()


def note(msg):
    print("[r5g %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def timeit(name, fn, args, n=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000.0
    note("%-28s %8.2f ms" % (name, ms))
    return ms


def main():
    import jax
    import jax.numpy as jnp
    import onnxocr_tpu  # noqa: F401
    from onnxocr_tpu.ops import warp as w
    from onnxocr_tpu.ops import warp_dev

    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1024, 1024, 3)).astype(
        np.uint8))
    K = 32

    def quads(tilt):
        qs = []
        for i in range(K):
            x0 = float(rng.integers(0, 300))
            y0 = float(30 * i % 900)
            wdt = float(rng.integers(300, 640))
            hgt = float(rng.integers(24, 48))
            dy = tilt * wdt
            qs.append([[x0, y0 + dy], [x0 + wdt, y0], [x0 + wdt, y0 + hgt],
                       [x0, y0 + hgt + dy]])
        return jnp.asarray(np.array(qs, np.float32))

    valid = jnp.ones((K,), bool)
    for name, tilt, staged in (("tilted", 0.015, True),
                               ("upright", 0.0, True),
                               ("upright_gather", 0.0, False)):
        mats, _, vw, _ = warp_dev.crop_matrices(quads(tilt), valid, 48, 640)
        vw = jnp.minimum(vw, 640)
        fn = lambda im, m, v, _s=staged: w.warp_crops(
            im, m, v, 48, 640, interp="bilinear", staged=_s)
        timeit("%s(staged=%s)" % (name, staged), fn, (img, mats, vw))
    # degenerate floor
    degen = jnp.zeros((K, 3, 3), jnp.float32).at[:, 2, 2].set(1.0)
    vw0 = jnp.full((K,), 640, jnp.int32)
    timeit("degenerate(gather)", lambda im, m, v: w.warp_crops(
        im, m, v, 48, 640, interp="bilinear", staged=False),
        (img, degen, vw0))
    note("session G done")


if __name__ == "__main__":
    main()
