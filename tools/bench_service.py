"""Serving-path benchmark: the HTTP v1 /ocr contract under concurrent load.

BASELINE.md config 5 is the FastAPI-style service with concurrent batched
inference — bench.py measures the library; this measures the real socket
path: boot `python -m onnxocr_tpu.service` (own asyncio HTTP framework +
EngineManager with cross-request det/rec batching), then hammer POST /ocr
(v1 base64 JSON, app/routers/v1.py:48-115 contract) from N client threads
over the test corpus.

Prints ONE JSON line:
  {"metric": "service_images_per_sec", "value": N, "unit": "images/sec",
   "vs_baseline": N, "p50_ms": ..., "p95_ms": ..., ...}

Budget discipline mirrors bench.py: everything is bounded by
BENCH_BUDGET_S (default 300 s) and a watchdog emits whatever completed.

Usage:  python tools/bench_service.py            (needs the TPU)
        BENCH_BUDGET_S=120 SERVICE_CLIENTS=4 python tools/bench_service.py
"""
import base64
import glob
import json
import os
import statistics
import subprocess
import sys
import threading
import time
import urllib.request

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "300"))
CLIENTS = int(os.environ.get("SERVICE_CLIENTS", "8"))
PORT = int(os.environ.get("SERVICE_BENCH_PORT", "5117"))
BASELINE_IPS = 1.0 / 0.3  # reference CPU midpoint (BASELINE.md)

STATE = {"phase": "init"}
_EMITTED = threading.Event()

IMAGES_DIR = None
for cand in ("/root/reference/onnxocr/test_images",
             os.path.join(os.path.dirname(os.path.dirname(
                 os.path.abspath(__file__))), "onnxocr_tpu", "test_images")):
    if os.path.isdir(cand):
        IMAGES_DIR = cand
        break


def remaining():
    return BUDGET_S - (time.monotonic() - T0)


def note(msg):
    print("[svc-bench %5.1fs] %s" % (time.monotonic() - T0, msg),
          file=sys.stderr, flush=True)


def emit(from_watchdog=False):
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    lat = sorted(STATE.get("lat_ms", []))

    def pct(p):
        return round(lat[min(len(lat) - 1, int(p / 100 * len(lat)))], 1) \
            if lat else None

    value = STATE.get("ips", 0.0)
    out = {
        "metric": "service_images_per_sec",
        "value": round(value, 3),
        "unit": "images/sec",
        "vs_baseline": round(value / BASELINE_IPS, 2),
        "clients": CLIENTS,
        "images": STATE.get("images"),
        "requests": len(lat),
        "p50_ms": pct(50),
        "p95_ms": pct(95),
        "phase_reached": STATE.get("phase"),
        "budget_s": BUDGET_S,
    }
    if from_watchdog:
        out["watchdog"] = True
    print(json.dumps({k: v for k, v in out.items() if v is not None}),
          flush=True)


def watchdog():
    while remaining() > -3 and not _EMITTED.is_set():
        time.sleep(0.5)
    if not _EMITTED.is_set():
        note("WATCHDOG: emitting partial from phase %r" % STATE["phase"])
        emit(from_watchdog=True)
        os._exit(0)


def post_v1(body, timeout=120, retries=1):
    req = urllib.request.Request(
        "http://127.0.0.1:%d/ocr" % PORT, data=body,
        headers={"Content-Type": "application/json"})
    for attempt in range(retries + 1):
        try:
            r = urllib.request.urlopen(req, timeout=timeout)
            break
        except TimeoutError:
            # a cold request can sit behind a multi-minute XLA compile or
            # link squall; one crashed request must not kill the bench
            if attempt == retries:
                raise
    data = json.loads(r.read())
    if "error" in data:
        raise RuntimeError(data["error"])
    return data


def main():
    threading.Thread(target=watchdog, daemon=True).start()
    if IMAGES_DIR is None:
        STATE["phase"] = "no-images"
        emit()
        return
    paths = sorted(glob.glob(os.path.join(IMAGES_DIR, "*.jpg")) +
                   glob.glob(os.path.join(IMAGES_DIR, "*.png")))
    bodies = []
    for p in paths:
        with open(p, "rb") as f:
            bodies.append(json.dumps(
                {"image": base64.b64encode(f.read()).decode()}).encode())
    STATE["images"] = len(bodies)

    STATE["phase"] = "server-boot"
    env = dict(os.environ, PORT=str(PORT), WARMUP="true",
               MODEL_CONCURRENCY=str(CLIENTS), DET_BATCH="1", REC_BATCH="1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log = open("/tmp/svc_bench_server.log", "w")
    proc = subprocess.Popen([sys.executable, "-m", "onnxocr_tpu.service"],
                            cwd=repo, env=env, stdout=log,
                            stderr=subprocess.STDOUT)
    try:
        # boot window: the server's first device op + engine warmup can
        # cost minutes cold; leave at least 35% of budget for the timed
        # phase (with a warm persistent cache boot is ~60-90 s)
        while remaining() > BUDGET_S * 0.35:
            time.sleep(2)
            try:
                r = urllib.request.urlopen(
                    "http://127.0.0.1:%d/api/v2/readyz" % PORT, timeout=3)
                if r.status == 200:
                    break
            except Exception:
                continue
        else:
            note("server never became ready")
            emit()
            return
        note("server ready")

        # serial warmup: compile every per-image shape through the socket;
        # trim to the warmed prefix if the budget runs low
        STATE["phase"] = "warmup"
        warmed = []
        for i, b in enumerate(bodies):
            if remaining() < BUDGET_S * 0.45 and len(warmed) >= 4:
                note("warmup trim %d -> %d" % (len(bodies), len(warmed)))
                break
            try:
                post_v1(b, timeout=max(30, min(150, remaining() - 20)))
            except Exception as e:
                note("warmup skip image %d: %r" % (i, e))
                continue
            warmed.append(b)
        bodies[:] = warmed
        STATE["images"] = len(bodies)

        # one concurrent replay (concurrent-path shapes), untimed
        STATE["phase"] = "replay"
        import concurrent.futures
        if remaining() > 40:
            with concurrent.futures.ThreadPoolExecutor(CLIENTS) as pool:
                list(pool.map(post_v1, bodies))

        # timed rounds: all images once per round, CLIENTS-way concurrent
        STATE["phase"] = "timed"
        lat_ms = []
        STATE["lat_ms"] = lat_ms
        round_ips = []

        def one(body):
            t = time.perf_counter()
            post_v1(body)
            lat_ms.append((time.perf_counter() - t) * 1000)

        for r in range(5):
            if round_ips and remaining() < 1.5 * (len(bodies) /
                                                  max(round_ips[-1], 0.2)):
                break
            t0 = time.perf_counter()
            with concurrent.futures.ThreadPoolExecutor(CLIENTS) as pool:
                list(pool.map(one, bodies))
            dt = time.perf_counter() - t0
            round_ips.append(len(bodies) / dt)
            STATE["ips"] = statistics.median(round_ips)
            note("round %d: %.2f img/s" % (r, round_ips[-1]))
        STATE["phase"] = "done"
        emit()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
