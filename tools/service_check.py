"""Live service integration check: boots the real HTTP server (real model,
TPU), waits for readiness, exercises v1 base64 + v2 multipart + UI, and
verifies the recognized text. Run: python tools/service_check.py"""
import base64, json, os, subprocess, sys, time, urllib.request

env = dict(os.environ, PORT="5111", WARMUP="true", MODEL_CONCURRENCY="2")
proc = subprocess.Popen([sys.executable, "-m", "onnxocr_tpu.service"],
                        cwd="/root/repo", env=env,
                        stdout=open("/tmp/service_out.log", "w"),
                        stderr=subprocess.STDOUT)
base = "http://127.0.0.1:5111"
try:
    # wait for readiness (warmup compiles)
    for i in range(240):
        time.sleep(2)
        try:
            r = urllib.request.urlopen(base + "/api/v2/readyz", timeout=3)
            if r.status == 200:
                print("ready after", i * 2, "s", flush=True)
                break
        except Exception:
            continue
    else:
        print("NEVER READY", flush=True)
        sys.exit(1)

    img_path = "/root/repo/tests_page.png"
    # render a synthetic page so the trained weights read real text
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    from eval_e2e import render_page
    import cv2
    page, truths = render_page(100)
    cv2.imwrite(img_path, page)
    blob = open(img_path, "rb").read()

    # v1
    body = json.dumps({"image": base64.b64encode(blob).decode()}).encode()
    req = urllib.request.Request(base + "/ocr", data=body,
                                 headers={"Content-Type": "application/json"})
    r = urllib.request.urlopen(req, timeout=120)
    data = json.loads(r.read())
    print("v1 status", r.status, "results:", [x["text"] for x in data["results"]][:6], flush=True)

    # v2 multipart
    boundary = "XB0UND"
    part = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="p.png"\r\n'
            f"Content-Type: image/png\r\n\r\n").encode() + blob + \
        f"\r\n--{boundary}\r\nContent-Disposition: form-data; name=\"conf_threshold\"\r\n\r\n0.3\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        base + "/api/v2/ocr", data=part,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
    r = urllib.request.urlopen(req, timeout=120)
    data = json.loads(r.read())
    print("v2 status", r.status, "results:", [x["text"] for x in data["results"]][:6], flush=True)
    print("truths:", [t for t, _ in truths], flush=True)
    print("UI:", urllib.request.urlopen(base + "/", timeout=10).status, flush=True)
    print("SERVICE CHECK OK", flush=True)
finally:
    proc.terminate()
