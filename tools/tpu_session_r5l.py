"""Round-5 TPU session L: server-det distill gate + final warp sweep.

  1. final off-vs-shear corpus sweep (n_slow==0 skip tier live) — the
     adoption-record numbers for PROGRESS/README
  2. server-family gate: the completed JOB-3 distilled ResNet18 vs the
     mbv3 fallback head (session-I head: 0.526/0.513 on this harness)

    python -u tools/tpu_session_r5l.py 2>&1 | tee scratch/tpu_r5l.log
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

T0 = time.time()
A = "onnxocr_tpu/assets"


def note(msg):
    print("[r5l %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def main():
    os.makedirs("scratch", exist_ok=True)
    import numpy as np
    import jax
    import onnxocr_tpu  # noqa: F401
    import tpu_session_r5i as r5i
    from onnxocr_tpu import ONNXPaddleOcr

    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    pages = [os.path.join("onnxocr_tpu/test_images", n) for n in
             ("doc_a.jpg", "doc_b.jpg", "banner.jpg", "big_doc.jpg",
              "dense.jpg", "receipt.jpg", "photo_hard.jpg", "card.jpg")]
    base_kw = dict(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                   tpu_det_microbatch=False, tpu_rec_microbatch=False,
                   tpu_pipeline="onecall")
    res = {}
    m = ONNXPaddleOcr(tpu_warp_stage="off", **base_kw)
    res["off"] = r5i.sweep(m, "off  ", pages)
    del m
    m = ONNXPaddleOcr(**base_kw)   # HEAD defaults = shear + skip tier
    res["shear"] = r5i.sweep(m, "shear", pages)
    del m
    with open("scratch/r5l_shear_final.json", "w") as f:
        json.dump(res, f)

    srv_ck = "scratch/ckpt_det_server_r5.npz"
    if os.path.exists(srv_ck):
        from onnxocr_tpu.service.engine import MODEL_REGISTRY
        from onnxocr_tpu import config as cfg_mod
        reg = MODEL_REGISTRY.get("ch_ppocr_server_v2.0", {})
        extra = []
        for key, rel in reg.items():
            if key == "det_model_dir":
                continue
            extra += ["--set", "%s=%s" % (key, cfg_mod.find_asset(rel))]
        run = r5i.run_eval
        run("scratch/evalgate_r5l_server_cand.json",
            ["--det-dir",
             r5i.gate_dir("server_det2", srv_ck, "det",
                          copy_cal_from=f"{A}/ppocrv5/det/calibration.json")]
            + extra)
    note("session L done")


if __name__ == "__main__":
    main()
