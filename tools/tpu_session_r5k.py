"""Round-5 TPU session K: shear warp v3 (slow_k compaction) decision.

  1. doc_a warp microbench (ab_warp_shear — now with slow_k=16 live)
  2. 3-way corpus sweep: off / shear tol=0.35 / shear tol=2.5 (de-bow)
  3. eval gate for shear tol=2.5 (tol=0.35 already gated head-equal-or-
     better in session J: evalgate_r5j_shear 0.885/0.799 real 0.738/0.692)

    python -u tools/tpu_session_r5k.py 2>&1 | tee scratch/tpu_r5k.log
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

T0 = time.time()


def note(msg):
    print("[r5k %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def main():
    os.makedirs("scratch", exist_ok=True)
    import ab_warp_shear
    import tpu_session_r5i as r5i

    ab_warp_shear.main()

    from onnxocr_tpu import ONNXPaddleOcr
    pages = [os.path.join("onnxocr_tpu/test_images", n) for n in
             ("doc_a.jpg", "doc_b.jpg", "banner.jpg", "big_doc.jpg",
              "dense.jpg", "receipt.jpg", "photo_hard.jpg", "card.jpg")]
    base_kw = dict(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                   tpu_det_microbatch=False, tpu_rec_microbatch=False,
                   tpu_pipeline="onecall")
    res = {}
    m = ONNXPaddleOcr(**base_kw)
    res["off"] = r5i.sweep(m, "off    ", pages)
    del m
    m = ONNXPaddleOcr(tpu_warp_stage="shear", **base_kw)
    res["shear035"] = r5i.sweep(m, "sh.35  ", pages)
    del m
    m = ONNXPaddleOcr(tpu_warp_stage="shear", tpu_warp_stage_tol=2.5,
                      **base_kw)
    res["shear250"] = r5i.sweep(m, "sh2.5  ", pages)
    del m
    with open("scratch/r5k_shear_ab.json", "w") as f:
        json.dump(res, f)

    r5i.run_eval("scratch/evalgate_r5k_shear_tol25.json",
                 ["--set", "tpu_warp_stage=shear",
                  "--set", "tpu_warp_stage_tol=2.5"])
    note("session K done")


if __name__ == "__main__":
    main()
