"""Round-5 TPU session J: shear warp v2 (LS corner-affine + probes).

One process: (1) doc_a warp microbench with sub-pass attribution
(tools/ab_warp_shear), (2) off-vs-shear corpus sweep, (3) held-out eval
gate for tpu_warp_stage=shear against the NEW head (grown rec adopted:
0.883/0.795, real 0.738/0.685).

    python -u tools/tpu_session_r5j.py 2>&1 | tee scratch/tpu_r5j.log
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

T0 = time.time()


def note(msg):
    print("[r5j %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def main():
    os.makedirs("scratch", exist_ok=True)
    import ab_warp_shear
    import tpu_session_r5i as r5i

    # 1. microbench (absorbs spin-up + first download)
    ab_warp_shear.main()

    # 2. corpus sweep
    from onnxocr_tpu import ONNXPaddleOcr
    pages = [os.path.join("onnxocr_tpu/test_images", n) for n in
             ("doc_a.jpg", "doc_b.jpg", "banner.jpg", "big_doc.jpg",
              "dense.jpg", "receipt.jpg", "photo_hard.jpg", "card.jpg")]
    base_kw = dict(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                   tpu_det_microbatch=False, tpu_rec_microbatch=False,
                   tpu_pipeline="onecall")
    m_off = ONNXPaddleOcr(**base_kw)
    off = r5i.sweep(m_off, "off  ", pages)
    m_sh = ONNXPaddleOcr(tpu_warp_stage="shear", **base_kw)
    sh = r5i.sweep(m_sh, "shear", pages)
    with open("scratch/r5j_shear_ab.json", "w") as f:
        json.dump({"off": off, "shear": sh}, f)
    del m_off, m_sh

    # 3. eval gate vs the new head
    r5i.run_eval("scratch/evalgate_r5j_shear.json",
                 ["--set", "tpu_warp_stage=shear"])
    note("session J done")


if __name__ == "__main__":
    main()
