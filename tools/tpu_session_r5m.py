"""Round-5 session M: gate the part-C rec polish candidate."""
import os
import sys
import time
sys.path.insert(0, ".")
sys.path.insert(0, "tools")
T0 = time.time()


def main():
    import numpy as np
    import jax
    import onnxocr_tpu  # noqa: F401
    import tpu_session_r5i as r5i
    print("[r5m] devices: %s" % jax.devices(), flush=True)
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    print("[r5m] first download done (%.1fs)" % (time.time() - t),
          flush=True)
    ck = "scratch/ckpt_rec_polish_r5.npz"
    if os.path.exists(ck):
        r5i.run_eval("scratch/evalgate_r5m_rec_polish.json",
                     ["--rec-dir", r5i.gate_dir("rec_polish", ck, "rec")])
    print("[r5m] done (%.0fs)" % (time.time() - T0), flush=True)


if __name__ == "__main__":
    main()
