"""Round-5 session N: det-resolution knob A/B (no training).

Miss analysis (evalgate_r5j per_image): the lab-table page loses 14/36
lines on tiny cells. det_limit_side_len=1280 (vs the reference 960)
is the one training-free lever for small text — gate it. Note: 1280
canvas costs ~1.7x det/extraction device time, so a win here informs a
CALIBRATION decision, not an automatic default flip."""
import sys
import time
sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    import numpy as np
    import jax
    import onnxocr_tpu  # noqa: F401
    import tpu_session_r5i as r5i
    print("[r5n] devices: %s" % jax.devices(), flush=True)
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    print("[r5n] first download done (%.1fs)" % (time.time() - t),
          flush=True)
    r5i.run_eval("scratch/evalgate_r5n_det1280.json",
                 ["--set", "det_limit_side_len=1280"])
    print("[r5n] done", flush=True)


if __name__ == "__main__":
    main()
