"""Round-5 TPU session D: dissect the slow (1024,1024,3) src bucket.

Corpus sweep (session C) showed every page in the (1024,1024,3) src
bucket costs ~145-155 ms while same-window pages in other buckets cost
34-59 ms — bucket-keyed, not content- or valid-size-keyed. Profile the
full stage table on one slow page and one fast page, then run bench.py
in-process? No — bench is its own process; here:

  1. profile_onecall on doc_a.jpg  (slow bucket)
  2. profile_onecall on big_doc.jpg (fast bucket, contrast)

    python tools/tpu_session_r5d.py 2>&1 | tee scratch/tpu_r5d.log
"""
import importlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

T0 = time.time()


def note(msg):
    print("[r5d %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def main():
    import jax
    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    prof = importlib.import_module("profile_onecall")
    for img in ("onnxocr_tpu/test_images/doc_a.jpg",
                "onnxocr_tpu/test_images/big_doc.jpg"):
        note("=== profile %s ===" % img)
        os.environ["ONNXOCR_PROFILE_IMAGE"] = img
        try:
            prof.main()
        except Exception as e:
            note("profile FAILED: %r" % e)
    note("session D done")


if __name__ == "__main__":
    main()
