"""Build the C++ host-runtime library (libocrhost.so) with g++.

Usage: python tools/build_native.py [--debug]
"""
import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
NATIVE = os.path.join(HERE, "..", "onnxocr_tpu", "runtime", "native")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args()
    srcs = [os.path.join(NATIVE, f) for f in sorted(os.listdir(NATIVE))
            if f.endswith(".cc")]
    out = os.path.join(NATIVE, "libocrhost.so")
    flags = ["-O0", "-g"] if args.debug else ["-O2"]
    cmd = ["g++", "-std=c++17", "-shared", "-fPIC", *flags,
           "-o", out, *srcs, "-lm"]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print("built", out)
    # smoke check: loadable + symbols present
    import ctypes
    lib = ctypes.CDLL(out)
    for sym in ("ocr_find_contours", "ocr_min_area_rect",
                "ocr_offset_polygon"):
        getattr(lib, sym)
    print("symbols ok")


if __name__ == "__main__":
    main()
