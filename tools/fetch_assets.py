"""Stage model assets into onnxocr_tpu/assets/.

The repo does not vendor upstream model files. This tool copies whatever is
available from a reference checkout (char dicts, cls.onnx — det/rec blobs are
missing from the bundled snapshot, see /root/reference/.MISSING_LARGE_BLOBS)
and leaves clear placeholders for the rest. Weights for the native models can
be produced with tools/train_synthetic.py.

Usage: python tools/fetch_assets.py [--source /root/reference/onnxocr/models]
"""
import argparse
import os
import shutil

HERE = os.path.dirname(os.path.abspath(__file__))
ASSETS = os.path.join(HERE, "..", "onnxocr_tpu", "assets")

WANTED = [
    "ppocrv5/ppocrv5_dict.txt",
    "ppocrv5/cls/cls.onnx",
    "ppocrv5/det/det.onnx",
    "ppocrv5/rec/rec.onnx",
    "ppocrv4/cls/cls.onnx",
    "ppocrv4/det/det.onnx",
    "ppocrv4/rec/rec.onnx",
    "ch_ppocr_server_v2.0/cls/cls.onnx",
    "ch_ppocr_server_v2.0/det/det.onnx",
    "ch_ppocr_server_v2.0/ppocr_keys_v1.txt",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="/root/reference/onnxocr/models")
    args = ap.parse_args()
    copied, missing = [], []
    for rel in WANTED:
        src = os.path.join(args.source, rel)
        dst = os.path.join(ASSETS, rel)
        if os.path.exists(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
            copied.append(rel)
        else:
            missing.append(rel)
    print("copied:", *copied, sep="\n  ")
    if missing:
        print("missing (stage manually or train native weights):",
              *missing, sep="\n  ")


if __name__ == "__main__":
    main()
