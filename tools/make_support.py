"""Generate `<dict>.trained_support.json` sidecars: the dictionary indices
the synthetic trainer can render with the bundled fonts (plus blank).

The native recognizers are trained on exactly this label space
(train/synth.TextRenderer coverage), so decode masks everything else
(pipeline/backends.trained_support / apply_support_bias,
config tpu_decode_support). Committing the sidecar skips the font-coverage
scan at model init.

Usage: python tools/make_support.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onnxocr_tpu import config as cfg
from onnxocr_tpu.train import synth

DICTS = ("ppocrv5/ppocrv5_dict.txt",
         "ch_ppocr_server_v2.0/ppocr_keys_v1.txt")


def main():
    for rel in DICTS:
        path = cfg.find_asset(rel)
        if not os.path.exists(path):
            print(f"skip (missing): {rel}")
            continue
        c2i = synth.charset_from_dict(path, charset=None)
        r = synth.TextRenderer(char_to_idx=c2i)
        indices = sorted({0} | {c2i[c] for c in r.charset})
        chars = "".join(sorted(r.charset))
        # always write into THIS repo's assets tree (the dict itself may
        # resolve to the read-only reference snapshot)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "onnxocr_tpu", "assets",
                           rel + ".trained_support.json")
        out = os.path.abspath(out)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            json.dump({"dict": rel, "n": len(indices),
                       "indices": indices, "chars": chars},
                      f, ensure_ascii=False)
        print(f"{out}: {len(indices)} supported indices "
              f"({len(r.charset)} renderable chars)")


if __name__ == "__main__":
    main()
