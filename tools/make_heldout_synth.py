"""Generate an INDEPENDENT held-out eval set (VERDICT r3 #4).

The 122-line hand-transcribed real-image set (tools/eval_heldout.py) is
the truth anchor but is small enough that checkpoint adoption gates risk
overfitting it. This tool grows the gate to 30+ pages / 400+ lines with
pages whose generation path shares NOTHING with training:

  * fonts: STIXGeneral (4 styles) + Computer Modern cmr10 — deliberately
    EXCLUDED from the training renderer's pool (onnxocr_tpu/train/synth.py
    FONTS note);
  * rasterizer: matplotlib Agg text layout, not the PIL ImageDraw path the
    trainer uses;
  * degradations: numpy/PIL transforms written here, not train-time aug.

Deterministic (fixed seed): re-running reproduces the committed pages.

Usage: python tools/make_heldout_synth.py [--outdir onnxocr_tpu/test_images_heldout]
"""
import argparse
import json
import os
import string
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MPL_TTF = ("/opt/venv/lib/python3.12/site-packages/matplotlib/"
           "mpl-data/fonts/ttf")
HELD_OUT_FONTS = [
    MPL_TTF + "/STIXGeneral.ttf",
    MPL_TTF + "/STIXGeneralBol.ttf",
    MPL_TTF + "/STIXGeneralItalic.ttf",
    MPL_TTF + "/STIXGeneralBolIta.ttf",
    MPL_TTF + "/cmr10.ttf",
]

WORDS = ("report total amount invoice date name address payment due tax "
         "order number item quantity price unit description balance page "
         "account summary client vendor terms net gross shipping contact "
         "reference signature approved department project status active "
         "results value range units test sample method analysis final").split()


def _rand_line(rng):
    kind = rng.integers(0, 5)
    if kind == 0:     # sentence-ish
        n = int(rng.integers(2, 6))
        ws = [WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(n)]
        if rng.random() < 0.4:
            ws[0] = ws[0].capitalize()
        return " ".join(ws)
    if kind == 1:     # number / amount
        v = rng.random() * 10 ** int(rng.integers(1, 7))
        return f"{v:,.2f}" if rng.random() < 0.6 else f"{int(v):,}"
    if kind == 2:     # code
        n = int(rng.integers(5, 11))
        alpha = string.ascii_uppercase + string.digits
        s = "".join(alpha[int(rng.integers(0, len(alpha)))]
                    for _ in range(n))
        if rng.random() < 0.4:
            s = s[:3] + "-" + s[3:]
        return s
    if kind == 3:     # date / time / percent
        r = rng.random()
        if r < 0.33:
            return "%04d-%02d-%02d" % (rng.integers(1990, 2030),
                                       rng.integers(1, 13),
                                       rng.integers(1, 29))
        if r < 0.66:
            return "%02d:%02d:%02d" % (rng.integers(0, 24),
                                       rng.integers(0, 60),
                                       rng.integers(0, 60))
        return "%.2f%%" % (rng.random() * 100)
    # labelled field
    w = WORDS[int(rng.integers(0, len(WORDS)))].upper()
    return f"{w}: {int(rng.integers(1, 99999))}"


def _render_page(rng, style, size=(900, 680)):
    """Render one page with matplotlib text; returns (RGB uint8, lines)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import font_manager

    W, H = size
    dpi = 100
    fig = plt.figure(figsize=(W / dpi, H / dpi), dpi=dpi)
    bg = 1.0 if style != "lowcontrast" else 0.72
    fig.patch.set_facecolor((bg, bg, bg))
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_axis_off()
    ax.set_xlim(0, W)
    ax.set_ylim(H, 0)

    fonts = [font_manager.FontProperties(fname=f) for f in HELD_OUT_FONTS]
    lines = []
    ink = 0.05 if style != "lowcontrast" else 0.38

    if style == "table":
        rows = int(rng.integers(8, 12))
        cols = 3
        x_edges = np.linspace(60, W - 60, cols + 1)
        y0, row_h = 70, (H - 140) / rows
        for r in range(rows + 1):
            ax.plot([60, W - 60], [y0 + r * row_h] * 2, color=str(ink),
                    lw=0.8)
        for xe in x_edges:
            ax.plot([xe, xe], [y0, y0 + rows * row_h], color=str(ink),
                    lw=0.8)
        for r in range(rows):
            for c in range(cols):
                if rng.random() < 0.15:
                    continue
                t = _rand_line(rng)
                fp = fonts[int(rng.integers(0, len(fonts)))]
                px = int(rng.integers(13, 20))
                ax.text(x_edges[c] + 8, y0 + (r + 0.62) * row_h, t,
                        fontproperties=fp, fontsize=px * 72 / dpi,
                        color=str(ink))
                lines.append(t)
    else:
        n = int(rng.integers(10, 16)) if style != "dense" else \
            int(rng.integers(18, 24))
        y = 50.0
        while len(lines) < n and y < H - 40:
            t = _rand_line(rng)
            fp = fonts[int(rng.integers(0, len(fonts)))]
            px = int(rng.integers(14, 34)) if style != "dense" else \
                int(rng.integers(11, 16))
            x = float(rng.integers(40, max(41, W // 3)))
            ax.text(x, y, t, fontproperties=fp, fontsize=px * 72 / dpi,
                    color=str(ink), va="top")
            lines.append(t)
            y += px * 1.8 + float(rng.integers(2, 14))
        # headline
        if style == "doc" and rng.random() < 0.7:
            t = _rand_line(rng).upper()
            ax.text(W * 0.32, 14, t, fontproperties=fonts[1],
                    fontsize=22 * 72 / dpi, color=str(ink), va="top")
            lines.append(t)

    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
    plt.close(fig)
    return buf, lines


def _degrade(img, rng, style):
    """Post-render degradations (independent of training aug code)."""
    from PIL import Image
    import io
    out = img.astype(np.float32)
    if style in ("scan", "dense"):
        out += rng.normal(0, 6, out.shape)         # sensor noise
    if style == "scan":
        # slight rotation + JPEG roundtrip, like a desk scanner
        pil = Image.fromarray(np.clip(out, 0, 255).astype(np.uint8))
        pil = pil.rotate(float(rng.uniform(-1.2, 1.2)), expand=False,
                         fillcolor=(255, 255, 255))
        b = io.BytesIO()
        pil.save(b, "JPEG", quality=int(rng.integers(55, 80)))
        out = np.asarray(Image.open(b)).astype(np.float32)
    if style == "photo":
        # brightness gradient + vignette-ish shading + blur
        h, w = out.shape[:2]
        gx = np.linspace(-1, 1, w)[None, :, None]
        gy = np.linspace(-1, 1, h)[:, None, None]
        shade = 1.0 - 0.18 * (gx * float(rng.uniform(-1, 1)) +
                              gy * float(rng.uniform(-1, 1)))
        out = out * shade
        pil = Image.fromarray(np.clip(out, 0, 255).astype(np.uint8))
        from PIL import ImageFilter
        pil = pil.filter(ImageFilter.GaussianBlur(
            radius=float(rng.uniform(0.4, 1.0))))
        out = np.asarray(pil).astype(np.float32)
    return np.clip(out, 0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="onnxocr_tpu/test_images_heldout")
    ap.add_argument("--seed", type=int, default=20260819)
    args = ap.parse_args()
    import cv2

    os.makedirs(args.outdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    plan = (["doc"] * 7 + ["table"] * 5 + ["scan"] * 4 + ["photo"] * 4 +
            ["lowcontrast"] * 2 + ["dense"] * 2)
    gt = {}
    total = 0
    for i, style in enumerate(plan):
        img, lines = _render_page(rng, style)
        img = _degrade(img, rng, style)
        name = "synth_%02d_%s.png" % (i, style)
        cv2.imwrite(os.path.join(args.outdir, name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        gt[name] = lines
        total += len(lines)
        print(name, len(lines), "lines")
    with open(os.path.join(args.outdir, "gt.json"), "w") as f:
        json.dump(gt, f, ensure_ascii=False, indent=1)
    print("pages=%d lines=%d -> %s" % (len(plan), total, args.outdir))


if __name__ == "__main__":
    main()
