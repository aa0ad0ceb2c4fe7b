"""Minimal pure-Python rasterizer for digitally-born (vector) PDFs.

The reference rasterizes every PDF page via pymupdf
(onnxocr/ocr_images_pdfs.py:22-35); that C library is absent here, so this
module renders the *text + filled-rectangle subset* of PDF content streams
with PIL — enough to OCR typical text-first documents (invoices, reports,
generated letters). Supported:

  * page tree traversal (/Root → /Pages → /Kids), MediaBox inheritance
  * FlateDecode content streams, multiple /Contents parts
  * graphics state: q/Q, cm (full 2D affine CTM), rg/g fill color
  * text state: BT/ET, Tf, Td, TD, TL, Tm, T*, Tj, ', TJ (with kerning)
  * paths: re + f/f*/b/B filled rectangles (axis-aligned after CTM)
  * WinAnsi/Latin-1 byte strings; fonts approximated by DejaVu variants
    picked from /BaseFont (bold/serif/mono heuristics)

Unsupported content (curves, shadings, embedded images inside vector
pages, CID fonts) is skipped silently — the goal is OCR-able text pixels,
not print fidelity.
"""
from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

_FONT_FILES = {
    ("serif", False): "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    ("serif", True): "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
    ("sans", False): "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    ("sans", True): "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    ("mono", False): "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    ("mono", True): "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf",
}


# --------------------------------------------------------------- object model
class _Objects:
    """Indirect-object index: number → (dict_head bytes, stream or None)."""

    def __init__(self, data: bytes):
        self.data = data
        self.by_num: Dict[int, Tuple[bytes, Optional[bytes]]] = {}
        for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b", data):
            num = int(m.group(1))
            start = m.end()
            end = data.find(b"endobj", start)
            if end < 0:
                continue
            body = data[start:end]
            sm = re.search(rb"stream\r?\n", body)
            if sm:
                head, stream = body[:sm.start()], body[sm.end():]
                es = stream.rfind(b"endstream")
                if es >= 0:
                    stream = stream[:es]
                    if stream.endswith(b"\n"):
                        stream = stream[:-1]
                    if stream.endswith(b"\r"):
                        stream = stream[:-1]
            else:
                head, stream = body, None
            self.by_num[num] = (head, stream)

    def resolve(self, head: bytes, key: bytes):
        """Value of /key in a dict: returns (literal bytes) with refs
        followed one level."""
        m = re.search(re.escape(key) + rb"\s*(\d+)\s+\d+\s+R", head)
        if m:
            return self.by_num.get(int(m.group(1)))
        return None

    def stream_of(self, num: int) -> Optional[bytes]:
        head, stream = self.by_num.get(num, (b"", None))
        if stream is None:
            return None
        if b"/FlateDecode" in head:
            try:
                return zlib.decompress(stream)
            except zlib.error:
                return None
        return stream


def _find_pages(objs: _Objects) -> List[int]:
    """Page object numbers in tree order (falls back to file order)."""
    pages = []

    def walk(num, seen):
        if num in seen:
            return
        seen.add(num)
        head, _ = objs.by_num.get(num, (b"", None))
        if re.search(rb"/Type\s*/Page\b(?!s)", head):
            pages.append(num)
            return
        kids = re.search(rb"/Kids\s*\[(.*?)\]", head, re.S)
        if kids:
            for km in re.finditer(rb"(\d+)\s+\d+\s+R", kids.group(1)):
                walk(int(km.group(1)), seen)

    roots = [num for num, (head, _) in objs.by_num.items()
             if re.search(rb"/Type\s*/Pages\b", head)]
    seen: set = set()
    for r in roots:
        walk(r, seen)
    if not pages:
        pages = [num for num, (head, _) in sorted(objs.by_num.items())
                 if re.search(rb"/Type\s*/Page\b(?!s)", head)]
    return pages


def _media_box(objs: _Objects, num: int) -> Tuple[float, float]:
    seen = set()
    while num and num not in seen:
        seen.add(num)
        head, _ = objs.by_num.get(num, (b"", None))
        m = re.search(rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+"
                      rb"([\d.+-]+)\s+([\d.+-]+)", head)
        if m:
            x0, y0, x1, y1 = (float(m.group(i)) for i in range(1, 5))
            return abs(x1 - x0), abs(y1 - y0)
        parent = re.search(rb"/Parent\s+(\d+)\s+\d+\s+R", head)
        num = int(parent.group(1)) if parent else 0
    return 612.0, 792.0


def _page_fonts(objs: _Objects, num: int) -> Dict[bytes, Tuple[str, bool]]:
    """Font resource name → (family, bold) picked from /BaseFont."""
    head, _ = objs.by_num.get(num, (b"", None))
    font_dict = head
    res = objs.resolve(head, b"/Resources")
    if res:
        font_dict = res[0]
    fonts: Dict[bytes, Tuple[str, bool]] = {}
    region = font_dict
    fm = re.search(rb"/Font\s*<<(.*?)>>", region, re.S)
    if fm:
        region = fm.group(1)
    for m in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", region):
        fhead, _ = objs.by_num.get(int(m.group(2)), (b"", None))
        base = re.search(rb"/BaseFont\s*/([#\w+-]+)", fhead)
        name = (base.group(1).lower() if base else b"")
        family = "sans"
        if b"times" in name or b"serif" in name or b"roman" in name or \
                b"georgia" in name or b"garamond" in name:
            family = "serif"
        elif b"courier" in name or b"mono" in name or b"consol" in name:
            family = "mono"
        bold = b"bold" in name or b"black" in name or b"heavy" in name
        fonts[m.group(1)] = (family, bold)
    return fonts


# ------------------------------------------------------------ content tokens
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"      # literal string
    rb"|<[0-9A-Fa-f\s]*>"         # hex string
    rb"|/[^\s\[\]()<>/]*"         # name
    rb"|[\[\]]"
    rb"|[-+.\d][-+.\deE]*"        # number
    rb"|[A-Za-z'\"*]+")           # operator


def _decode_string(tok: bytes) -> str:
    if tok.startswith(b"<"):
        hexs = re.sub(rb"\s", b"", tok[1:-1])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii")).decode("latin-1")
    body = tok[1:-1]
    out = bytearray()
    i = 0
    esc = {b"n"[0]: 10, b"r"[0]: 13, b"t"[0]: 9, b"b"[0]: 8, b"f"[0]: 12}
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash
            n = body[i + 1]
            if n in esc:
                out.append(esc[n])
                i += 2
                continue
            if 0x30 <= n <= 0x37:  # octal
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and \
                        0x30 <= body[j] <= 0x37:
                    oct_digits += bytes([body[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            out.append(n)
            i += 2
            continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


class _Mat:
    """Row-vector 2D affine: [a b; c d; e f]."""

    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a=1.0, b=0.0, c=0.0, d=1.0, e=0.0, f=0.0):
        self.a, self.b, self.c, self.d, self.e, self.f = a, b, c, d, e, f

    def mul(self, o: "_Mat") -> "_Mat":
        """self ∘ o (apply self first, then o)."""
        return _Mat(self.a * o.a + self.b * o.c,
                    self.a * o.b + self.b * o.d,
                    self.c * o.a + self.d * o.c,
                    self.c * o.b + self.d * o.d,
                    self.e * o.a + self.f * o.c + o.e,
                    self.e * o.b + self.f * o.d + o.f)

    def apply(self, x: float, y: float) -> Tuple[float, float]:
        return (self.a * x + self.c * y + self.e,
                self.b * x + self.d * y + self.f)

    def scale(self) -> float:
        import math
        return math.sqrt(abs(self.a * self.d - self.b * self.c)) or 1.0


def render_pdf_pages(pdf_path: str, dpi: int = 150) -> List[np.ndarray]:
    """Rasterize each page to an RGB uint8 array. Raises RuntimeError when
    no page produced any content (caller falls back / reports)."""
    from PIL import Image, ImageDraw, ImageFont

    with open(pdf_path, "rb") as fh:
        objs = _Objects(fh.read())
    page_nums = _find_pages(objs)
    if not page_nums:
        raise RuntimeError(f"{pdf_path}: no page objects found")

    scale0 = dpi / 72.0
    font_cache: Dict[Tuple[str, bool, int], ImageFont.FreeTypeFont] = {}

    def get_font(family: str, bold: bool, px: int):
        px = max(4, min(px, 400))
        key = (family, bold, px)
        if key not in font_cache:
            path = _FONT_FILES.get((family, bold)) or \
                _FONT_FILES[("sans", False)]
            font_cache[key] = ImageFont.truetype(path, px)
        return font_cache[key]

    pages: List[np.ndarray] = []
    drew_anything = False
    for pnum in page_nums:
        w_pt, h_pt = _media_box(objs, pnum)
        W, H = int(w_pt * scale0) or 1, int(h_pt * scale0) or 1
        img = Image.new("RGB", (W, H), (255, 255, 255))
        draw = ImageDraw.Draw(img)
        fonts = _page_fonts(objs, pnum)

        # gather content stream(s)
        head, _ = objs.by_num.get(pnum, (b"", None))
        content = b""
        cm_arr = re.search(rb"/Contents\s*\[(.*?)\]", head, re.S)
        refs = cm_arr.group(1) if cm_arr else head
        cm_one = re.finditer(rb"(\d+)\s+\d+\s+R", refs) if cm_arr else \
            re.finditer(rb"/Contents\s+(\d+)\s+\d+\s+R", head)
        for m in cm_one:
            s = objs.stream_of(int(m.group(1)))
            if s:
                content += s + b"\n"
        if not content:
            pages.append(np.asarray(img))
            continue

        # device transform: PDF user space (y up) → pixels (y down)
        base = _Mat(scale0, 0.0, 0.0, -scale0, 0.0, H)
        ctm = base
        stack: List[_Mat] = []
        fill = (0, 0, 0)
        cur_font = ("sans", False)
        font_size = 12.0
        tm = _Mat()
        tlm = _Mat()
        leading = 0.0
        rects: List[Tuple[float, float, float, float]] = []
        operands: List = []

        def show_text(s: str):
            nonlocal tm, drew_anything
            if not s.strip():
                adv = get_font(*cur_font, 12).getlength(s) / 12.0
                tm = _Mat(1, 0, 0, 1, adv * font_size, 0).mul(tm)
                return
            trm = _Mat(font_size, 0, 0, font_size, 0, 0).mul(tm).mul(ctm)
            px = max(1, int(round(trm.scale())))
            font = get_font(cur_font[0], cur_font[1], px)
            x, y = trm.apply(0.0, 0.0)
            asc, _desc = font.getmetrics()
            draw.text((x, y - asc), s, fill=fill, font=font)
            drew_anything = True
            adv = font.getlength(s) / px  # text-space ems
            tm = _Mat(1, 0, 0, 1, adv * font_size, 0).mul(tm)

        for tok in _TOKEN_RE.finditer(content):
            t = tok.group(0)
            c0 = t[:1]
            if c0 in b"([<" or c0.isdigit() or c0 in b"-+." or t in \
                    (b"[", b"]"):
                if t == b"[":
                    operands.append("[")
                elif t == b"]":
                    # collapse array elements into one list operand
                    arr = []
                    while operands and operands[-1] != "[":
                        arr.append(operands.pop())
                    if operands:
                        operands.pop()
                    operands.append(list(reversed(arr)))
                elif c0 in b"(<":
                    operands.append(_decode_string(t))
                else:
                    try:
                        operands.append(float(t))
                    except ValueError:
                        operands.append(0.0)
                continue
            if c0 == b"/":
                operands.append(t[1:])
                continue

            op = t
            try:
                if op == b"q":
                    stack.append(ctm)
                elif op == b"Q":
                    ctm = stack.pop() if stack else base
                elif op == b"cm" and len(operands) >= 6:
                    a, b_, c, d, e, f = operands[-6:]
                    ctm = _Mat(a, b_, c, d, e, f).mul(ctm)
                elif op == b"g" and operands:
                    v = int(float(operands[-1]) * 255)
                    fill = (v, v, v)
                elif op == b"rg" and len(operands) >= 3:
                    fill = tuple(int(float(v) * 255)
                                 for v in operands[-3:])
                elif op == b"BT":
                    tm = _Mat()
                    tlm = _Mat()
                elif op == b"Tf" and len(operands) >= 2:
                    name = operands[-2]
                    font_size = float(operands[-1])
                    if isinstance(name, bytes):
                        cur_font = fonts.get(name, ("sans", False))
                elif op == b"TL" and operands:
                    leading = float(operands[-1])
                elif op in (b"Td", b"TD") and len(operands) >= 2:
                    tx, ty = operands[-2:]
                    if op == b"TD":
                        leading = -float(ty)
                    tlm = _Mat(1, 0, 0, 1, float(tx), float(ty)).mul(tlm)
                    tm = tlm
                elif op == b"Tm" and len(operands) >= 6:
                    a, b_, c, d, e, f = (float(v) for v in operands[-6:])
                    tlm = _Mat(a, b_, c, d, e, f)
                    tm = tlm
                elif op == b"T*":
                    tlm = _Mat(1, 0, 0, 1, 0, -leading).mul(tlm)
                    tm = tlm
                elif op == b"Tj" and operands:
                    show_text(str(operands[-1]))
                elif op == b"'" and operands:
                    tlm = _Mat(1, 0, 0, 1, 0, -leading).mul(tlm)
                    tm = tlm
                    show_text(str(operands[-1]))
                elif op == b"TJ" and operands and \
                        isinstance(operands[-1], list):
                    for el in operands[-1]:
                        if isinstance(el, str):
                            show_text(el)
                        else:  # kerning adjustment, thousandths of em
                            tm = _Mat(1, 0, 0, 1,
                                      -float(el) / 1000.0 * font_size,
                                      0).mul(tm)
                elif op == b"re" and len(operands) >= 4:
                    rects.append(tuple(float(v) for v in operands[-4:]))
                elif op in (b"f", b"f*", b"F", b"b", b"B", b"b*", b"B*"):
                    for (rx, ry, rw, rh) in rects:
                        x0, y0 = ctm.apply(rx, ry)
                        x1, y1 = ctm.apply(rx + rw, ry + rh)
                        draw.rectangle([min(x0, x1), min(y0, y1),
                                        max(x0, x1), max(y0, y1)],
                                       fill=fill)
                        if abs(x1 - x0) > 2 and abs(y1 - y0) > 2:
                            drew_anything = True
                    rects = []
                elif op == b"n":
                    rects = []
            except Exception:
                pass  # malformed operator sequences are skipped, not fatal
            operands = []

        pages.append(np.asarray(img))

    if not drew_anything:
        raise RuntimeError(
            f"{pdf_path}: no drawable text/rect content found "
            "(image-only or unsupported constructs)")
    return pages
