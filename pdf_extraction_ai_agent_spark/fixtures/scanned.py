"""Synthetic SCANNED-PDF fixtures (r6 verdict item 7): a deterministic
rasterizer for spec.OCR_FONT_5X7 that produces pages carrying ONLY a
grayscale image XObject — no text layer — so the extraction stage yields
an empty page and trips the <OCR_MIN_CHARS ``needs_ocr`` trigger, and the
fixture OCR rung (operators/ocr.py::ocr_payload_fixture) can recover the
text by template match. This is the in-sandbox stand-in for the
reference's rasterize→pytesseract chain (extract_text.py:18-24), scoped
honestly: generated fixtures only — real scans still need the OCR stack
on a cluster image.

Geometry contract the reader relies on (all deterministic):
glyph cell = 6 px wide (5 + 1 gap), line pitch = 10 px (7 + 3 blank
rows ≥ 2 so line bands never merge), 4 px margins, ink = 0 on a 255
background, one image per page, image objects in page order.
"""

from __future__ import annotations

import zlib

from .. import spec
from .minipdf import _assemble_classic

CELL_W = 6
LINE_PITCH = 10
MARGIN = 4


def render_page_bitmap(lines: list[str]) -> tuple[int, int, bytes]:
    """(width, height, raw 8-bit grayscale bytes) of the rendered lines.
    Unsupported characters raise (the fixture contract filters to
    spec.OCR_FONT_CHARSET up front)."""
    width = MARGIN * 2 + CELL_W * max((len(ln) for ln in lines), default=1)
    height = MARGIN * 2 + LINE_PITCH * max(len(lines) - 1, 0) + 7
    buf = bytearray(b"\xff" * (width * height))
    for li, line in enumerate(lines):
        y0 = MARGIN + li * LINE_PITCH
        for ci, ch in enumerate(line):
            if ch == " ":
                continue
            glyph = spec.OCR_FONT_5X7[ch]
            x0 = MARGIN + ci * CELL_W
            for r, row in enumerate(glyph):
                base = (y0 + r) * width + x0
                for c, px in enumerate(row):
                    if px == "X":
                        buf[base + c] = 0
    return width, height, bytes(buf)


def write_scanned_pdf(pages: list[list[str]]) -> bytes:
    """A classic-xref PDF whose pages contain ONLY an image XObject each
    (`/ImN Do`, /DeviceGray 8-bit, FlateDecode) — the scanned-document
    shape. Both twins extract an empty page (→ needs_ocr); the fixture
    OCR rung reads the bitmaps back."""
    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1")
    for i, lines in enumerate(pages):
        page_num, cont_num, img_num = 3 + 3 * i, 4 + 3 * i, 5 + 3 * i
        w, h, raw = render_page_bitmap(lines)
        data = zlib.compress(raw)
        objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /XObject << /Im{i} {img_num} 0 R >> >> "
            f"/Contents {cont_num} 0 R >>"
        ).encode("latin-1")
        content = b"/Im%d Do" % i
        objs[cont_num] = (
            b"<< /Length %d >>\nstream\n" % len(content)
            + content + b"\nendstream"
        )
        objs[img_num] = (
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (w, h, len(data)) + data + b"\nendstream"
        )
    return _assemble_classic(objs)


def scannable_text(s: str, limit: int = 30) -> str:
    """The deterministic transform the q69 fixture applies to document
    text before rendering: whitespace-squished prefix, uppercased,
    filtered to the font charset, trimmed. Its DuckDB twin lives in the
    q69 oracle SQL — keep the two in lockstep."""
    import re

    t = re.sub(r"\s+", " ", s[:limit]).strip().upper()
    t = "".join(c for c in t if c in spec.OCR_FONT_CHARSET)
    return t.strip()
