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

CELL_W = spec.OCR_SCAN_CELL_W
LINE_PITCH = spec.OCR_SCAN_LINE_PITCH
MARGIN = spec.OCR_SCAN_MARGIN


def _mix64(*parts: int) -> int:
    """Deterministic splitmix64-style position hash (no random module —
    per-pixel decisions must be reproducible across twins and rounds)."""
    h = 0x9E3779B97F4A7C15
    for p in parts:
        h = (h ^ (p & 0xFFFFFFFFFFFFFFFF)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        h ^= h >> 31
    return h


def _font_blocks() -> dict[str, tuple[bool, ...]]:
    """char -> flat 35-bool full-cell ink pattern (space = all blank)."""
    out = {" ": tuple([False] * 35)}
    for ch, rows in spec.OCR_FONT_5X7.items():
        out[ch] = tuple(px == "X" for row in rows for px in row)
    return out


def add_scan_noise(
    width: int, height: int, raw: bytes, seed: int, flips_per_cell: int = 2
) -> bytes:
    """Deterministic salt-and-pepper noise over a rendered page (the OCR
    realism ladder, ROADMAP r7 item 5). Two components:

    - sparse background noise in the rows/columns the grid matcher never
      reads (margins, inter-line gap rows, inter-glyph gap columns) —
      pure realism, invisible to the decode;
    - up to ``flips_per_cell`` inverted pixels inside each 5x7 glyph
      cell, chosen by a position hash and SAFETY-CHECKED: a flip set is
      kept only if the noisy cell stays strictly closer to its true
      template than to every other template (full-block Hamming) AND its
      row-cropped pattern aliases no other template exactly (the exact
      matcher must either read it right or fall through to the nearest
      rung, never read it wrong). Unsafe sets degrade to fewer flips,
      then to none — so recovery by nearest-template match is guaranteed
      by construction and the q70 oracle gate stays a hard check of the
      matcher, not of luck.
    """
    import numpy as np

    buf = bytearray(raw)
    blocks = _font_blocks()
    tmpl = np.array(list(blocks.values()), dtype=bool)  # (n_templates, 35)
    cropped = {}
    for ch, rows in spec.OCR_FONT_5X7.items():
        bits = [tuple(px == "X" for px in row) for row in rows]
        ink = [i for i, r in enumerate(bits) if any(r)]
        cropped[tuple(bits[ink[0]: ink[-1] + 1])] = ch

    n_lines = (height - 2 * MARGIN - 7) // LINE_PITCH + 1
    n_cells = (width - 2 * MARGIN) // CELL_W
    page = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(height, width)

    def cell_offsets(li: int, ci: int) -> list[int]:
        y0, x0 = MARGIN + li * LINE_PITCH, MARGIN + ci * CELL_W
        return [(y0 + r) * width + x0 + c for r in range(7) for c in range(5)]

    in_cell = set()
    for li in range(n_lines):
        y0 = MARGIN + li * LINE_PITCH
        for ci in range(n_cells):
            offs = cell_offsets(li, ci)
            in_cell.update(offs)
            x0 = MARGIN + ci * CELL_W
            clean = (page[y0:y0 + 7, x0:x0 + 5] < 128).reshape(35)
            clean_t = tuple(bool(v) for v in clean)
            not_self = ~(tmpl == clean).all(axis=1)
            # probe hash-chosen flip sets, largest first, until one is safe
            for k in range(flips_per_cell, 0, -1):
                picks: list[int] = []
                j = 0
                while len(picks) < k and j < 64:
                    p = _mix64(seed, li * 4096 + ci, j) % 35
                    if p not in picks:
                        picks.append(p)
                    j += 1
                noisy = clean.copy()
                noisy[picks] = ~noisy[picks]
                # full-block Hamming to every OTHER template must exceed
                # the distance to the true pattern (= k)
                d_others = (tmpl != noisy).sum(axis=1)[not_self]
                safe = bool(d_others.size == 0 or d_others.min() > k)
                if safe:
                    # exact-alias guard: the noisy ROW-CROPPED pattern must
                    # not equal a different template's cropped pattern
                    grid = [
                        tuple(bool(v) for v in noisy[r * 5:(r + 1) * 5])
                        for r in range(7)
                    ]
                    inked = [i for i, r in enumerate(grid) if any(r)]
                    if inked:
                        key = tuple(grid[inked[0]: inked[-1] + 1])
                        hit = cropped.get(key)
                        if hit is not None and blocks[hit] != clean_t:
                            safe = False
                if safe:
                    for p in picks:
                        o = offs[p]
                        buf[o] = 0 if buf[o] >= 128 else 255
                    break

    # background salt-and-pepper everywhere the grid matcher never reads:
    # ~0.25% of pixels, drawn as k hash positions (a per-pixel bernoulli
    # loop costs ~9k hash calls/page; this costs ~25)
    total = width * height
    for j in range(max(total // 400, 1)):
        o = _mix64(seed, 0x6261636B, j) % total
        if o not in in_cell:
            buf[o] = 0 if buf[o] >= 128 else 255
    return bytes(buf)


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


def write_scanned_pdf(
    pages: list[list[str]], noise_seed: int | None = None
) -> bytes:
    """A classic-xref PDF whose pages contain ONLY an image XObject each
    (`/ImN Do`, /DeviceGray 8-bit, FlateDecode) — the scanned-document
    shape. Both twins extract an empty page (→ needs_ocr); the fixture
    OCR rung reads the bitmaps back. ``noise_seed`` applies deterministic
    salt-and-pepper noise (add_scan_noise) per page — the q70 realism
    rung; recovery then needs the nearest-template matcher."""
    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode("latin-1")
    for i, lines in enumerate(pages):
        page_num, cont_num, img_num = 3 + 3 * i, 4 + 3 * i, 5 + 3 * i
        w, h, raw = render_page_bitmap(lines)
        if noise_seed is not None:
            raw = add_scan_noise(w, h, raw, seed=noise_seed * 1000003 + i)
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
