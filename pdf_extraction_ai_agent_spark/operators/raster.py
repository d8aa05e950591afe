"""Dependency-free raster primitives for the EXECUTED page-render slice
(S7, reference: claude_pdf_image_extractor.py:62-74 — rasterize each PDF
page to PNG for the downstream image path).

The sandbox has no PyMuPDF/PIL, but PNG itself is stdlib territory:
zlib + struct + crc32 cover the whole format for 8-bit grayscale. This
module carries

- ``encode_png_gray`` / ``decode_png_gray`` — a real PNG writer/reader
  pair. The reader is STRICT and implements the full scanline-filter set
  (None/Sub/Up/Average/Paeth, PNG spec §9) plus per-chunk CRC checks, so
  it is a genuine spec implementation rather than the writer's inverse:
  a writer bug that emitted off-spec bytes would fail the reader's CRC /
  geometry checks, not roundtrip silently.
- ``rasterize_text_page`` — blit text lines onto the fixture scan grid
  (spec.OCR_SCAN_*) using the deterministic spec.OCR_FONT_5X7 glyphs.
  The font is small-caps: a lowercase letter renders as its uppercase
  glyph (documented lossy mapping, same as a subset font without a
  lower case); characters outside the font raise — the render error
  channel reports them, never a silently blank glyph.

Kept independent of fixtures/scanned.py (which blits the same spec font
for test fixtures): writer-side fixture code and operator-side render
code may never share loops, only spec data — the same discipline as the
extract/oracle twins.
"""

from __future__ import annotations

import struct
import zlib

from .. import spec

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + kind + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, raw: bytes) -> bytes:
    """8-bit grayscale rows → a complete PNG (color type 0, filter 0 per
    scanline, one zlib IDAT). ``raw`` is width*height bytes, row-major."""
    if width <= 0 or height <= 0 or len(raw) != width * height:
        raise ValueError("raster geometry mismatch")
    body = bytearray()
    for r in range(height):
        body.append(0)  # filter type None
        body += raw[r * width:(r + 1) * width]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray(data: bytes) -> tuple[int, int, bytes]:
    """Strict PNG reader for 8-bit grayscale, non-interlaced images:
    verifies the signature, every chunk CRC, IHDR fields, and the exact
    decompressed length; un-applies all five scanline filters (spec §9).
    Raises RuntimeError on any spec violation — a render gate must fail
    loudly on malformed output, never hand garbage downstream."""
    if data[:8] != _PNG_SIG:
        raise RuntimeError("not a PNG (bad signature)")
    pos = 8
    width = height = -1
    idat = bytearray()
    seen_end = False
    seen_ihdr = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise RuntimeError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        kind = data[pos + 4:pos + 8]
        end = pos + 8 + length
        if end + 4 > len(data):
            raise RuntimeError("truncated PNG chunk body")
        body = data[pos + 8:end]
        (crc,) = struct.unpack(">I", data[end:end + 4])
        if crc != (zlib.crc32(kind + body) & 0xFFFFFFFF):
            raise RuntimeError(f"PNG chunk CRC mismatch in {kind!r}")
        if kind == b"IHDR":
            if seen_ihdr:
                raise RuntimeError("duplicate IHDR")
            seen_ihdr = True
            width, height, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, inter) != (8, 0, 0, 0, 0):
                raise RuntimeError(
                    "unsupported PNG shape (need 8-bit grayscale, "
                    "non-interlaced)"
                )
        elif kind == b"IDAT":
            idat += body
        elif kind == b"IEND":
            seen_end = True
            break
        pos = end + 4
    if not seen_ihdr or not seen_end:
        raise RuntimeError("PNG missing IHDR or IEND")
    try:
        plain = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise RuntimeError(f"PNG IDAT inflate failed: {e}") from None
    stride = width + 1
    if len(plain) != stride * height:
        raise RuntimeError("PNG scanline payload length mismatch")
    out = bytearray(width * height)
    prev = bytes(width)
    for r in range(height):
        ftype = plain[r * stride]
        row = bytearray(plain[r * stride + 1:(r + 1) * stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(1, width):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(width):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(width):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(width):
                left = row[i - 1] if i else 0
                upleft = prev[i - 1] if i else 0
                row[i] = (row[i] + _paeth(left, prev[i], upleft)) & 0xFF
        else:
            raise RuntimeError(f"unknown PNG filter type {ftype}")
        out[r * width:(r + 1) * width] = row
        prev = bytes(row)
    return width, height, bytes(out)


def rasterize_text_page(lines: list[str]) -> tuple[int, int, bytes]:
    """Text lines → (width, height, raw grayscale) on the fixture scan
    grid (spec.OCR_SCAN_*: 5x7 glyphs, 6 px cell pitch, 10 px line pitch,
    4 px margins; ink 0 on 255). Small-caps font: lowercase maps to the
    uppercase glyph; anything else outside spec.OCR_FONT_5X7 raises."""
    m = spec.OCR_SCAN_MARGIN
    cw = spec.OCR_SCAN_CELL_W
    pitch = spec.OCR_SCAN_LINE_PITCH
    width = 2 * m + cw * max((len(ln) for ln in lines), default=1)
    height = 2 * m + pitch * max(len(lines) - 1, 0) + 7
    buf = bytearray(b"\xff" * (width * height))
    for li, line in enumerate(lines):
        y0 = m + li * pitch
        for ci, ch in enumerate(line):
            if ch == " ":
                continue
            glyph = spec.OCR_FONT_5X7.get(ch.upper())
            if glyph is None:
                raise RuntimeError(
                    f"glyph {ch!r} not in the fixture font — real render "
                    "needs PyMuPDF on a cluster image"
                )
            x0 = m + ci * cw
            for r, grow in enumerate(glyph):
                base = (y0 + r) * width + x0
                for c, px in enumerate(grow):
                    if px == "X":
                        buf[base + c] = 0
    return width, height, bytes(buf)
