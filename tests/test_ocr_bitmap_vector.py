"""r8 optimization pin: the vectorized exact OCR matcher (``ocr_bitmap``,
5-bit-per-row int64 packing + one dict probe per cell) is
output-identical — text AND failure behavior — to the per-cell scalar
walk it replaced, which is reproduced verbatim below as the equality
reference. Covers clean fixture scans, noisy scans (raise-for-raise),
random valid glyph grids with interior spaces, off-grid jitter, the
right-edge pad, and the >12-row-band scalar fallback."""

from __future__ import annotations

import random

import numpy as np
import pytest

from pdf_extraction_ai_agent_spark import spec
from pdf_extraction_ai_agent_spark.operators.ocr import (
    _cropped_templates,
    _scan_images,
    ocr_bitmap,
)


def _scalar_reference(width: int, height: int, raw: bytes) -> str:
    """The pre-vectorization ocr_bitmap, reproduced verbatim."""
    templates = _cropped_templates()
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, width)
    ink = arr < 128
    row_any = ink.any(axis=1)
    lines: list[str] = []
    r = 0
    while r < height:
        if not row_any[r]:
            r += 1
            continue
        r1 = r
        while r1 < height and row_any[r1]:
            r1 += 1
        band = ink[r:r1]
        cols = band.any(axis=0)
        c0 = int(np.argmax(cols))
        c_last = width - 1 - int(np.argmax(cols[::-1]))
        chars = []
        for cell in range(c0, c_last + 1, 6):
            block = band[:, cell : cell + 5]
            if block.shape[1] < 5:  # right-edge pad
                block = np.pad(block, ((0, 0), (0, 5 - block.shape[1])))
            rows_ink = [i for i in range(block.shape[0]) if block[i].any()]
            if not rows_ink:
                chars.append(" ")
                continue
            key = tuple(
                tuple(bool(v) for v in block[i]) for i in
                range(rows_ink[0], rows_ink[-1] + 1)
            )
            ch = templates.get(key)
            if ch is None:
                raise RuntimeError("unrecognized glyph")
            chars.append(ch)
        lines.append("".join(chars).rstrip())
        r = r1
    return "\n".join(lines)


def _assert_same(width: int, height: int, raw: bytes) -> None:
    try:
        want = _scalar_reference(width, height, raw)
        want_err = None
    except RuntimeError:
        want = want_err = "RAISE"
    try:
        got = ocr_bitmap(width, height, raw)
        got_err = None
    except RuntimeError:
        got = got_err = "RAISE"
    assert got_err == want_err
    assert got == want


def _render(lines: list[str], jitter: tuple[int, int] = (0, 0)) -> tuple:
    """Rasterize lines on the fixture grid, with an optional extra
    (x, y) offset so bands/cells land off the canonical margins."""
    m, pitch, cw = (
        spec.OCR_SCAN_MARGIN, spec.OCR_SCAN_LINE_PITCH, spec.OCR_SCAN_CELL_W
    )
    jx, jy = jitter
    w = 2 * m + jx + cw * max(len(ln) for ln in lines)
    h = 2 * m + jy + pitch * (len(lines) - 1) + 7
    page = np.full((h, w), 255, dtype=np.uint8)
    for li, ln in enumerate(lines):
        y0 = m + jy + li * pitch
        for ci, ch in enumerate(ln):
            if ch == " ":
                continue
            glyph = spec.OCR_FONT_5X7[ch]
            x0 = m + jx + ci * cw
            for r, row in enumerate(glyph):
                for c, px in enumerate(row):
                    if px == "X":
                        page[y0 + r, x0 + c] = 0
    return w, h, page.tobytes()


def test_clean_fixture_scans_match():
    from pdf_extraction_ai_agent_spark.entry_queries_ext9 import _payload_q69

    for i in range(40):
        payload = _payload_q69(i, f"claim narrative {i} with mixed 12/34")
        for w, h, raw in _scan_images(payload):
            assert ocr_bitmap(w, h, raw) == _scalar_reference(w, h, raw)


def test_noisy_scans_raise_like_scalar():
    from pdf_extraction_ai_agent_spark.entry_queries_ext9 import _payload_q70

    raised = 0
    for i in range(40):
        payload = _payload_q70(i, f"noisy body {i} text")
        for w, h, raw in _scan_images(payload):
            try:
                _scalar_reference(w, h, raw)
            except RuntimeError:
                raised += 1
            _assert_same(w, h, raw)
    assert raised > 0  # noise must actually defeat the exact matcher


def test_random_glyph_grids_and_jitter():
    rng = random.Random(808)
    charset = list(spec.OCR_FONT_5X7.keys())
    for trial in range(60):
        n_lines = rng.randint(1, 4)
        lines = []
        for _ in range(n_lines):
            n = rng.randint(1, 30)
            # interior spaces exercise the empty-cell → " " path; a
            # trailing non-space keeps rstrip comparable on both sides
            ln = "".join(rng.choice(charset + [" "] * 3) for _ in range(n))
            lines.append(ln.rstrip() or rng.choice(charset))
        jitter = (rng.randint(0, 3), rng.randint(0, 2))
        w, h, raw = _render(lines, jitter)
        _assert_same(w, h, raw)


def test_random_pixel_soup_matches_failure_behavior():
    rng = np.random.default_rng(909)
    for _ in range(30):
        h = int(rng.integers(3, 40))
        w = int(rng.integers(3, 60))
        raw = (rng.integers(0, 2, size=(h, w)) * 255).astype(np.uint8)
        _assert_same(w, h, raw.tobytes())


def test_tall_band_takes_scalar_fallback():
    # a 14-row solid ink band exceeds the packing's 12-row ceiling; both
    # sides must walk it identically (here: same RuntimeError)
    h, w = 20, 17
    page = np.full((h, w), 255, dtype=np.uint8)
    page[3:17, 2:15] = 0
    _assert_same(w, h, page.tobytes())
    with pytest.raises(RuntimeError):
        ocr_bitmap(w, h, page.tobytes())


def test_empty_and_blank_pages():
    page = np.full((9, 11), 255, dtype=np.uint8)
    assert ocr_bitmap(11, 9, page.tobytes()) == ""
    assert _scalar_reference(11, 9, page.tobytes()) == ""
