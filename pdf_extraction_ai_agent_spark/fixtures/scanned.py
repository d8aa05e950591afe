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


_NOISE_TABLES = None


def _noise_template_tables():
    """Memoized (template matrix, char -> full-block bytes, cropped-bytes
    -> char) for add_scan_noise — rebuilt per PAGE before r8 (~15% of the
    noise cost); all three are pure derivations of spec.OCR_FONT_5X7."""
    global _NOISE_TABLES
    if _NOISE_TABLES is None:
        import numpy as np

        blocks = _font_blocks()
        tmpl = np.array(list(blocks.values()), dtype=bool)  # (n_templates, 35)
        blocks_bytes = {
            ch: np.array(v, dtype=bool).tobytes() for ch, v in blocks.items()
        }
        cropped = {}
        for ch, rows in spec.OCR_FONT_5X7.items():
            bits = np.array(
                [[px == "X" for px in row] for row in rows], dtype=bool
            )
            ink = np.flatnonzero(bits.any(axis=1))
            cropped[bits[ink[0]: ink[-1] + 1].tobytes()] = ch
        _NOISE_TABLES = (tmpl, blocks_bytes, cropped)
    return _NOISE_TABLES


_PACKED_NOISE = None


def _packed_noise_tables():
    """(sorted int64 keys, parallel int64 full-block packs) for the
    vectorized exact-alias guard: key = the template's ROW-CROPPED
    pattern packed as 5-bit row digits (top row most significant — the
    canonical form a full-block pack reaches after its trailing zero
    digits are shifted out), value = the same template's FULL 7-row
    pack (35 bits, bijective with the 35-bool block)."""
    global _PACKED_NOISE
    if _PACKED_NOISE is None:
        import numpy as np

        def pack(rows2d) -> int:
            v = 0
            for row in rows2d:
                v = (v << 5) | sum(16 >> j for j, b in enumerate(row) if b)
            return v

        keys, fulls = [], []
        for ch, rows in spec.OCR_FONT_5X7.items():
            bits = [[px == "X" for px in row] for row in rows]
            ink = [i for i, r in enumerate(bits) if any(r)]
            keys.append(pack(bits[ink[0]: ink[-1] + 1]))
            fulls.append(pack(bits))
        order = np.argsort(np.array(keys, dtype=np.int64))
        _PACKED_NOISE = (
            np.array(keys, dtype=np.int64)[order],
            np.array(fulls, dtype=np.int64)[order],
        )
    return _PACKED_NOISE


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
    tmpl, blocks_bytes, cropped = _noise_template_tables()

    n_lines = (height - 2 * MARGIN - 7) // LINE_PITCH + 1
    n_cells = (width - 2 * MARGIN) // CELL_W
    page = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(height, width)

    def cell_offsets(li: int, ci: int) -> list[int]:
        y0, x0 = MARGIN + li * LINE_PITCH, MARGIN + ci * CELL_W
        return [(y0 + r) * width + x0 + c for r in range(7) for c in range(5)]

    # --- vectorized common path (r8): all cells' clean patterns, k=2 flip
    # picks, and the full-block Hamming safety check are computed in a
    # handful of whole-page numpy ops; only cells whose k=2 set fails
    # (Hamming or alias guard) fall back to the original per-cell probe
    # ladder.  Decisions and output bytes are IDENTICAL to the scalar form
    # (pinned by test_add_scan_noise_vector_path_matches_scalar).
    fallback_cells: list[tuple[int, int]] = []
    if flips_per_cell == 2 and n_lines > 0 and n_cells > 0:
        lis = np.repeat(np.arange(n_lines), n_cells)
        cis = np.tile(np.arange(n_cells), n_lines)
        keys = (lis * 4096 + cis).astype(np.uint64)
        rows_idx = (MARGIN + lis[:, None] * LINE_PITCH
                    + np.tile(np.arange(7), 5).reshape(5, 7).T.ravel()[None, :])
        cols_idx = (MARGIN + cis[:, None] * CELL_W
                    + np.tile(np.arange(5), 7)[None, :])
        offs_mat = rows_idx * width + cols_idx          # (N, 35) flat offsets
        C = (page.ravel()[offs_mat] < 128)              # clean patterns

        M1 = np.uint64(0xBF58476D1CE4E5B9)
        SEED0 = np.uint64(0x9E3779B97F4A7C15)

        def mix_v(j: int) -> "np.ndarray":
            h = np.full(len(keys), SEED0, dtype=np.uint64)
            for p in (np.uint64(seed & 0xFFFFFFFFFFFFFFFF), keys,
                      np.uint64(j)):
                h = (h ^ p) * M1
                h ^= h >> np.uint64(31)
            return h

        with np.errstate(over="ignore"):
            probes = np.stack([mix_v(j) % np.uint64(35) for j in range(6)])
        p0 = probes[0].astype(np.int64)
        p1 = np.full_like(p0, -1)
        for j in range(1, 6):
            cand = probes[j].astype(np.int64)
            p1 = np.where((p1 < 0) & (cand != p0), cand, p1)
        # cells whose first 2 distinct picks need j >= 6: scalar path
        deep = p1 < 0

        noisy = C.copy()
        rng = np.arange(len(keys))
        noisy[rng, p0] = ~noisy[rng, p0]
        ok = ~deep
        noisy[rng[ok], p1[ok]] = ~noisy[rng[ok], p1[ok]]
        D = (tmpl[None, :, :] != noisy[:, None, :]).sum(axis=2)   # (N, T)
        selfm = (tmpl[None, :, :] == C[:, None, :]).all(axis=2)
        D_others = np.where(selfm, 10_000, D)
        safe2 = ok & (D_others.min(axis=1) > 2)

        # exact-alias guard, vectorized (r8.2): pack each noisy cell's
        # rows as 5-bit int64 digits and strip trailing blank rows —
        # the canonical form of the ROW-CROPPED pattern (leading blanks
        # are zero high digits; first cropped row is nonzero, so the
        # packing is injective, same argument as operators/ocr.py). One
        # searchsorted against the packed template table replaces the
        # per-cell reshape/flatnonzero/tobytes/dict walk, and the safe
        # cells' flips apply through one writable numpy view.
        crop_keys, crop_full = _packed_noise_tables()
        colw = np.array([16, 8, 4, 2, 1], dtype=np.int64)
        roww = np.left_shift(
            np.int64(1), 5 * np.arange(6, -1, -1, dtype=np.int64)
        )
        row_vals = noisy.reshape(-1, 7, 5) @ colw        # (N, 7)
        vals = row_vals @ roww                           # full-block pack
        full_c = (C.reshape(-1, 7, 5) @ colw) @ roww     # clean full pack
        cvals = vals.copy()
        while True:                                      # crop: drop low zero digits
            mtrail = (cvals > 0) & (cvals & 31 == 0)
            if not mtrail.any():
                break
            cvals[mtrail] >>= 5
        pos = np.searchsorted(crop_keys, cvals)
        pos_c = np.clip(pos, 0, len(crop_keys) - 1)
        hit = (crop_keys[pos_c] == cvals) & (cvals > 0)
        alias = hit & (crop_full[pos_c] != full_c)
        for i in np.flatnonzero(~safe2 | (safe2 & alias)):
            fallback_cells.append((int(lis[i]), int(cis[i])))
        apply = np.flatnonzero(safe2 & ~alias)
        if apply.size:
            flips = np.concatenate(
                [offs_mat[apply, p0[apply]], offs_mat[apply, p1[apply]]]
            )
            view = np.frombuffer(buf, dtype=np.uint8)
            view[flips] = np.where(view[flips] >= 128, 0, 255)
        in_cell = set(offs_mat.ravel().tolist())
        cell_iter = fallback_cells
    else:
        in_cell = set()
        cell_iter = [(li, ci) for li in range(n_lines) for ci in range(n_cells)]

    for li, ci in cell_iter:
        y0 = MARGIN + li * LINE_PITCH
        offs = cell_offsets(li, ci)
        in_cell.update(offs)
        x0 = MARGIN + ci * CELL_W
        clean = (page[y0:y0 + 7, x0:x0 + 5] < 128).reshape(35)
        clean_b = clean.tobytes()
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
                # (byte-keyed here — same decisions as the tuple form,
                # ~3x less per-cell Python)
                ng = noisy.reshape(7, 5)
                inked = np.flatnonzero(ng.any(axis=1))
                if inked.size:
                    key = ng[inked[0]: inked[-1] + 1].tobytes()
                    hit = cropped.get(key)
                    if hit is not None and blocks_bytes[hit] != clean_b:
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
