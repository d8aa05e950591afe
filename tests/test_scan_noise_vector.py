"""r8 optimization pin: add_scan_noise's vectorized k=2 common path makes
byte-identical pages to the scalar probe ladder it accelerates — the
scalar path stays reachable (non-default flips_per_cell) and IS the
fallback for cells whose first flip set fails the safety checks."""

from __future__ import annotations

import random

from pdf_extraction_ai_agent_spark.fixtures import scanned


def _scalar_reference(width, height, raw, seed, flips_per_cell=2):
    """The pre-vectorization algorithm, reproduced verbatim as the
    equality reference (per-cell probe ladder over every cell)."""
    import numpy as np

    buf = bytearray(raw)
    tmpl, blocks_bytes, cropped = scanned._noise_template_tables()
    M, LP, CW = scanned.MARGIN, scanned.LINE_PITCH, scanned.CELL_W
    n_lines = (height - 2 * M - 7) // LP + 1
    n_cells = (width - 2 * M) // CW
    page = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(height, width)
    in_cell = set()
    for li in range(n_lines):
        y0 = M + li * LP
        for ci in range(n_cells):
            x0 = M + ci * CW
            offs = [(y0 + r) * width + x0 + c for r in range(7) for c in range(5)]
            in_cell.update(offs)
            clean = (page[y0:y0 + 7, x0:x0 + 5] < 128).reshape(35)
            not_self = ~(tmpl == clean).all(axis=1)
            for k in range(flips_per_cell, 0, -1):
                picks, j = [], 0
                while len(picks) < k and j < 64:
                    p = scanned._mix64(seed, li * 4096 + ci, j) % 35
                    if p not in picks:
                        picks.append(p)
                    j += 1
                noisy = clean.copy()
                noisy[picks] = ~noisy[picks]
                d_others = (tmpl != noisy).sum(axis=1)[not_self]
                safe = bool(d_others.size == 0 or d_others.min() > k)
                if safe:
                    ng = noisy.reshape(7, 5)
                    inked = np.flatnonzero(ng.any(axis=1))
                    if inked.size:
                        key = ng[inked[0]: inked[-1] + 1].tobytes()
                        hit = cropped.get(key)
                        if hit is not None and blocks_bytes[hit] != clean.tobytes():
                            safe = False
                if safe:
                    for p in picks:
                        o = offs[p]
                        buf[o] = 0 if buf[o] >= 128 else 255
                    break
    total = width * height
    for j in range(max(total // 400, 1)):
        o = scanned._mix64(seed, 0x6261636B, j) % total
        if o not in in_cell:
            buf[o] = 0 if buf[o] >= 128 else 255
    return bytes(buf)


def test_add_scan_noise_vector_path_matches_scalar():
    rnd = random.Random(7)
    chars = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 #,-./:"
    for seed in range(60):
        lines = [
            "".join(rnd.choice(chars) for _ in range(rnd.randrange(1, 40)))
            for _ in range(rnd.randrange(1, 4))
        ]
        w, h, raw = scanned.render_page_bitmap(lines)
        assert scanned.add_scan_noise(w, h, raw, seed=seed) == _scalar_reference(
            w, h, raw, seed
        ), (seed, lines)
