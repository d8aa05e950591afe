"""Round-6 experiment (VERDICT r5 item 4): Arrow-prefiltered span scan.

The span stage (operators/extract.py::_spans_chunked) is ~51% of kernel
time and interpreter-bound per chunk: lower() + up to 6 literal `in`
checks + up to 4 regex searches + the date ladder. Hypothesis: hoist the
lowercase + literal prefilters onto pyarrow.compute (one C pass over ALL
chunks of a batch) and feed boolean masks into a residual Python loop
that only runs the regexes the masks allow.

Protocol: bit-exact output equality against `_spans_chunked`, then
best-of-5 timing over a generator-realistic batch. Gate (VERDICT): ship
only at >= 1.3x; otherwise record the measured ratio as a negative
result next to the round-5 ones in extract.py.

Run:  python scripts/exp_arrow_spans.py  (standalone, no Spark)
"""
from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

import pyarrow as pa
import pyarrow.compute as pc

from pdf_extraction_ai_agent_spark.fixtures.transcripts import (
    _claim_paragraph,  # the bench corpus's text source
)
from pdf_extraction_ai_agent_spark.operators.extract import (
    _DATES,
    _FIELD_RES,
    _RECORD_SPLIT,
    _norm_date_cached,
    _spans_chunked,
)


def _spans_arrow_batch(texts: list[str]) -> list[list[dict]]:
    """Arrow-prefiltered variant: one chunk-splitting pass collects every
    (text_idx, start, chunk); pyarrow lowers + literal-scans all chunks in
    C; the residual loop runs only the mask-approved regexes."""
    chunk_rows: list[int] = []
    chunk_starts: list[int] = []
    chunks: list[str] = []
    split_search = _RECORD_SPLIT.search
    for row, t in enumerate(texts):
        start = 0
        n = len(t)
        while start <= n:
            m = split_search(t, start)
            end = m.start() if m else n
            if end > start:
                chunk_rows.append(row)
                chunk_starts.append(start)
                chunks.append(t[start:end])
            if m is None:
                break
            start = m.end()

    arr = pc.utf8_lower(pa.array(chunks, type=pa.string()))
    # one mask per field: OR of its literal anchors, zero-copy to numpy
    masks = []
    for _field, _rex, lits in _FIELD_RES:
        m = pc.match_substring(arr, lits[0])
        for lit in lits[1:]:
            m = pc.or_(m, pc.match_substring(arr, lit))
        masks.append(m.to_numpy(zero_copy_only=False))

    out: list[list[dict]] = [[] for _ in texts]
    dates = _DATES
    norm_date = _norm_date_cached
    field_res = _FIELD_RES
    for j, chunk in enumerate(chunks):
        row = chunk_rows[j]
        start = chunk_starts[j]
        recs = out[row]
        for k, (field, rex, _lits) in enumerate(field_res):
            if not masks[k][j]:
                continue
            fm = rex.search(chunk)
            if fm:
                recs.append(
                    {"field": field, "start": start + fm.start(1),
                     "end": start + fm.end(1), "value": fm.group(1).strip()}
                )
        for pat in dates:
            cand = pat.search(chunk)
            if cand and norm_date(cand.group(1)):
                recs.append(
                    {"field": "date", "start": start + cand.start(1),
                     "end": start + cand.end(1), "value": cand.group(1).strip()}
                )
                break
    return out


def main() -> None:
    rng = random.Random(606)
    texts = []
    for _ in range(50_000):
        paras = [" ".join(_claim_paragraph(rng).split())
                 for _ in range(rng.randint(1, 4))]
        texts.append("\n\n".join(paras))

    base = [_spans_chunked(t) for t in texts[:2000]]
    arrw = _spans_arrow_batch(texts[:2000])
    assert base == arrw, "NOT bit-exact — experiment void"
    print("bit-exact on 2000-text sample: OK")

    def best_of(fn, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_cur = best_of(lambda: [_spans_chunked(t) for t in texts])
    t_arr = best_of(lambda: _spans_arrow_batch(texts))
    print(f"current  : {t_cur:.3f}s")
    print(f"arrow    : {t_arr:.3f}s")
    print(f"ratio    : {t_cur / t_arr:.3f}x  (gate: >= 1.3)")


if __name__ == "__main__":
    main()
