"""F9/F10 — carrier extraction from document text and from filenames.

Reference: text_lob_llm_extractor.py:69-82 (_extract_carrier_from_text),
:85-135 (_extract_carrier_from_filename). Pure Catalyst expressions — the
filename token scan (stop at the first stop-word, keep ≤4 non-trivial
tokens) is expressed with array ops instead of a Python loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .normalize import CARRIER_TEXT_PATS

# filename patterns (text_lob_llm_extractor.py:92-96, 107-110)
FILENAME_SUFFIX_PATS = [
    r"(?i)\b([A-Z][A-Za-z0-9 &'.\-/]+(?:Insurance|Ins|Corp|Corporation|Company|Co|LLC|Inc|Group|Mutual|Assurance|Underwriters))\b",
    r"(?i)\b([A-Z][A-Za-z0-9 &'.\-/]+(?:Life|Casualty|Property|Marine|Fire|Auto|Motor))\b",
]
KNOWN_CARRIER_PATS = [
    r"(?i)\b(State Farm|Allstate|Progressive|Geico|USAA|Farmers|Liberty Mutual|Travelers|Nationwide|American Family)\b",
    r"(?i)\b(AIG|Chubb|Zurich|AXA|Allianz|MetLife|Prudential|New York Life|Northwestern Mutual)\b",
]
STOP_WORDS = [
    "loss", "run", "report", "claims", "claim", "extract", "extracted",
    "output", "input", "file", "data", "export", "import", "processed",
    "claude", "text", "ocr", "image", "pdf", "doc", "document",
]


def carrier_from_text(text: Column) -> Column:
    """First carrier-pattern hit with the len>2 guard
    (text_lob_llm_extractor.py:76-81); NULL when nothing qualifies."""
    cands = []
    for p in CARRIER_TEXT_PATS:
        v = F.trim(F.regexp_extract(text, p, 1))
        cands.append(F.when(F.length(v) > 2, v))
    return F.coalesce(*cands)


def carrier_from_filename(path: Column) -> Column:
    """Filename heuristic: stem cleanup → insurer-suffix regexes → known
    carriers → leading-token scan (stop-word cut, len>1, non-digit, ≤4)."""
    stem = F.regexp_replace(F.element_at(F.split(path, "/"), -1), r"\.[A-Za-z0-9]+$", "")
    stem = F.trim(F.regexp_replace(stem, "[_\\-.]", " "))

    pattern_hits = []
    for p in FILENAME_SUFFIX_PATS + KNOWN_CARRIER_PATS:
        v = F.trim(F.regexp_extract(stem, p, 1))
        pattern_hits.append(F.when(F.length(v) > 2, v))

    tokens = F.split(stem, " +")
    stop_arr = F.array(*[F.lit(s) for s in STOP_WORDS])
    stop_positions = F.filter(
        F.sequence(F.lit(1), F.size(tokens)),
        lambda i: F.array_contains(stop_arr, F.lower(F.element_at(tokens, i))),
    )
    cut = F.when(F.size(stop_positions) > 0, F.element_at(stop_positions, 1) - 1).otherwise(
        F.size(tokens)
    )
    prefix = F.slice(tokens, 1, cut)
    name_parts = F.slice(
        F.filter(prefix, lambda t: (F.length(t) > 1) & ~t.rlike(r"^\d+$")), 1, 4
    )
    token_scan = F.when(F.size(name_parts) > 0, F.array_join(name_parts, " "))

    return F.coalesce(*pattern_hits, token_scan)
