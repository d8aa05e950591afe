"""Entry queries, extension pack 8 (round 6): simple-font encoding
coverage — named Annex D base encodings and subset fonts.

Reference parity: the reference reads these real-world font shapes
through pdfplumber/fitz (src/claim_extractor/extract_text.py:27-36,
which resolves subset/symbol fonts via the library); this engine's
dependency-free tokenizer rung models them directly (operators/pdftext.py
`_simple_font_handle`) with the oracle char-scanner as the independent
twin. Same oracle-gate contract as the q49 family: build genuine PDF
bytes per document, extract them back, and prove the loop is the
identity against a DuckDB twin computed straight from the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .entry_queries_ext7 import (
    PINNED_PAYLOAD_BUILDERS,
    _docs,
    _ROUNDTRIP_SCHEMA,
    _roundtrip_kernel,
)

# ---------------------------------------------------------------------------
# q59 — simple-font ENCODING MATRIX round trip under the ORACLE GATE: the
# q55-style single-page contract over three font shapes rotated per doc:
#   doc_id%3==0 → SUBSET font: /Differences names glyphs g3, g5, … (no
#     unicode meaning) and only the font's own 1-byte /ToUnicode CMap
#     carries the text — the Camelot-style shape VERDICT r5 item 5 named;
#   doc_id%3==1 → /Encoding /WinAnsiEncoding (cp1252-style bytes: curly
#     quotes / em-dash at 0x80–0x9F where latin-1 reading is WRONG);
#   doc_id%3==2 → /Encoding /MacRomanEncoding (high bytes differ from
#     latin-1 everywhere).
# The page text is decorated with “ ” — é ï (encodable under ALL three
# shapes, NOT ASCII) so the byte→char tables are provably applied; per-doc
# parities mix Flate compression, /Differences overlays on the base
# encodings, indirect encoding objects, and compressed CMaps.
# ---------------------------------------------------------------------------


def _q59_body(doc_id: int, text: str) -> str:
    norm30 = " ".join(str(text)[:30].split())
    return (
        f"Claim C{doc_id}\nBody “{norm30}” — naïve\nTotal {doc_id % 97}.00"
    )


def _payload_q59(doc_id: int, text: str) -> bytes:
    from .fixtures.minipdf import write_base_encoded_pdf, write_subset_font_pdf

    body = _q59_body(doc_id, text)
    k = doc_id % 3
    if k == 0:
        return write_subset_font_pdf(
            [body], compress=bool(doc_id % 2), cmap_compress=doc_id % 5 == 0
        )
    enc = "WinAnsiEncoding" if k == 1 else "MacRomanEncoding"
    return write_base_encoded_pdf(
        [body],
        encoding=enc,
        differences=doc_id % 2 == 0,
        indirect=doc_id % 5 == 0,
        compress=bool(doc_id % 2),
    )


def q59_font_encodings_pdf_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _docs(spark, sf_dir).select("doc_id", "text").mapInPandas(
        _roundtrip_kernel(_payload_q59), schema=_ROUNDTRIP_SCHEMA
    )


_Q59_SQL = r"""
WITH parts AS (
  SELECT doc_id,
         'Claim C' || CAST(doc_id AS VARCHAR) AS l1,
         'Body “' || trim(regexp_replace(substr(text, 1, 30), '\s+', ' ', 'g'))
           || '” — naïve' AS l2,
         'Total ' || CAST(doc_id % 97 AS VARCHAR) || '.00' AS l3
  FROM documents
)
SELECT doc_id,
       '--- PAGE 1 ---' || chr(10) || l1 || chr(10) || l2 || chr(10) || l3
         AS extracted_text,
       (len(trim(l1)) + len(trim(l2)) + len(trim(l3))) < 40 AS needs_ocr
FROM parts
"""


EXT8_QUERIES = {
    "q59_font_encodings_pdf_roundtrip": q59_font_encodings_pdf_roundtrip,
}

_EXT8_ORACLES = {
    "q59_font_encodings_pdf_roundtrip": _Q59_SQL,
}

PINNED_PAYLOAD_BUILDERS["q59_font_encodings_pdf_roundtrip"] = _payload_q59


def ext8_oracles() -> dict[str, str]:
    return dict(_EXT8_ORACLES)
