"""Entry queries, extension pack 9 (round 7): the EXECUTED OCR slice.

q69 drives the scanned-document path end to end, in-sandbox and under
the ORACLE GATE: per document a genuine scanned PDF is written (pages
carry ONLY a grayscale image XObject rendered from the deterministic
spec.OCR_FONT_5X7 bitmaps — no text layer), the extraction rung yields
an empty page and trips the <OCR_MIN_CHARS ``needs_ocr`` flag on BOTH
twins, and the REAL Spark OCR operator (operators/ocr.py
``with_ocr_fallback``) recovers the text by template match — the
in-sandbox stand-in for the reference's rasterize→pytesseract fallback
(src/claim_extractor/extract_text.py:18-24). The DuckDB twin predicts
the recovered text straight from the table, so the gate proves
scan→raster→extract→OCR is the identity on semantics. Honest scope:
the fixture OCR rung reads generated scans only; real-world scans still
need the OCR stack on a cluster image (impl='real'/'auto').

q70 is the REALISM rung (ROADMAP r7 item 5): the same roundtrip over
scans degraded with deterministic salt-and-pepper noise — background
specks plus up to spec.OCR_NEAREST_MAX_D flipped pixels inside each
glyph cell. The exact matcher falls through (by design: its ink-run
segmentation cannot survive background noise) and the nearest-template
matcher with a confidence threshold recovers the text; the noise
generator guarantees recoverability cell-by-cell, so the DuckDB twin
still predicts the exact output and the oracle gate stays hard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries_ext import _docs
from .entry_queries_ext7 import PINNED_PAYLOAD_BUILDERS

EXT9_QUERIES: dict = {}
_EXT9_ORACLES: dict = {}


def ext9_oracles() -> dict[str, str]:
    return dict(_EXT9_ORACLES)


def _payload_q69(doc_id: int, text: str) -> bytes:
    from .fixtures.scanned import scannable_text, write_scanned_pdf

    body = ("BODY " + scannable_text(text)).strip()
    return write_scanned_pdf(
        [[f"CLAIM C{doc_id}", body, f"TOTAL {doc_id % 97}.00"]]
    )


def _payload_q70(doc_id: int, text: str) -> bytes:
    """A NOISY scan (q70, the OCR realism rung): deterministic
    salt-and-pepper over the rendered page, seeded by doc_id. The noise
    is recovery-safe by construction (fixtures/scanned.py::add_scan_noise
    keeps every degraded cell strictly nearest its true template), so the
    DuckDB twin can still predict the recovered text from the table —
    the gate checks the nearest-template matcher, not luck."""
    from .fixtures.scanned import scannable_text, write_scanned_pdf

    body = ("NOISE " + scannable_text(text)).strip()
    return write_scanned_pdf(
        [[f"NOISY N{doc_id}", body, f"AMOUNT {doc_id % 89}.25"]],
        noise_seed=doc_id,
    )


def _scan_roundtrip(payload_builder):
    """scan bytes → extract (empty page + needs_ocr) → with_ocr_fallback
    (the flag-guarded map-only operator, impl='fixture') → text."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        import pandas as pd

        from .operators.extract import extract_real_pdf_text
        from .operators.ocr import with_ocr_fallback

        def kernel(batches):
            for pdf in batches:
                rows = []
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    doc_id = int(doc_id)
                    payload = payload_builder(
                        doc_id, str(text)
                    ).decode("latin-1")
                    t, ocr = extract_real_pdf_text(payload)
                    rows.append((doc_id, payload, t, ocr))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "text", "extracted_text", "needs_ocr",
                    ],
                )

        ext = _docs(spark, sf_dir).select("doc_id", "text").mapInPandas(
            kernel,
            schema="doc_id long, text string, extracted_text string, "
                   "needs_ocr boolean",
        )
        out = with_ocr_fallback(ext, impl="fixture")
        return out.select(
            "doc_id", "extracted_text", "needs_ocr",
            F.col("error").alias("ocr_error"),
        )

    return run


q69_scanned_pdf_ocr_roundtrip = _scan_roundtrip(_payload_q69)
q70_noisy_scan_ocr_roundtrip = _scan_roundtrip(_payload_q70)


# the charset class mirrors spec.OCR_FONT_CHARSET (A-Z 0-9 # , - . / : sp);
# keep the transform in lockstep with fixtures/scanned.py::scannable_text
_Q69_SQL = r"""
WITH parts AS (
  SELECT doc_id,
         'CLAIM C' || CAST(doc_id AS VARCHAR) AS l1,
         trim('BODY ' || trim(regexp_replace(
             upper(trim(regexp_replace(substr(text, 1, 30), '\s+', ' ', 'g'))),
             '[^A-Z0-9 #,./:-]', '', 'g'))) AS l2,
         'TOTAL ' || CAST(doc_id % 97 AS VARCHAR) || '.00' AS l3
  FROM documents
)
SELECT doc_id,
       l1 || chr(10) || l2 || chr(10) || l3 AS extracted_text,
       TRUE AS needs_ocr,
       CAST(NULL AS VARCHAR) AS ocr_error
FROM parts
"""


# q70's twin predicts the SAME recovered text as a clean scan would give:
# add_scan_noise guarantees nearest-template recovery by construction, so
# only the line constants and the noise seed differ from the q69 shape
_Q70_SQL = r"""
WITH parts AS (
  SELECT doc_id,
         'NOISY N' || CAST(doc_id AS VARCHAR) AS l1,
         trim('NOISE ' || trim(regexp_replace(
             upper(trim(regexp_replace(substr(text, 1, 30), '\s+', ' ', 'g'))),
             '[^A-Z0-9 #,./:-]', '', 'g'))) AS l2,
         'AMOUNT ' || CAST(doc_id % 89 AS VARCHAR) || '.25' AS l3
  FROM documents
)
SELECT doc_id,
       l1 || chr(10) || l2 || chr(10) || l3 AS extracted_text,
       TRUE AS needs_ocr,
       CAST(NULL AS VARCHAR) AS ocr_error
FROM parts
"""


EXT9_QUERIES["q69_scanned_pdf_ocr_roundtrip"] = q69_scanned_pdf_ocr_roundtrip
_EXT9_ORACLES["q69_scanned_pdf_ocr_roundtrip"] = _Q69_SQL
PINNED_PAYLOAD_BUILDERS["q69_scanned_pdf_ocr_roundtrip"] = _payload_q69
EXT9_QUERIES["q70_noisy_scan_ocr_roundtrip"] = q70_noisy_scan_ocr_roundtrip
_EXT9_ORACLES["q70_noisy_scan_ocr_roundtrip"] = _Q70_SQL
PINNED_PAYLOAD_BUILDERS["q70_noisy_scan_ocr_roundtrip"] = _payload_q70
