"""OCR fallback execution (reference: extract_text.py:18-24 — when the
text layer yields <40 stripped chars, rasterize each page and run
pytesseract; the engine's extract stage sets ``needs_ocr`` on exactly that
trigger, this operator executes the fallback).

Same dispatch pattern as the real-PDF branch and multimodal decode:
``impl='real'`` needs pdf2image/PyMuPDF + pytesseract (not in this sandbox
image — raises a documented RuntimeError that the per-row error channel
captures); ``impl='stub'`` is a deterministic fake that exercises the full
Spark plumbing (flag-filtered mapInPandas, union back) so the plan shape
and schema are tested here and only the codec swap happens on a cluster
image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long_py


def ocr_payload_real(payload) -> str:
    """Rasterize + tesseract, per the reference chain. Raises when the OCR
    stack is absent (captured by the error channel, never a job abort)."""
    data = payload if isinstance(payload, (bytes, bytearray)) else str(payload).encode(
        "latin-1", errors="ignore"
    )
    try:
        import fitz  # type: ignore
        import pytesseract  # type: ignore
        from PIL import Image  # type: ignore
    except ImportError:
        raise RuntimeError(
            "needs_ocr row but the OCR stack (PyMuPDF + pytesseract + PIL) is "
            "not installed — install on the cluster image "
            "(reference: src/claim_extractor/extract_text.py:18-24)"
        ) from None
    import io

    doc = fitz.open(stream=data, filetype="pdf")
    out = []
    for i in range(doc.page_count):
        pix = doc[i].get_pixmap(dpi=200)
        img = Image.open(io.BytesIO(pix.tobytes("png")))
        out.append(pytesseract.image_to_string(img))
    return "\n".join(out).strip()


def ocr_payload_stub(payload) -> str:
    """Deterministic fake OCR output (hash-derived) for plumbing tests."""
    s = payload if isinstance(payload, str) else bytes(payload).decode("latin-1", "ignore")
    return f"OCR-STUB {md5_long_py(s) % 100000:05d}"


def with_ocr_fallback(
    df: DataFrame,
    payload_col: str = "text",
    flag_col: str = "needs_ocr",
    text_col: str = "extracted_text",
    impl: str = "real",
) -> DataFrame:
    """Replace ``text_col`` with OCR output on rows where ``flag_col`` is
    true. Map-only: flagged rows run the OCR kernel where they live, the
    (typically huge) unflagged majority passes through untouched — no
    shuffle, no union split (a single guarded kernel avoids re-partitioning
    the 99.9% clean side)."""
    import pandas as pd

    fn = ocr_payload_real if impl == "real" else ocr_payload_stub

    def _ocr_batch(payload, flag):  # unannotated: struct-returning pandas UDF
        txts, errs = [], []
        for p, f in zip(payload, flag):
            if not f:
                txts.append(None)
                errs.append(None)
                continue
            try:
                txts.append(fn(p))
                errs.append(None)
            except Exception as e:  # error channel, never a job abort
                txts.append(None)
                errs.append(f"{type(e).__name__}: {e}"[:500])
        return pd.DataFrame({"txt": txts, "err": errs})

    ocr_udf = F.pandas_udf(_ocr_batch, "struct<txt: string, err: string>")
    res = ocr_udf(F.col(payload_col), F.col(flag_col))
    out = df.withColumn("_ocr", res)
    return (
        out.withColumn(
            text_col,
            F.when(
                F.col(flag_col) & F.col("_ocr.txt").isNotNull(), F.col("_ocr.txt")
            ).otherwise(F.col(text_col)),
        )
        .withColumn(
            "error",
            F.coalesce(F.col("_ocr.err"), F.col("error"))
            if "error" in df.columns
            else F.col("_ocr.err"),
        )
        .drop("_ocr")
    )
