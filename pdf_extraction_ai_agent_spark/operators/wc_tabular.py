"""X6 — the WC tabular-line heuristic: find a header line (≥2 known column
keys), then greedily assign delimiter-split tokens of the lines below it by
token-shape clues.

Reference: text_lob_llm_extractor.py:401-495 (heuristic_extract_wc) — the
one genuinely stateful scan in the reference (SURVEY X6), so it stays in a
vectorized-batch pandas UDF rather than being tortured into window
functions: the per-document scan is sequential, but documents are
independent and the stage is map-only (no shuffle).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

from .normalize import CARRIER_TEXT_PATS, EVALUATION_DATE_PAT

WC_ROW_TYPE = StructType(
    [
        StructField("claim_number", StringType()),
        StructField("loss_date", StringType()),
        StructField("Indemnity_paid_loss", StringType()),
        StructField("Medical_paid_loss", StringType()),
        StructField("Indemnity_reserve", StringType()),
        StructField("Medical_reserve", StringType()),
        StructField("ALAE", StringType()),
    ]
)
WC_RESULT_TYPE = StructType(
    [
        StructField("evaluation_date", StringType()),
        StructField("carrier", StringType()),
        StructField("claims", ArrayType(WC_ROW_TYPE)),
    ]
)

# header keys per column (text_lob_llm_extractor.py:422-430)
_HEADER_MAP = {
    "claim": ["claim number", "claim no", "claim #", "claim id"],
    "loss_date": ["loss date", "date of loss", "accident date"],
    "indemnity_paid": ["indemnity paid", "indemnity paid loss", "ind paid"],
    "medical_paid": ["medical paid", "medical paid loss", "med paid"],
    "indemnity_reserve": ["indemnity reserve", "ind reserve"],
    "medical_reserve": ["medical reserve", "med reserve"],
    "alae": ["alae", "allocated loss adjustment expense", "expense"],
}
_EVAL_PATS = [
    re.compile(r"Evaluation\s*Date\s*[:\-]\s*([0-9]{1,2}[\-/][0-9]{1,2}[\-/][0-9]{2,4})", re.I),
    re.compile(r"As\s*of\s*Date\s*[:\-]\s*([A-Za-z]{3,9}\s+\d{1,2},\s*\d{4})", re.I),
]
_CARRIER_RES = [re.compile(p.replace("(?i)", ""), re.I) for p in CARRIER_TEXT_PATS]
_SPLIT_RE = re.compile(r"\s{2,}|\t|\|")
_CLAIM_TOKEN = re.compile(r"\b\d{5,}\b|[A-Za-z]\d{4,}")
_DATE_TOKEN = re.compile(r"\b\d{1,2}[\-/]\d{1,2}[\-/]\d{2,4}\b")
_MONEY_RE = re.compile(r"[-$]?\d{1,3}(?:,\d{3})*(?:\.\d+)?|[-$]?\d+(?:\.\d+)?")


def _parse_money(value: str) -> str:
    m = _MONEY_RE.findall(value or "")
    return m[0] if m else (value or "").strip()


def _extract_wc(text: str) -> dict:
    carrier = ""
    for rex in _CARRIER_RES:
        m = rex.search(text)
        if m and len(m.group(1).strip()) > 2:
            carrier = m.group(1).strip()
            break
    evaluation_date = ""
    for rex in _EVAL_PATS:
        m = rex.search(text)
        if m:
            evaluation_date = m.group(1).strip()
            break

    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    header_idx = -1
    for i, ln in enumerate(lines):
        lower = ln.lower()
        hits = sum(1 for keys in _HEADER_MAP.values() if any(k in lower for k in keys))
        if hits >= 2:
            header_idx = i
            break

    claims: list[dict] = []
    if header_idx != -1:
        for ln in lines[header_idx + 1 :]:
            parts = [p.strip() for p in _SPLIT_RE.split(ln) if p.strip()]
            if len(parts) < 3:
                continue
            row = {k: "" for k in ["claim_number", "loss_date", "Indemnity_paid_loss",
                                   "Medical_paid_loss", "Indemnity_reserve",
                                   "Medical_reserve", "ALAE"]}
            for p in parts:
                pl = p.lower()
                if not row["claim_number"] and _CLAIM_TOKEN.search(p):
                    row["claim_number"] = p
                elif not row["loss_date"] and _DATE_TOKEN.search(p):
                    row["loss_date"] = p
                elif any(k in pl for k in _HEADER_MAP["indemnity_paid"]) or "indemnity" in pl:
                    row["Indemnity_paid_loss"] = _parse_money(p)
                elif any(k in pl for k in _HEADER_MAP["medical_paid"]) or "medical" in pl:
                    row["Medical_paid_loss"] = _parse_money(p)
                elif any(k in pl for k in _HEADER_MAP["indemnity_reserve"]):
                    row["Indemnity_reserve"] = _parse_money(p)
                elif any(k in pl for k in _HEADER_MAP["medical_reserve"]):
                    row["Medical_reserve"] = _parse_money(p)
                elif "alae" in pl or any(k in pl for k in _HEADER_MAP["alae"]):
                    row["ALAE"] = _parse_money(p)
            if row["claim_number"]:
                claims.append(row)

    return {"evaluation_date": evaluation_date, "carrier": carrier, "claims": claims}


def with_wc_extraction(df: DataFrame, text_col: str = "extracted_text") -> DataFrame:
    """Appends a `wc` struct column (evaluation_date, carrier, claims[])."""
    import pandas as pd

    def batch(texts):  # unannotated: struct-returning pandas UDF (the
        # pd.Series hints would be resolved against MODULE globals under
        # future-annotations — ocr.py precedent; keeps pandas off the
        # registry import path)
        out = [_extract_wc(t or "") for t in texts]
        return pd.DataFrame(out)

    udf = F.pandas_udf(batch, WC_RESULT_TYPE)
    return df.withColumn("wc", udf(F.col(text_col)))


def wc_claims(df: DataFrame, text_col: str = "extracted_text",
              keep_cols: list[str] | None = None) -> DataFrame:
    """One row per parsed WC claim with the envelope replicated (X4/J1)."""
    keep_cols = keep_cols if keep_cols is not None else ["conv_id", "turn_idx"]
    w = with_wc_extraction(df, text_col)
    return w.select(
        *keep_cols,
        F.col("wc.evaluation_date").alias("evaluation_date"),
        F.col("wc.carrier").alias("carrier"),
        F.posexplode_outer("wc.claims").alias("claim_pos", "claim"),
    ).filter(F.col("claim").isNotNull()).select(
        *keep_cols, "evaluation_date", "carrier", "claim_pos", "claim.*"
    )
