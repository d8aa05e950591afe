"""X3 — overlapping char-window chunking with newline snapping, and
C4 — the strategy-selection router.

Reference:
- X3: text_lob_llm_extractor.py:307-344 (_chunk_text_for_llm): windows of
  max_chars with overlap_chars, end snapped back to the last newline in the
  window when one exists past the midpoint. Defaults 15000/800
  (text_lob_llm_extractor.py:13-14).
- C4: adaptive_table_extractor.py:91-125 — complexity score 0-10 from page
  count / borders / merged cells / spacing → route to a strategy.

X3 exists for LLM context limits the Spark engine doesn't have; it's kept
for parity and for bounded-memory downstream consumers. The window loop is
data-dependent so it runs in an Arrow pandas UDF returning
array<struct<chunk_idx,start,end,text>> → posexplode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

DEFAULT_MAX_CHARS = 15_000
DEFAULT_OVERLAP_CHARS = 800

CHUNK_TYPE = ArrayType(
    StructType(
        [
            StructField("chunk_idx", IntegerType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("text", StringType()),
        ]
    )
)


def _chunk_one(text: str, max_chars: int, overlap: int) -> list[dict]:
    if not text:
        return []
    out = []
    n = len(text)
    start = 0
    idx = 0
    while start < n:
        end = min(start + max_chars, n)
        if end < n:
            # snap back to the last newline past the window midpoint
            nl = text.rfind("\n", start, end)
            if nl != -1 and nl > start + max_chars // 2:
                end = nl
        out.append({"chunk_idx": idx, "start": start, "end": end, "text": text[start:end]})
        idx += 1
        if end >= n:
            break
        start = max(end - overlap, start + 1)
    return out


def chunk_text(df: DataFrame, text_col: str = "extracted_text",
               keep_cols: list[str] | None = None,
               max_chars: int = DEFAULT_MAX_CHARS,
               overlap_chars: int = DEFAULT_OVERLAP_CHARS) -> DataFrame:
    """One row per overlapping chunk (chunk_idx preserves document order —
    the A7 merge key)."""
    keep_cols = keep_cols if keep_cols is not None else ["conv_id", "turn_idx"]
    import pandas as pd

    def batch(texts):  # unannotated: pandas UDF (pd.Series hints would
        # resolve against MODULE globals under future-annotations — ocr.py
        # precedent; keeps pandas off the registry import path)
        return pd.Series(
            [_chunk_one(t or "", max_chars, overlap_chars) for t in texts],
            index=texts.index, dtype=object,
        )

    udf = F.pandas_udf(batch, CHUNK_TYPE)
    out = df.select(*keep_cols, F.explode(udf(F.col(text_col))).alias("ch"))
    return out.select(
        *keep_cols,
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.start").alias("start"),
        F.col("ch.end").alias("end"),
        F.col("ch.text").alias("chunk"),
    )


# --- C4: strategy router -----------------------------------------------------


def complexity_score_col(page_count: Column, border_ratio: Column, merged_ratio: Column,
                         avg_spacing: Column) -> Column:
    """0-10 complexity score (adaptive_table_extractor.py:91-113 shape):
    pages (0-3) + borders (0-3) + merged (0-2) + spacing (0-2)."""
    pages_pts = F.least(F.ceil(page_count / F.lit(10)).cast("int"), F.lit(3))
    border_pts = F.when(border_ratio > 0.6, 3).when(border_ratio > 0.3, 2).when(border_ratio > 0.05, 1).otherwise(0)
    merged_pts = F.when(merged_ratio > 0.2, 2).when(merged_ratio > 0.05, 1).otherwise(0)
    spacing_pts = F.when(avg_spacing > 3.0, 2).when(avg_spacing > 1.5, 1).otherwise(0)
    return (pages_pts + border_pts + merged_pts + spacing_pts).cast("int")


def route_strategy_col(score: Column) -> Column:
    """score → extraction strategy (adaptive_table_extractor.py:115-125):
    simple ruled tables → table parsers; mid → text path; complex → image."""
    return (
        F.when(score <= 3, F.lit("camelot_tabula"))
        .when(score <= 6, F.lit("claude_text"))
        .otherwise(F.lit("claude_image"))
    )
