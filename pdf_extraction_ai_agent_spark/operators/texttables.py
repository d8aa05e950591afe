"""Text-layout table DETECTION (stream mode) — the reference's Camelot/
Tabula fallback chain detects tables inside already-extracted text
(camelot_extractor.py:11-14, tabula_extractor.py:12-14: stream flavor =
whitespace-aligned columns, no ruling lines). The engine's q27/q31 paths
normalize tables that already arrive as grids; this operator finds the
grids inside raw text.

Detection contract (deterministic, SQL-twin-able):
- a line is TABULAR iff its trimmed text splits into ≥ 2 non-empty cells
  on the column delimiter (2+ spaces, tab, or pipe — the same delimiter
  family as the WC heuristic, wc_tabular.py);
- a TABLE is a maximal run of ≥ 2 consecutive tabular lines
  (gaps-and-islands);
- output: one row per table line with (table_idx, row_pos, n_cols,
  cells_pipe) — the first row of each table is its header candidate.

Plan shape: posexplode lines (narrow) → two windows over doc_id (the
islands rank + per-island count/position). Fully declarative — no UDF; at
scale both windows shuffle on doc_id only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CELL_SPLIT_PAT = r"\s{2,}|\t|\|"


def detect_text_tables(
    df: DataFrame,
    text_col: str = "extracted_text",
    doc_col: str = "doc_id",
    min_rows: int = 2,
) -> DataFrame:
    """(doc_id, table_idx, row_pos, n_cols, cells_pipe) per detected table
    line. table_idx is 0-based per document in line order; row_pos is
    0-based within the table."""
    lines = df.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    )
    cells = F.filter(
        F.split(F.trim(F.col("line")), CELL_SPLIT_PAT), lambda x: x != ""
    )
    flagged = lines.select(
        "doc_id", "line_no", cells.alias("cells"), (F.size(cells) >= 2).alias("tabular")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("line_no")
    tab = (
        flagged.filter(F.col("tabular"))
        .withColumn("island", F.col("line_no") - F.row_number().over(w_doc))
    )
    w_isl = Window.partitionBy("doc_id", "island")
    w_isl_ord = w_isl.orderBy("line_no")
    sized = tab.withColumn("island_rows", F.count(F.lit(1)).over(w_isl)).filter(
        F.col("island_rows") >= min_rows
    )
    # table_idx: dense rank of the island within the doc, in line order
    w_doc_isl = Window.partitionBy("doc_id").orderBy("island")
    return sized.select(
        "doc_id",
        (F.dense_rank().over(w_doc_isl) - 1).alias("table_idx"),
        (F.row_number().over(w_isl_ord) - 1).alias("row_pos"),
        F.size("cells").alias("n_cols"),
        F.array_join("cells", "|").alias("cells_pipe"),
    )
