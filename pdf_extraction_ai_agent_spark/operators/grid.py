"""X7 — Textract-style grid reconstruction + S9 sheet→pipe-text rendering.

Reference:
- X7: src/claim_extractor/textract_table_extractor.py:98-131 — CELL blocks
  carry (RowIndex, ColumnIndex, text); merged/duplicate cells at the same
  (row, col) are appended with a space (:122-127); the grid becomes
  headers = row 1, data = rows 2..n.
- S9: excel_lob_llm_extractor.py:55-65 — a sheet rendered as
  'SHEET: name\\nh1 | h2\\nv1 | v2' pipe-text.

Spark shape: groupBy(table, row) assembling cells into ordered arrays —
two hash aggregations, no pivot (column count is data-dependent), fully
codegen-compatible except the array sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cells_to_grid(cells: DataFrame, table_col: str = "table_id", row_col: str = "row_idx",
                  col_col: str = "col_idx", text_col: str = "cell_text") -> DataFrame:
    """(table_id, row_idx, col_idx, cell_text) → one row per table:
    (table_id, headers array<string>, data array<array<string>>).

    Duplicate (row, col) cells concatenate with ' ' in (row, col, text)
    order — the reference's merged-cell rule (textract_table_extractor.py:122-127).
    """
    merged = (
        cells.groupBy(
            F.col(table_col).alias("table_id"),
            F.col(row_col).alias("r"),
            F.col(col_col).alias("c"),
        )
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col(text_col))), " "
            ).alias("txt")
        )
    )
    rows = (
        merged.groupBy("table_id", "r")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("c"), F.col("txt")))),
                lambda s: s["txt"],
            ).alias("cells")
        )
    )
    grids = rows.groupBy("table_id").agg(
        F.array_sort(F.collect_list(F.struct(F.col("r"), F.col("cells")))).alias("rs")
    )
    return grids.select(
        "table_id",
        F.element_at(F.col("rs"), 1)["cells"].alias("headers"),
        F.transform(F.slice(F.col("rs"), 2, F.greatest(F.size("rs") - 1, F.lit(0))),
                    lambda s: s["cells"]).alias("data"),
    )


def grid_to_pipe_text(grids: DataFrame, name_col: str = "table_id") -> DataFrame:
    """S9 — 'SHEET: <name>' + pipe-joined header and data lines."""
    header_line = F.array_join(F.col("headers"), " | ")
    data_lines = F.array_join(
        F.transform(F.col("data"), lambda r: F.array_join(r, " | ")), "\n"
    )
    return grids.select(
        F.col(name_col).alias("sheet"),
        F.concat(
            F.lit("SHEET: "), F.col(name_col).cast("string"), F.lit("\n"),
            header_line, F.lit("\n"), data_lines
        ).alias("pipe_text"),
    )
