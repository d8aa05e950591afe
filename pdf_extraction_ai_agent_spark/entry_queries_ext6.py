"""Query pack 7: the native .xlsx multi-sheet source (S8).

q41 builds a deterministic 3-sheet workbook from the ``nation`` table (one
LOB sheet per ``n_nationkey % 3``), ships it as a binary payload through the
stdlib xlsx source (sources/excel.py), and emits the aligned rows; the
DuckDB oracle recomputes the same rows from ``nation`` directly — gating the
write→zip→parse→explode round trip end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.excel import excel_sheet_rows, write_minimal_xlsx

_LOBS = ["AUTO", "WC", "GL"]
_HEADER = ["Account", "Policy", "Nation Key"]


def workbook_bytes_from_nation(rows: list[tuple[int, str]]) -> bytes:
    """Deterministic multi-sheet workbook: sheet per LOB, header + one row
    per nation (ordered by key). ``rows`` = [(n_nationkey, n_name), ...]."""
    sheets = []
    for li, lob in enumerate(_LOBS):
        data = [_HEADER] + [
            [name, f"P-{key}", str(key)]
            for key, name in sorted(rows)
            if key % 3 == li
        ]
        sheets.append((lob, data))
    return write_minimal_xlsx(sheets)


def q41_excel_sheets(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rows = [(int(r.n_nationkey), str(r.n_name)) for r in
            nation.select("n_nationkey", "n_name").collect()]  # 25 rows: fixture build
    payload = workbook_bytes_from_nation(rows)
    wb = spark.createDataFrame([("wb.xlsx", bytearray(payload))],
                               "file_name string, content binary")
    out = excel_sheet_rows(wb)
    return out.select(
        "file_name", "sheet_pos", "sheet_name", "row_pos",
        F.element_at("cells", 1).alias("account"),
        F.element_at("cells", 2).alias("policy"),
        F.element_at("cells", 3).alias("nation_key"),
    )


_Q41_SQL = """
WITH data AS (
  SELECT CAST(n_nationkey % 3 AS INTEGER) AS sheet_pos,
         (['AUTO', 'WC', 'GL'])[(n_nationkey % 3) + 1] AS sheet_name,
         CAST(ROW_NUMBER() OVER (PARTITION BY n_nationkey % 3 ORDER BY n_nationkey)
              AS INTEGER) AS row_pos,
         n_name AS account,
         'P-' || CAST(n_nationkey AS VARCHAR) AS policy,
         CAST(n_nationkey AS VARCHAR) AS nation_key
  FROM nation
),
hdr AS (
  SELECT DISTINCT sheet_pos, sheet_name, CAST(0 AS INTEGER) AS row_pos,
         'Account' AS account, 'Policy' AS policy, 'Nation Key' AS nation_key
  FROM data
)
SELECT 'wb.xlsx' AS file_name, * FROM hdr
UNION ALL
SELECT 'wb.xlsx' AS file_name, * FROM data
"""


EXT6_QUERIES = {
    "q41_excel_sheets": q41_excel_sheets,
}


def ext6_oracles() -> dict[str, str]:
    return {
        "q41_excel_sheets": _Q41_SQL,
    }
