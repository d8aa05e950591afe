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


# ---------------------------------------------------------------------------
# q42 — text-layout table detection (Camelot/Tabula stream-mode fallback)
# ---------------------------------------------------------------------------


def q42_detect_text_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prose+table documents built from lineitem; the detector must find
    the embedded whitespace-aligned table and skip the lone tabular line
    (min 2 consecutive rows)."""
    from .operators.texttables import detect_text_tables

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(F.col("l_linenumber") <= 3)
    row_line = F.concat(
        F.lit("L"), F.col("l_orderkey"), F.lit("-"), F.col("l_linenumber"),
        F.lit("    "), F.date_format("l_shipdate", "yyyy-MM-dd"),
        F.lit("    "), F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
    )
    doc = li.groupBy(F.col("l_orderkey").alias("doc_id")).agg(
        F.concat(
            F.lit("Report for order.\nSummary follows below.\n"
                  "Item    Ship Date    Amount\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("l_linenumber", row_line.alias("l")))),
                    lambda s: s["l"],
                ),
                "\n",
            ),
            F.lit("\nNotes: reviewed by desk.\nRef    "),
            F.col("l_orderkey").cast("string"),
        ).alias("extracted_text")
    )
    return detect_text_tables(doc)


def _q42_sql(doc_cte: str | None = None) -> str:
    """``doc_cte`` overrides the fixture CTE (must yield (doc_id,
    extracted_text)) — used by the randomized differential test."""
    if doc_cte is None:
        doc_cte = """
  SELECT l_orderkey AS doc_id,
         'Report for order.' || chr(10) || 'Summary follows below.' || chr(10) ||
         'Item    Ship Date    Amount' || chr(10) ||
         string_agg(line, chr(10) ORDER BY l_linenumber, line) ||
         chr(10) || 'Notes: reviewed by desk.' || chr(10) || 'Ref    ' ||
         CAST(l_orderkey AS VARCHAR) AS extracted_text
  FROM (
    SELECT l_orderkey, l_linenumber,
           'L' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) ||
           '    ' || strftime(l_shipdate, '%Y-%m-%d') ||
           '    ' || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS line
    FROM lineitem WHERE l_linenumber <= 3
  )
  GROUP BY l_orderkey
"""
    return rf"""
WITH doc AS ({doc_cte}),
lines AS (
  SELECT doc_id, u.i - 1 AS line_no,
         list_filter(regexp_split_to_array(trim(ls[CAST(u.i AS INTEGER)]), '\s{{2,}}|\t|\|'),
                     x -> x <> '') AS cells
  FROM (SELECT doc_id, string_split(extracted_text, chr(10)) AS ls FROM doc) t,
       LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i) u
),
tab AS (
  SELECT doc_id, line_no, cells,
         line_no - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY line_no) AS island
  FROM lines WHERE len(cells) >= 2
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY doc_id, island) AS island_rows
  FROM tab
)
SELECT doc_id,
       CAST(DENSE_RANK() OVER (PARTITION BY doc_id ORDER BY island) - 1 AS INTEGER) AS table_idx,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id, island ORDER BY line_no) - 1 AS INTEGER) AS row_pos,
       CAST(len(cells) AS INTEGER) AS n_cols,
       array_to_string(cells, '|') AS cells_pipe
FROM sized WHERE island_rows >= 2
"""


# ---------------------------------------------------------------------------
# q43 — multi-way dim-join rollup (claims-cost by region/carrier-nation):
# the analytic reporting shape over the full dim chain (lineitem ⋈ orders ⋈
# customer ⋈ nation ⋈ region), exact DECIMAL sums, broadcast dims
# ---------------------------------------------------------------------------


def q43_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("c_custkey"), F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )
    fact = li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
    return (
        fact.join(F.broadcast(dims), fact.o_custkey == dims.c_custkey)
        .groupBy("region", "nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").cast("double").alias("total_price"),
            # sum the FULL-scale (scale-4) products — downscaling per row is
            # not portable (DuckDB decimal casts truncate, Spark rounds
            # HALF_UP); the scale-4 sum is exact in both engines
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("revenue"),
        )
    )


_Q43_SQL = """
SELECT r_name AS region, n_name AS nation,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       CAST(SUM(
             CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
           ) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


EXT6_QUERIES = {
    "q41_excel_sheets": q41_excel_sheets,
    "q42_detect_text_tables": q42_detect_text_tables,
    "q43_region_rollup": q43_region_rollup,
}


def ext6_oracles() -> dict[str, str]:
    return {
        "q41_excel_sheets": _Q41_SQL,
        "q42_detect_text_tables": _q42_sql(),
        "q43_region_rollup": _Q43_SQL,
    }
