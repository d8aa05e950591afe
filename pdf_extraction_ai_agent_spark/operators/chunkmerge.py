"""A7 — chunk-merge: first non-empty envelope value by chunk order, claims
lists concatenated with duplicates DELIBERATELY kept (SO3).

Reference: text_lob_llm_extractor.py:359-388 — 'Keep duplicates as
requested' (:383-384); first non-empty evaluation_date/carrier wins
(:378-381). Order-sensitivity is anchored to an explicit chunk-order key
(SURVEY §7 risk 3): we sort collected structs by chunk_idx instead of
trusting partition iteration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _first_nonempty_by_order(order_col: str, value_col: str):
    arr = F.array_sort(F.collect_list(F.struct(F.col(order_col), F.col(value_col).alias("v"))))
    nonempty = F.filter(arr, lambda s: s["v"].isNotNull() & (s["v"] != ""))
    return F.when(F.size(nonempty) > 0, F.element_at(nonempty, 1)["v"]).otherwise(F.lit(""))


def merge_chunks(df: DataFrame, doc_col: str = "doc_id", order_col: str = "chunk_idx",
                 eval_col: str = "evaluation_date", carrier_col: str = "carrier",
                 claims_col: str = "claims") -> DataFrame:
    """(doc, chunk_idx, evaluation_date, carrier, claims:array) →
    one row per doc with merged envelope + concatenated claims."""
    claims_sorted = F.array_sort(
        F.collect_list(F.struct(F.col(order_col), F.col(claims_col).alias("c")))
    )
    merged_claims = F.flatten(F.transform(claims_sorted, lambda s: s["c"]))
    return df.groupBy(F.col(doc_col).alias("doc_id")).agg(
        _first_nonempty_by_order(order_col, eval_col).alias("evaluation_date"),
        _first_nonempty_by_order(order_col, carrier_col).alias("carrier"),
        merged_claims.alias("claims"),
    )
