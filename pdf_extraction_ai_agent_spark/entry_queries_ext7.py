"""Query pack 8: training-data curation (operators/curation.py).

q47 — deterministic train/val/test split with per-split counts (stable
hash-bucket membership, the reproducible alternative to sample()).
q48 — benchmark decontamination: per-document fraction of distinct 3-gram
hashes appearing in a deterministic eval subset's gram inventory; the eval
docs themselves surface at contamination 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries_ext import _SHINGLES_SQL, _WORDS_SQL, _docs, _md5l
from .operators import curation


def q47_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc split labels + the rollup that audits the realized ratios
    (bucket assignment is the operator; the count is the evidence)."""
    out = curation.deterministic_split(_docs(spark, sf_dir))
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def _q47_sql() -> str:
    h = _md5l("'split:split:' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM (SELECT doc_id, ({h}) % 100 AS b FROM documents)
GROUP BY 1
"""


def q48_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval set = every 97th doc (deterministic); report docs with any
    overlap, worst first (ties by doc_id) — the audit view a
    decontamination pass feeds."""
    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    out = curation.contamination(docs, ev)
    return out.filter(F.col("n_contaminated") > 0).select(
        "doc_id", "n_grams", "n_contaminated", "contamination"
    )


def _q48_sql() -> str:
    return f"""
WITH g AS (
  SELECT doc_id, unnest(list_distinct(list_filter({_SHINGLES_SQL}, x -> x <> ''))) AS sh
  FROM (SELECT doc_id, {_WORDS_SQL.format(v='text')} AS w FROM documents)
),
gh AS (SELECT doc_id, {_md5l('sh')} AS h FROM g),
ev AS (SELECT DISTINCT h FROM gh WHERE doc_id % 97 = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM gh GROUP BY 1),
hits AS (
  SELECT doc_id, COUNT(*) AS n_contaminated
  FROM gh WHERE h IN (SELECT h FROM ev)
  GROUP BY 1
)
SELECT s.doc_id, s.n_grams, h.n_contaminated,
       ROUND(CAST(h.n_contaminated AS DOUBLE) / s.n_grams, 6) AS contamination
FROM sizes s JOIN hits h USING (doc_id)
"""


EXT7_QUERIES = {
    "q47_deterministic_split": q47_deterministic_split,
    "q48_contamination": q48_contamination,
}


def ext7_oracles() -> dict[str, str]:
    return {
        "q47_deterministic_split": _q47_sql(),
        "q48_contamination": _q48_sql(),
    }
