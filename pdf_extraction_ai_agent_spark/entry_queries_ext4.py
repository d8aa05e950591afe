"""Query pack 5: embedding-cosine near-dup (dedup family), IVF ANN
assignments, event sessionization."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import sessions, similarity


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# q36 — embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------

_NEARDUP_T = 0.35  # random-embedding corpus: top-of-distribution pairs


def q36_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=_NEARDUP_T
    )


_Q36_SQL = f"""
WITH base AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {similarity.QUANT}) AS BIGINT)) AS q
  FROM embeddings
)
SELECT a.vid AS id_a, b.vid AS id_b,
       ROUND(list_dot_product(a.q, b.q) /
             (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))), 6) AS cosine
FROM base a JOIN base b ON a.vid < b.vid
WHERE ROUND(list_dot_product(a.q, b.q) /
            (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q))), 6) >= {_NEARDUP_T}
"""


# ---------------------------------------------------------------------------
# q37 — IVF coarse-quantizer assignments (the ANN scale-path partitioner)
# ---------------------------------------------------------------------------


def q37_ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_assignments(_t(spark, sf_dir, "embeddings"), n_centroids=16)


_Q37_SQL = f"""
WITH base AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {similarity.QUANT}) AS BIGINT)) AS q
  FROM embeddings
),
cents AS (SELECT vid AS centroid_id, q AS cq FROM base ORDER BY vid LIMIT 16),
scored AS (
  SELECT vid, centroid_id,
         ROUND(list_dot_product(q, cq) /
               (sqrt(list_dot_product(q, q)) * sqrt(list_dot_product(cq, cq))), 6) AS cosine
  FROM base CROSS JOIN cents
),
ranked AS (
  SELECT vid, centroid_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cosine DESC, centroid_id ASC) AS rnk
  FROM scored
)
SELECT vid AS vec_id, centroid_id, cosine AS centroid_cosine
FROM ranked WHERE rnk = 1
"""


# ---------------------------------------------------------------------------
# q38 — gap-based sessionization + per-session rollup
# ---------------------------------------------------------------------------


def q38_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sessions.session_stats(_t(spark, sf_dir, "events"), gap_minutes=30)
    return out.select(
        "user_id", "session_seq",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )


_Q38_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
numbered AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_seq
"""


EXT4_QUERIES = {
    "q36_embedding_near_dups": q36_embedding_near_dups,
    "q37_ivf_assignments": q37_ivf_assignments,
    "q38_sessionize": q38_sessionize,
}


def ext4_oracles() -> dict[str, str]:
    return {
        "q36_embedding_near_dups": _Q36_SQL,
        "q37_ivf_assignments": _Q37_SQL,
        "q38_sessionize": _Q38_SQL,
    }
