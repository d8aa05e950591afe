"""Sequence packing for training-data pipelines: concat-and-chunk token
offsets (the GPT-style "concatenate all documents, slice into fixed
context windows" prep step), computed as a SCALABLE global prefix sum.

A naive global running sum is `SUM(n) OVER (ORDER BY doc_id)` — a
single-partition window, the canonical scale-killer. This module uses the
two-phase pattern instead: deterministic contiguous doc_id buckets, one
small aggregation for per-bucket token totals (driver-side prefix over a
constant number of rows, broadcast back), then a per-bucket window cumsum
that parallelizes across buckets. Results are bucket-count-invariant: the
bucketing only shapes the physical plan, never the offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import BPE_ISH_PAT

DEFAULT_CTX = 2048
DEFAULT_BUCKETS = 64


def pack_sequences(df: DataFrame, ctx: int = DEFAULT_CTX,
                   n_buckets: int = DEFAULT_BUCKETS,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Global token offsets for concat-and-chunk sequence packing.

    Documents are concatenated in ``id_col`` order (ids must be unique —
    the `documents` table contract); each occupies the token span
    [start_offset, start_offset + n_tokens). Returns per document:
    n_tokens (BPE-ish count, textstats.BPE_ISH_PAT), start_offset, and
    the first/last ctx-sized sequence the span touches (empty documents
    pin to their boundary: first_seq == last_seq). All BIGINT — integer
    division throughout, no double rounding at any corpus size.

    Scale shape: one bounded eager pass at plan-build (MAX(id) + one sum
    per bucket, ≤ n_buckets rows collected — same bounded-stats class as
    the pipeline's salt probe), then a broadcast join of the bucket
    offsets and a window cumsum partitioned BY BUCKET, so the shuffle is
    keyed and parallel — no SinglePartition exchange anywhere in the
    returned plan (pinned by tests/test_packing.py).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PAT), 0))
        .cast("long").alias("n_tokens"),
    )

    max_id = toks.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        return toks.select(
            "doc_id", "n_tokens",
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("first_seq"),
            F.lit(0).cast("long").alias("last_seq"),
        )
    span = max(1, (int(max_id) + n_buckets) // n_buckets)  # ceil((max+1)/n)

    bucketed = toks.withColumn("bucket", (F.col("doc_id") / span).cast("long"))
    sums = {
        int(r["bucket"]): int(r["total"])
        for r in bucketed.groupBy("bucket").agg(
            F.sum("n_tokens").alias("total")).collect()
    }
    prefix, acc = [], 0
    for b in sorted(sums):
        prefix.append((b, acc))
        acc += sums[b]
    offsets = df.sparkSession.createDataFrame(
        prefix, "bucket long, bucket_off long")

    from pyspark.sql import Window
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = (
        bucketed
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id", "n_tokens",
            (F.col("bucket_off") + F.sum("n_tokens").over(w)
             - F.col("n_tokens")).alias("start_offset"),
        )
    )
    return packed.select(
        "doc_id", "n_tokens", "start_offset",
        F.expr(f"start_offset DIV {int(ctx)}").alias("first_seq"),
        F.expr(
            f"(start_offset + GREATEST(n_tokens, 1L) - 1L) DIV {int(ctx)}"
        ).alias("last_seq"),
    )
