"""Event sessionization — gap-based session ids over the events stream
table (the classic stateful-looking operator expressed as pure windows:
lag → gap flag → cumulative sum; no UDF, no custom state).

Scale: one shuffle on user_id; sessions never cross users so the window is
embarrassingly partitionable. (Streaming twin: session_window() in
Structured Streaming — same semantics.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    prev_ts = F.lag(ts_col).over(w)
    # TIMESTAMP_NTZ can't cast straight to long — go via timestamp (UTC)
    secs = F.col(ts_col).cast("timestamp").cast("long")
    prev_secs = prev_ts.cast("timestamp").cast("long")
    new_session = prev_ts.isNull() | (secs - prev_secs > gap_minutes * 60)
    return events.withColumn(
        "session_seq", F.sum(F.when(new_session, 1).otherwise(0)).over(w)
    ).withColumn(
        "session_id",
        F.concat(F.col(user_col).cast("string"), F.lit("#"), F.col("session_seq").cast("string")),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup: bounds, event count, value total (decimal)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(18,6)").alias("total_value"),
    )
