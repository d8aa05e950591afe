"""W1/W2 — stable turn ordering and positional pairing.

The north rule's core ordering contract: turn order within a conversation is
``row_number() over (partition by conv_id order by turn_idx, ts)`` —
well-defined under ANY parallelism, including duplicate ``turn_idx`` values
(tiebreak on ``ts``). Reference precedent: "claims should be in document
order" (claude_pdf_extractor.py:513, text_lob_llm_extractor.py:266);
positional scoring join (compare_models.py:49-52).

Scale note: the window shuffles by conv_id once; the heavy extraction UDF
runs on salted partitions *before* this window (extraction is per-turn
independent), so one multi-million-turn conversation never serializes the
map stage (SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_turn_pos(df: DataFrame, out_col: str = "turn_pos") -> DataFrame:
    """Stable 1-based position of each turn within its conversation."""
    w = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc(), F.col("ts").asc())
    return df.withColumn(out_col, F.row_number().over(w))


def positional_pairing(preds: DataFrame, truth: DataFrame, doc_col: str, order_cols: list[str]):
    """W2/J2 — `preds[i]` vs `truth[i]` as an equi-join on (doc, pos)
    (compare_models.py:46-59, keyed instead of list-positional)."""
    w = Window.partitionBy(doc_col).orderBy(*order_cols)
    p = preds.withColumn("pos", F.row_number().over(w))
    t = truth.withColumn("pos", F.row_number().over(w))
    return p.join(t, on=[doc_col, "pos"], how="inner")
