"""The resumable curation job (jobs/run_curation.py internals): crafted
documents exercise every rule branch, the global dedup drop list caches
per run-group, and resume skips completed buckets."""

import json

from pyspark.sql import functions as F

GOOD = (
    "The quick brown fox jumps over the lazy dog near the river bank today. "
    "It was seen by the keeper who wrote a long note about the event there. "
    "Every line in this report ends with proper punctuation as required. "
) * 3  # > 50 words for the Gopher word-count floor


def _docs_df(spark):
    rows = [
        # multi-line punctuated doc that passes C4 + Gopher
        (1, "\n".join([GOOD.strip(), GOOD.strip(), GOOD.strip()])),
        # exact duplicate of doc 1 (normalized) → dedup loser
        (2, "\n".join([GOOD.strip(), GOOD.strip(), GOOD.strip()])),
        # single line, no terminal punctuation → fails C4
        (3, "short unpunctuated single line of text"),
        # PII-laden but otherwise passing doc
        (4, "\n".join([GOOD.strip(), "Contact: a@b.example.com today please.",
                       GOOD.strip(), GOOD.strip()])),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curation_plan_verdicts(spark):
    from pdf_extraction_ai_agent_spark.plans.curation_job import (
        curation_plan,
        exact_dup_losers,
    )

    docs = _docs_df(spark)
    losers = exact_dup_losers(docs)
    assert [r["doc_id"] for r in losers.collect()] == [2]
    out = {r["doc_id"]: r.asDict()
           for r in curation_plan(docs, losers).collect()}
    assert out[1]["c4_kept"] and out[1]["gopher_pass"] and out[1]["kept"]
    assert out[2]["is_exact_dup"] and not out[2]["kept"]
    assert not out[3]["c4_kept"] and not out[3]["kept"]
    assert out[4]["kept"] and out[4]["n_emails"] == 1
    assert "<EMAIL>" in out[4]["scrubbed_text"]
    # rules knob: dedup-only gating keeps doc 3 (C4 becomes diagnostic)
    only_dedup = {r["doc_id"]: r["kept"]
                  for r in curation_plan(docs, losers, rules=("dedup",)).collect()}
    assert only_dedup == {1: True, 2: False, 3: True, 4: True}


def test_curation_job_resume_and_loser_cache(spark, tmp_path):
    from pdf_extraction_ai_agent_spark.plans.curation_job import (
        cached_exact_dup_losers,
        curation_plan,
    )
    from pdf_extraction_ai_agent_spark.plans.lineage import run_with_lineage

    docs = _docs_df(spark)
    lineage = str(tmp_path / "lineage")
    out_path = str(tmp_path / "out")
    losers = cached_exact_dup_losers(spark, docs, lineage, run_group="t")
    m1 = run_with_lineage(
        spark, docs, lambda df: curation_plan(df, losers),
        out_path=out_path, lineage_path=lineage, run_group="t",
        n_buckets=4, bucket_group_size=2, key_col="doc_id",
    )
    assert sum(g["rows"] for g in m1["groups"]) == 4
    # rerun: all buckets skipped, loser cache read back (not recomputed)
    losers2 = cached_exact_dup_losers(spark, docs, lineage, run_group="t")
    assert [r["doc_id"] for r in losers2.collect()] == [2]
    m2 = run_with_lineage(
        spark, docs, lambda df: curation_plan(df, losers2),
        out_path=out_path, lineage_path=lineage, run_group="t",
        n_buckets=4, bucket_group_size=2, key_col="doc_id",
    )
    assert m2["skipped_buckets"] == 4 and m2["groups"] == []
    total = spark.read.parquet(out_path)
    assert total.count() == 4
    assert total.where("kept").count() == 2
