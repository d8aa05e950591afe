"""with_spans=False — manual column pruning through the UDF boundary
(r7): Catalyst prunes around a pandas UDF but cannot reach inside it, so
the kernel offers the prune explicitly. The default (spans on) remains
the north-rule contract and is what every golden test pins."""

import pandas as pd

from pdf_extraction_ai_agent_spark.fixtures.transcripts import (
    generate_transcripts,
)
from pdf_extraction_ai_agent_spark.operators.extract import (
    extract_turn_batch,
)


def test_kernel_with_spans_false_matches_otherwise():
    pdf = generate_transcripts(n_convs=40, seed=11)
    full = extract_turn_batch(pdf["text"], pdf["tool"])
    pruned = extract_turn_batch(pdf["text"], pdf["tool"], with_spans=False)
    assert "spans" not in pruned.columns
    for col in ("extracted_text", "needs_ocr", "payload_kind", "error"):
        pd.testing.assert_series_equal(full[col], pruned[col])


def test_pipeline_with_spans_false_prunes_column_and_udf_work(spark):
    from pdf_extraction_ai_agent_spark.plans.pipeline import extract_pipeline

    df = spark.createDataFrame(
        [("c", i, "u", f"Claim C{i}\nreason: fire damage $12.50", "t", None)
         for i in range(30)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = extract_pipeline(df, with_fields=False, with_lob=False,
                           with_spans=False)
    assert "spans" not in out.columns
    rows = out.collect()
    assert len(rows) == 30 and all(r["extracted_text"] for r in rows)
    # the default contract is unchanged
    full = extract_pipeline(df, with_fields=False, with_lob=False)
    assert "spans" in full.columns
