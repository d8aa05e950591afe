"""Per-row error channel: a poison document yields an `error` row (reference
cli.py:41-49 semantics), never a failed batch/job; healthy rows in the same
batch are unaffected."""

import pandas as pd
import pytest

from pdf_extraction_ai_agent_spark.operators import extract as ex


def test_poison_row_isolated(monkeypatch):
    real = ex._extract_html_batch

    def poisoned(s: pd.Series) -> pd.Series:
        if s.str.contains("POISON").any():
            raise ValueError("decoder exploded")
        return real(s)

    monkeypatch.setattr(ex, "_extract_html_batch", poisoned)

    texts = pd.Series([
        "<html>\n<body>\n<p>good content block that is long enough to keep</p>\n</body>\n</html>",
        "<html>\n<body>\n<p>POISON content block that is long enough to keep</p>\n</body>\n</html>",
        "plain text row untouched by the html branch",
    ])
    tools = pd.Series(["html_paste", "html_paste", ""])
    out = ex.extract_turn_batch(texts, tools)

    # healthy html row recovered by the per-row fallback
    assert pd.isna(out.iloc[0]["error"])
    assert "good content block" in out.iloc[0]["extracted_text"]
    # poison row: error recorded, empty text, batch did not raise
    assert "ValueError" in out.iloc[1]["error"]
    assert out.iloc[1]["extracted_text"] == ""
    # unrelated branch untouched
    assert pd.isna(out.iloc[2]["error"])
    assert out.iloc[2]["extracted_text"].startswith("plain text")


def test_no_error_on_clean_corpus(transcripts_pdf):
    out = ex.extract_turn_batch(transcripts_pdf["text"], transcripts_pdf["tool"])
    assert out["error"].isna().all()


def test_observe_metrics(spark, transcripts_df):
    from pyspark.sql import Observation

    from pdf_extraction_ai_agent_spark.plans.pipeline import extract_pipeline

    obs = Observation("extract_metrics")
    extract_pipeline(
        transcripts_df, with_fields=False, with_lob=False, observation=obs
    ).count()
    got = obs.get
    assert got["turns"] == transcripts_df.count()
    assert got["error_turns"] == 0
    assert got["needs_ocr_turns"] > 0
    assert got["extracted_chars"] > 0
