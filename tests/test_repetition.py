"""Gopher-style repetition counters (q79): duplicate-line counts and
characters, most-frequent word-bigram share — exact integer semantics
pinned on a hand-computed corpus, plus the no-cartesian plan shape."""

import pytest

from pdf_extraction_ai_agent_spark.operators.textstats import repetition_scores


@pytest.fixture(scope="module")
def spark():
    from pdf_extraction_ai_agent_spark.session import get_spark

    return get_spark(master="local[4]")


def test_repetition_counters_golden(spark):
    rows = [
        # doc 1: 'ad ad' line twice (5 chars each), one unique line;
        # bigrams of 'ad ad buy now ad ad': [ad ad, ad buy, buy now,
        # now ad, ad ad] -> top 'ad ad' = 2, total 5
        (1, "ad ad\nbuy now\nad ad"),
        # doc 2: no duplicate lines, every bigram unique
        (2, "alpha beta\ngamma delta"),
        # doc 3: empty text -> all zero
        (3, ""),
        # doc 4: blank lines are excluded from line stats
        (4, "x\n\n\nx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    assert got[1] == {
        "doc_id": 1, "n_lines": 3, "dup_lines": 2,
        "line_chars": 17, "dup_line_chars": 10,
        "top_bigram_count": 2, "n_bigrams": 5,
    }
    assert got[2] == {
        "doc_id": 2, "n_lines": 2, "dup_lines": 0,
        "line_chars": 21, "dup_line_chars": 0,
        "top_bigram_count": 1, "n_bigrams": 3,
    }
    assert got[3] == {
        "doc_id": 3, "n_lines": 0, "dup_lines": 0,
        "line_chars": 0, "dup_line_chars": 0,
        "top_bigram_count": 0, "n_bigrams": 0,
    }
    # doc 4: lines 'x','x' (blank excluded) -> both duplicates; words
    # collapse to 'x x' -> one bigram
    assert got[4] == {
        "doc_id": 4, "n_lines": 2, "dup_lines": 2,
        "line_chars": 2, "dup_line_chars": 2,
        "top_bigram_count": 1, "n_bigrams": 1,
    }


def test_repetition_plan_has_partial_aggs_and_no_cartesian(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    phys = (
        repetition_scores(df)._jdf.queryExecution().sparkPlan().toString()
    )
    assert "Cartesian" not in phys
    assert "BroadcastNestedLoop" not in phys
    assert phys.count("partial_") >= 4  # map-side combine on both legs
