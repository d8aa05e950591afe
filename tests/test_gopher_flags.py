"""Gopher quality composite (q83): per-rule hand goldens and the
map-only plan pin."""

import pytest

from pdf_extraction_ai_agent_spark.operators.textstats import (
    GOPHER_REQ_STOPWORDS,
    gopher_quality_flags,
)


@pytest.fixture(scope="module")
def spark():
    from pdf_extraction_ai_agent_spark.session import get_spark

    return get_spark(master="local[4]")


def _passing_text() -> str:
    # 66 plain words (11 x 6) incl. >= 2 required stopwords, mean length in [3,10]
    base = "the quick brown fox jumps over that lazy dog with ease "
    return (base * 6).strip()


def test_rule_goldens(spark):
    good = _passing_text()
    rows = [
        (1, good),
        (2, "short of words"),                          # word count < 50
        (3, good + " " + "#" * 1 + " #### ## # # # # #"),  # symbol ratio
        (4, good + "\n" + "\n".join(["- b"] * 40)),     # >90% bullet lines
        (5, good + "\n" + "\n".join(["trails off..."] * 2)),  # ellipsis > 0.3
        (6, " ".join(["12345"] * 60)),                  # alpha ratio + stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(df).collect()}
    assert got[1]["gopher_pass"] is True
    assert got[1]["n_words"] == 66
    assert got[1]["mean_word_len"] == pytest.approx(3.9, abs=0.5)
    assert got[1]["n_req_stop"] == 3  # the, that, with
    assert got[2]["gopher_pass"] is False and got[2]["n_words"] == 3
    assert got[3]["gopher_pass"] is False and got[3]["symbol_ratio"] > 0.1
    assert got[4]["gopher_pass"] is False and got[4]["bullet_ratio"] > 0.9
    assert got[5]["gopher_pass"] is False and got[5]["ellipsis_ratio"] > 0.3
    assert got[6]["gopher_pass"] is False
    assert got[6]["alpha_word_ratio"] == 0.0 and got[6]["n_req_stop"] == 0


def test_required_stopwords_are_distinct_presence(spark):
    # 'the' repeated 60 times: presence of ONE required stopword, not 60
    df = spark.createDataFrame([(1, " ".join(["the"] * 60))],
                               "doc_id long, text string")
    row = gopher_quality_flags(df).collect()[0]
    assert row["n_req_stop"] == 1
    assert row["gopher_pass"] is False  # < 2 required stopwords
    assert len(GOPHER_REQ_STOPWORDS) == 8


def test_gopher_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    phys = gopher_quality_flags(df)._jdf.queryExecution().sparkPlan().toString()
    assert "Exchange" not in phys and "Join" not in phys
