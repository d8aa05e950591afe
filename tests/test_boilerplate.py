"""C4-style boilerplate filtering (q81): line-level keep rules (terminal
punctuation, minimum word count, no javascript) + document-level drops
(minimum kept lines, lorem ipsum, braces) — spec-data rules, map-only
array-HOF plan (no shuffle)."""

import pytest

from pdf_extraction_ai_agent_spark.operators.textstats import boilerplate_filter


@pytest.fixture(scope="module")
def spark():
    from pdf_extraction_ai_agent_spark.session import get_spark

    return get_spark(master="local[4]")


def test_line_rules_hand_golden(spark):
    doc = "\n".join([
        "This sentence has plenty of words and ends well.",   # keep
        "Too short.",                                          # < 5 words
        "this one has enough words but no terminal mark",      # no punct
        "Please enable JavaScript to continue reading here.",  # javascript
        "Trailing spaces still count as punctuated lines.   ", # keep (rtrim)
        'He said "quotes count as terminal punctuation here."',# keep
    ])
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    row = boilerplate_filter(df).collect()[0]
    assert row["n_lines"] == 6
    assert row["n_kept"] == 3
    assert row["cleaned_text"].split("\n") == [
        "This sentence has plenty of words and ends well.",
        "Trailing spaces still count as punctuated lines.   ",
        'He said "quotes count as terminal punctuation here."',
    ]
    assert row["doc_kept"] is True  # 3 kept == threshold, no bad substrings


def test_doc_rules(spark):
    three_good = (
        "One decent sentence that clearly passes every rule.\n"
        "Another decent sentence that clearly passes every rule.\n"
        "A third decent sentence that clearly passes every rule."
    )
    rows = [
        (1, three_good),
        (2, three_good + "\nSprinkle of Lorem Ipsum in the footer."),  # doc drop
        (3, three_good + "\nvar f = () => { return 1; }"),             # doc drop
        (4, "Only two good sentences live in this document.\n"
            "The second one is here and also fine."),                  # < 3 kept
        (5, ""),                                                       # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in boilerplate_filter(df).collect()}
    assert got[1]["doc_kept"] is True
    # bad substrings drop the DOC but their lines still count per line rules
    assert got[2]["doc_kept"] is False and got[2]["n_kept"] == 4
    assert got[3]["doc_kept"] is False and got[3]["n_kept"] == 3
    assert got[4]["doc_kept"] is False and got[4]["n_kept"] == 2
    assert got[5]["doc_kept"] is False and got[5]["n_kept"] == 0
    assert got[5]["n_lines"] == 1 and got[5]["cleaned_text"] == ""


def test_boilerplate_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    phys = boilerplate_filter(df)._jdf.queryExecution().sparkPlan().toString()
    assert "Exchange" not in phys and "Join" not in phys
