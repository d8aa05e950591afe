"""PII scrubbing (q80): SSN/email/phone masking with per-class counts —
sequential order (spec.PII_ORDER) with counts on the progressively
scrubbed text, fixed masks, map-only Catalyst plan."""

import pytest

from pdf_extraction_ai_agent_spark.operators.textstats import pii_scrub


@pytest.fixture(scope="module")
def spark():
    from pdf_extraction_ai_agent_spark.session import get_spark

    return get_spark(master="local[4]")


def test_pii_masks_and_counts(spark):
    rows = [
        (1, "mail me at a.b+c@sub.example.org thanks"),
        (2, "call (415) 555-0100 or 415-555-0199"),
        (3, "ssn 123-45-6789 but phone 123-456-7890"),
        (4, "clean text, nothing to mask"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    assert got[1]["scrubbed_text"] == "mail me at <EMAIL> thanks"
    assert (got[1]["n_ssns"], got[1]["n_emails"], got[1]["n_phones"]) == (0, 1, 0)
    assert got[2]["scrubbed_text"] == "call <PHONE> or <PHONE>"
    assert got[2]["n_phones"] == 2
    # the SSN shape (3-2-4) must never be eaten by the phone shape (3-3-4)
    assert got[3]["scrubbed_text"] == "ssn <SSN> but phone <PHONE>"
    assert (got[3]["n_ssns"], got[3]["n_phones"]) == (1, 1)
    assert got[4]["scrubbed_text"] == rows[3][1]
    assert (got[4]["n_ssns"], got[4]["n_emails"], got[4]["n_phones"]) == (0, 0, 0)


def test_pii_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    phys = pii_scrub(df)._jdf.queryExecution().sparkPlan().toString()
    assert "Exchange" not in phys and "Join" not in phys
