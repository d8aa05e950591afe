"""Pipeline-level OCR execution (r7): extract_pipeline(ocr=…) runs the
flag-guarded OCR fallback inside the job's pipeline and re-scans spans
from the final text — the reference's always-on fallback
(extract_text.py:18-24), opt-in here via jobs/run_extraction.py --ocr."""

from pyspark.sql import functions as F

from pdf_extraction_ai_agent_spark.fixtures.scanned import write_scanned_pdf


def _rows(spark):
    scan = write_scanned_pdf(
        [["CLAIM NO: AB-12345", "REASON: FIRE DAMAGE"]]
    ).decode("latin-1")
    rows = [
        ("c1", 1, "u", scan, "pdf_upload"),
        ("c1", 2, "u", "Claim no: CD-77777 filed.\nplain text body here", "t"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01")))


def test_pipeline_ocr_fixture_replaces_text_and_respans(spark):
    from pdf_extraction_ai_agent_spark.plans.pipeline import extract_pipeline

    df = _rows(spark)
    out = {
        r["turn_idx"]: r
        for r in extract_pipeline(
            df, with_fields=True, with_lob=False, ocr="fixture"
        ).collect()
    }
    scanned = out[1]
    assert scanned["needs_ocr"] is True
    assert scanned["extracted_text"] == "CLAIM NO: AB-12345\nREASON: FIRE DAMAGE"
    assert scanned["error"] is None
    # spans re-scanned from the FINAL (OCR) text
    fields = {s["field"]: s for s in scanned["spans"]}
    assert fields["claim_number"]["value"] == "AB-12345"
    assert scanned["extracted_text"][
        fields["claim_number"]["start"] : fields["claim_number"]["end"]
    ] == "AB-12345"
    # downstream field parse reads the OCR'd text too
    assert scanned["claim_number"] == "AB-12345"
    # the clean row is untouched relative to the flag-only pipeline
    base = {
        r["turn_idx"]: r
        for r in extract_pipeline(
            df, with_fields=True, with_lob=False
        ).collect()
    }
    assert out[2] == base[2]


def test_pipeline_ocr_default_keeps_flag_only_contract(spark):
    from pdf_extraction_ai_agent_spark.plans.pipeline import extract_pipeline

    df = _rows(spark)
    out = {
        r["turn_idx"]: r
        for r in extract_pipeline(df, with_fields=False, with_lob=False).collect()
    }
    assert out[1]["needs_ocr"] is True
    assert out[1]["extracted_text"] == "--- PAGE 1 ---"  # no OCR executed
