"""Type3 (user-defined) fonts — q67: glyphs are /CharProcs content
streams and /Encoding /Differences is the only code→glyph map (ISO 32000
§9.6.5). Reference parity: the reference renders Type3 through fitz
(extract_text.py:27-36); the dependency-free rung decodes them via the
shared Differences/AGL machinery, and both twins must agree."""

from pdf_extraction_ai_agent_spark.fixtures.minipdf import write_type3_pdf
from pdf_extraction_ai_agent_spark.operators.extract import (
    extract_real_pdf_text,
)
from pdf_extraction_ai_agent_spark.oracle.reference_extractor import (
    extract_real_pdf,
)

BODY = "Claim C7\nBody quick brown fox 42\nTotal 7.00"


def test_type3_pdf_twins_matrix():
    """compression × /CharProcs form (indirect object vs inline dict):
    twins agree and the roundtrip is the identity; the raw bytes carry
    the text only at REMAPPED high codes (a tokenizer ignoring the
    Differences table would emit high-latin-1 garbage)."""
    for compress in (False, True):
        for ref in (False, True):
            pdf = write_type3_pdf([BODY], compress=compress, charprocs_ref=ref)
            if not compress:
                assert b"Claim" not in pdf  # remapped, not latin-1
            etext, eocr = extract_real_pdf_text(pdf)
            otext, oocr = extract_real_pdf(pdf.decode("latin-1"))
            assert (etext, eocr) == (otext, oocr), (compress, ref)
            assert etext == "--- PAGE 1 ---\n" + BODY
            assert eocr is False


def test_type3_glyph_procs_are_invisible_to_both_walks():
    """The /CharProcs streams (path fills, BT-free by construction) must
    contribute NO text: the engine's page walk never follows /CharProcs,
    and the oracle's file-order stream walk skips textless streams. The
    extracted text is exactly the page text — nothing extra."""
    pdf = write_type3_pdf([BODY])
    assert b" d0" in pdf  # genuine glyph procs present
    etext, _ = extract_real_pdf_text(pdf)
    assert etext.count("\n") == BODY.count("\n") + 1  # marker + 3 lines


def test_type3_unknown_glyph_bails_both_sides():
    """A /Differences entry outside the AGL subset (a truly custom
    pictograph) must BAIL both twins — wrong text never beats no text.
    In-sandbox the engine's library chain is absent, so the bail
    surfaces as RuntimeError on both sides."""
    import pytest

    pdf = write_type3_pdf([BODY])
    bad = pdf.replace(b"/C ", b"/zq9 ", 1)  # one glyph name → unknown
    with pytest.raises(RuntimeError):
        extract_real_pdf_text(bad)
    with pytest.raises(RuntimeError):
        extract_real_pdf(bad.decode("latin-1"))


def test_type3_multipage():
    pdf = write_type3_pdf([BODY, BODY.replace("7", "9")], compress=True)
    etext, _ = extract_real_pdf_text(pdf)
    otext, _ = extract_real_pdf(pdf.decode("latin-1"))
    assert etext == otext
    assert "--- PAGE 2 ---" in etext
    assert "Claim C9" in etext


def test_hybrid_reference_files_extract_like_classic():
    """Hybrid-reference form (ISO 32000 §7.5.8.4 — classic xref + an xref
    STREAM the trailer names via /XRefStm, Acrobat's compat shape): both
    twins extract a hybrid bit-identically to its classic source, across
    plain / compressed / tagged / Type3 carriers."""
    from pdf_extraction_ai_agent_spark.fixtures.minipdf import (
        make_hybrid_reference,
        write_minimal_pdf,
        write_tagged_pdf,
    )

    carriers = [
        write_minimal_pdf([BODY]),
        write_minimal_pdf([BODY], compress=True, tj_arrays=True),
        write_type3_pdf([BODY], compress=True),
        write_tagged_pdf(
            [[(72, 720, "Claim C1"), (320, 730, "Part two")]],
            artifact="pg",
        ),
    ]
    for classic in carriers:
        hybrid = make_hybrid_reference(classic)
        assert b"/XRefStm" in hybrid
        assert extract_real_pdf_text(hybrid) == extract_real_pdf_text(classic)
        assert extract_real_pdf(hybrid.decode("latin-1")) == extract_real_pdf(
            classic.decode("latin-1")
        )
