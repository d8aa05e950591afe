"""/ActualText marked-content replacement (round 7, ISO 32000 §14.9.4).

Inside `/Span <</ActualText (…)>> BDC … EMC` the shown bytes are
presentation; the ActualText is the content. Both twins show the
replacement once — at the first enclosed show's origin, or at the
sequence end when it encloses no show — and swallow the enclosed shows;
out-of-scope shapes (nested /ActualText, unbalanced sequences,
indirect/undecodable values) bail on BOTH sides rather than emit the
replaced bytes. The tagged (logical-order) rung does not model
replacement, so it falls back to the geometric walk on such files.
Reference behavior: the library chain reads these via fitz/pdfplumber
(extract_text.py:39-66); this is the dependency-free rung's model of
the same §14.9.4 contract.
"""

from pdf_extraction_ai_agent_spark.entry_queries_ext9 import _payload_q77
from pdf_extraction_ai_agent_spark.operators import pdftext
from tests.test_ctm_pages import _one_page_pdf, _twins


def test_q77_variants_twin_parity_and_text():
    for doc_id in range(12):
        pdf = _payload_q77(doc_id, "Body words for doc sample")
        eng, orc = _twins(pdf)
        assert eng != "BAIL" and eng == orc, doc_id
        assert eng[0] == (
            f"--- PAGE 1 ---\nAct A{doc_id}\nText Body words for doc sample"
            f"\nSum {doc_id % 67}.40"
        )


def test_replacement_records_at_first_show_origin():
    content = (
        b"BT /F1 12 Tf 72 720 Td (Line one) Tj "
        b"0 -16 Td /Span <</ActualText (REPL)>> BDC (shown-) Tj "
        b"0 -16 Td (rest) Tj EMC 0 -16 Td (tail) Tj ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(content)) == [[
        (72.0, 720.0, "Line one"),
        (72.0, 704.0, "REPL"),  # first-show origin; later shows swallowed
        (72.0, 672.0, "tail"),
    ]]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"


def test_empty_sequence_emits_replacement_at_emc():
    content = (
        b"BT /F1 12 Tf 72 720 Td (A) Tj "
        b"0 -16 Td /Span <</ActualText (GHOST)>> BDC EMC ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(content)) == [[
        (72.0, 720.0, "A"), (72.0, 704.0, "GHOST"),
    ]]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"


def test_replacement_merges_into_surrounding_run():
    """No position op around the sequence → the pdfminer box model merges
    lead + replacement + tail into ONE run on both twins."""
    content = (
        b"BT /F1 12 Tf 72 720 Td (Text ) Tj "
        b"/Span <</ActualText (fi)>> BDC (\\002) Tj (\\003) Tj EMC "
        b"(ne) Tj ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(content)) == [[
        (72.0, 720.0, "Text fine"),
    ]]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"


def test_utf16_value_and_stringaware_dict_hop():
    """UTF-16BE (BOM) hex values decode; a literal value containing
    escaped parens and a `>>` run must not truncate the property-list
    hop on either twin (string-aware dict scan)."""
    utf16 = (
        b"BT /F1 12 Tf 72 720 Td "
        b"/Span <</ActualText <FEFF00450058>>> BDC (zz) Tj EMC ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(utf16)) == [[
        (72.0, 720.0, "EX"),
    ]]
    tricky = (
        b"BT /F1 12 Tf 72 720 Td "
        b"/Span <</ActualText (a \\(x\\) >> b)>> BDC (q) Tj EMC ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(tricky)) == [[
        (72.0, 720.0, "a (x) >> b"),
    ]]
    for content in (utf16, tricky):
        eng, orc = _twins(_one_page_pdf(content))
        assert eng == orc != "BAIL"


def test_quote_show_inside_sequence_advances_before_replacement():
    content = (
        b"BT /F1 12 Tf 16 TL 72 720 Td (Q1) Tj "
        b"/Span <</ActualText (QREP)>> BDC (x) ' EMC ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(content)) == [[
        (72.0, 720.0, "Q1"), (72.0, 704.0, "QREP"),
    ]]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"


def test_plain_and_named_sequences_stay_transparent():
    """BDC property lists WITHOUT /ActualText — inline (/MCID) or named
    (indirect) — keep today's transparent behavior."""
    content = (
        b"BT /F1 12 Tf 72 720 Td /P <</MCID 0>> BDC (plain) Tj EMC "
        b"0 -16 Td /Span /MyProps BDC (asis) Tj EMC ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(content)) == [[
        (72.0, 720.0, "plain"), (72.0, 704.0, "asis"),
    ]]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"


def test_out_of_scope_shapes_bail_on_both_twins():
    """Nested /ActualText, a sequence left open at page end, and an
    undecodable UTF-16 value: the rung must never emit replaced bytes —
    both twins bail (wrong text never beats no text)."""
    shapes = [
        # nested /ActualText sequences
        b"BT /F1 12 Tf 72 720 Td /Span <</ActualText (A)>> BDC "
        b"/Span <</ActualText (B)>> BDC (x) Tj EMC EMC ET",
        # unbalanced at page end
        b"BT /F1 12 Tf 72 720 Td /Span <</ActualText (A)>> BDC (x) Tj ET",
        # odd UTF-16 payload after the BOM
        b"BT /F1 12 Tf 72 720 Td /Span <</ActualText <FEFF004500>>> BDC "
        b"(x) Tj EMC ET",
        # indirect (non-string) value
        b"BT /F1 12 Tf 72 720 Td /Span <</ActualText 9 0 R>> BDC "
        b"(x) Tj EMC ET",
    ]
    for content in shapes:
        pdf = _one_page_pdf(content)
        assert pdftext.tokenize_pdf_runs(pdf) is None, content
        eng, orc = _twins(pdf)
        assert eng == orc == "BAIL", content


def test_tagged_rung_falls_back_to_geometric_on_actualtext():
    """A page carrying /ActualText is out of the logical walk's scope on
    both twins — tokenize_pdf_tagged returns None and the tagged oracle
    falls back to the geometric scan, which models the replacement."""
    from pdf_extraction_ai_agent_spark.operators.extract import (
        extract_tagged_pdf_text,
    )
    from pdf_extraction_ai_agent_spark.oracle.reference_extractor import (
        extract_tagged_pdf,
    )

    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"/Span <</ActualText (REPL)>> BDC (shown) Tj EMC ET"
    )
    pdf = _one_page_pdf(content)
    assert pdftext.tokenize_pdf_tagged(pdf) is None
    eng = extract_tagged_pdf_text(pdf)
    orc = extract_tagged_pdf(pdf.decode("latin-1"))
    assert eng == orc
    assert "REPL" in eng[0] and "shown" not in eng[0]
