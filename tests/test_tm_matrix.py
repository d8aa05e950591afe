"""Non-translation Tm (round 7): the text matrix with a real linear part
— scaled/rotated watermarks and letterheads. Both twins track the linear
part: Td/TD deltas and the TL/T*/quote leading advance map through it in
TEXT space, positions record at the matrix origin. Sheared/singular Tm
bails on both sides; BT resets the text matrix to identity."""

from pdf_extraction_ai_agent_spark.entry_queries_ext9 import _payload_q74
from pdf_extraction_ai_agent_spark.operators import pdftext
from tests.test_ctm_pages import _one_page_pdf, _twins


def test_q74_variants_twin_parity_and_text():
    for doc_id in range(10):
        pdf = _payload_q74(doc_id, "Body words here")
        eng, orc = _twins(pdf)
        assert eng != "BAIL" and eng == orc, doc_id
        assert eng[0] == (
            f"--- PAGE 1 ---\nTmx T{doc_id}\nText Body words here\n"
            f"Due {doc_id % 71}.10"
        )


def test_scaled_tm_maps_td_and_leading_through_linear():
    """1.5-scaled Tm: a 0 -16 Td advances device y by 24; the TL/T* idiom
    advances identically (the shape the FORM rewrite path bails on — the
    top-level walk does the math in text space)."""
    td = (b"BT /F1 12 Tf 1.5 0 0 1.5 72 720 Tm (A) Tj "
          b"0 -16 Td (B) Tj ET")
    tl = (b"BT /F1 12 Tf 1.5 0 0 1.5 72 720 Tm 16 TL (A) Tj "
          b"T* (B) Tj ET")
    want = [(72.0, 720.0, "A"), (72.0, 696.0, "B")]
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(td)) == [want]
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(tl)) == [want]
    for content in (td, tl):
        eng, orc = _twins(_one_page_pdf(content))
        assert eng == orc != "BAIL"


def test_rotated_tm_golden():
    """90-degree Tm: Td (0,-16) advances device x by +16 — the rotated
    watermark line reads in device order on both twins."""
    content = (b"BT /F1 12 Tf 0 1 -1 0 300 100 Tm (ROT A) Tj "
               b"0 -16 Td (ROT B) Tj ET")
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(content)) == [
        [(300.0, 100.0, "ROT A"), (316.0, 100.0, "ROT B")]
    ]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"
    assert eng[0] == "--- PAGE 1 ---\nROT A ROT B"


def test_bt_resets_text_matrix():
    content = (b"BT /F1 12 Tf 2 0 0 2 50 600 Tm (SCALED) Tj ET "
               b"BT /F1 12 Tf 72 500 Td 0 -16 Td (PLAIN) Tj ET")
    runs = pdftext.tokenize_pdf_runs(_one_page_pdf(content))[0]
    assert (50.0, 600.0, "SCALED") in runs
    assert (72.0, 484.0, "PLAIN") in runs  # identity deltas after BT
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"


def test_sheared_tm_bails_both_twins():
    content = b"BT /F1 12 Tf 1 0 0.5 1 10 10 Tm (SHEAR TEXT) Tj ET"
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == "BAIL" and orc == "BAIL"
    sing = b"BT /F1 12 Tf 0 0 0 0 10 10 Tm (SINGULAR TEXT) Tj ET"
    eng, orc = _twins(_one_page_pdf(sing))
    assert eng == "BAIL" and orc == "BAIL"


def test_nonidentity_tm_inside_transformed_form_composes():
    """Late-r7 unification: the form /Matrix is a cm in the splice's
    isolation wrapper, so a scaled form whose content sets a scaled Tm
    COMPOSES (device = matrix(Tm origin)) instead of bailing — the old
    operand-rewrite limitation is gone. Translate matrices compose too."""
    from pdf_extraction_ai_agent_spark.fixtures.minipdf import write_form_pdf

    page = [("text", 72, 700, "Body line")]
    hdr = [("raw", "BT /F1 12 Tf 2 0 0 2 36 370 Tm (Stamp) Tj ET")]
    scaled = write_form_pdf([page], hdr, translate=(1.5, 0, 0, 1.5, 0, 0))
    runs = pdftext.tokenize_pdf_runs(scaled)[0]
    assert (54.0, 555.0, "Stamp") in runs  # (36, 370) × 1.5
    eng, orc = _twins(scaled)
    assert eng == orc != "BAIL"
    translated = write_form_pdf([page], hdr, translate=(0, 20))
    eng, orc = _twins(translated)
    assert eng == orc != "BAIL"
    # stamp Tm origin (36, 370+20) sits a paragraph gap below the body
    assert eng[0] == "--- PAGE 1 ---\nBody line\n\nStamp"
