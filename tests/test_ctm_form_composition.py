"""CTM × form-XObject composition (round 7): Do saves/restores graphics
state (ISO 32000 §8.10.2), expressed on both twins as a synthetic q…Q
around every splice — page CTMs wrap Do invocations, form matrices
compose under them, and a form's internal cm is contained instead of
leaking onto the rest of the page."""

from pdf_extraction_ai_agent_spark.entry_queries_ext9 import _payload_q73
from pdf_extraction_ai_agent_spark.fixtures.minipdf import write_form_pdf
from pdf_extraction_ai_agent_spark.operators import pdftext
from pdf_extraction_ai_agent_spark.operators.extract import (
    extract_real_pdf_text,
)
from pdf_extraction_ai_agent_spark.oracle.reference_extractor import (
    extract_real_pdf,
)


def _twins(pdf: bytes):
    try:
        eng = extract_real_pdf_text(pdf)
    except RuntimeError:
        eng = "BAIL"
    try:
        orc = extract_real_pdf(pdf.decode("latin-1"))
    except RuntimeError:
        orc = "BAIL"
    return eng, orc


PAGE = [
    ("text", 72, 720, "Wrap W1"),
    ("text", 72, 704, "Page body"),
    ("text", 72, 688, "Net 1.25"),
]
HEADER = [("text", 72, 736, "Stamp S1")]
WANT = "--- PAGE 1 ---\nStamp S1\nWrap W1\nPage body\nNet 1.25"


def test_q73_variants_twin_parity_and_text():
    for doc_id in range(10):
        pdf = _payload_q73(doc_id, "Body words here")
        eng, orc = _twins(pdf)
        assert eng != "BAIL" and eng == orc, doc_id
        assert eng[0] == (
            f"--- PAGE 1 ---\nStamp S{doc_id}\nWrap W{doc_id}\n"
            f"Page Body words here\nNet {doc_id % 73}.25"
        )


def test_page_ctm_composes_with_form_matrix():
    """device = CTM(form_matrix(p)): page scale 1.25 × form translate
    (0,4) puts the header at (90, 925) — pinned run positions."""
    pdf = write_form_pdf(
        [PAGE], HEADER, page_wrap=(1.25, 0, 0, 1.25, 0, 0), translate=(0, 4)
    )
    runs = pdftext.tokenize_pdf_runs(pdf)[0]
    assert (90.0, 925.0, "Stamp S1") in runs
    assert (90.0, 900.0, "Wrap W1") in runs  # 720 × 1.25
    eng, orc = _twins(pdf)
    assert eng == orc != "BAIL" and eng[0] == WANT


def test_form_internal_cm_is_contained():
    """An identity-matrix form whose content issues a bare 2× scale cm:
    the form's own text maps through it, but the page lines after the Do
    stay UNSCALED — a leak would double the 16-pt pitch past
    PDF_PARA_GAP and insert blank lines (the q73 gate shape)."""
    hdr = [("cm", 2, 0, 0, 2, 0, 0), ("text", 36, 368, "Stamp S1")]
    pdf = write_form_pdf([PAGE], hdr)
    runs = pdftext.tokenize_pdf_runs(pdf)[0]
    assert runs == [
        (72.0, 736.0, "Stamp S1"),   # 36×2, 368×2 — inside the form cm
        (72.0, 720.0, "Wrap W1"),    # untransformed — contained
        (72.0, 704.0, "Page body"),
        (72.0, 688.0, "Net 1.25"),
    ]
    eng, orc = _twins(pdf)
    assert eng == orc != "BAIL" and eng[0] == WANT


def test_nested_form_and_image_do_under_page_ctm():
    sub = [("text", 72, 752, "SUB mark")]
    pdf = write_form_pdf(
        [PAGE], HEADER, sub=sub, with_image=True,
        page_wrap=(1, 0, 0, 1, 12, -6),
    )
    eng, orc = _twins(pdf)
    assert eng == orc != "BAIL"
    assert eng[0] == (
        "--- PAGE 1 ---\nSUB mark\nStamp S1\nWrap W1\nPage body\nNet 1.25"
    )


def test_sheared_page_ctm_still_bails_both_twins():
    pdf = write_form_pdf([PAGE], HEADER, page_wrap=(1, 0, 0.5, 1, 0, 0))
    eng, orc = _twins(pdf)
    assert eng == "BAIL" and orc == "BAIL"


def test_rulings_inside_form_under_page_ctm():
    """A ruling drawn by the form maps through page CTM × form matrix —
    one device space for text AND lattice geometry."""
    hdr = [("text", 72, 736, "Stamp S1"), ("line", 10, 20, 30, 20)]
    pdf = write_form_pdf(
        [PAGE], hdr, page_wrap=(2, 0, 0, 2, 100, 50), translate=(5, 0)
    )
    segs = pdftext.tokenize_pdf_rulings(pdf)
    # (10,20)→form(15,20)→page(130, 90); (30,20)→form(35,20)→page(170, 90)
    assert segs == [[(130.0, 90.0, 170.0, 90.0)]]
