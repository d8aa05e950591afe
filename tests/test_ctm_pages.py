"""Top-level q/cm/Q graphics state (round 7): the common real-generator
shape where the page body sits under a CTM wrapper. Both twins track the
state (engine: pdftext.tokenize_pdf_runs/_top_level_segments_ctm; oracle:
the char-scan walk in reference_extractor.extract_real_pdf) and must stay
per-turn equal on the modeled domain; out-of-scope shapes (shear,
singular, operand-less cm, unbalanced Q) must BAIL on both sides.

Reference behavior: the library chain reads cm-wrapped pages by device
position (extract_text.py:39-66 via pdfplumber/fitz).
"""

import pytest

from pdf_extraction_ai_agent_spark.entry_queries_ext9 import _payload_q72
from pdf_extraction_ai_agent_spark.fixtures.minipdf import (
    _assemble_classic,
    write_minimal_pdf,
)
from pdf_extraction_ai_agent_spark.operators import pdftext
from pdf_extraction_ai_agent_spark.operators.extract import (
    extract_real_pdf_text,
)
from pdf_extraction_ai_agent_spark.oracle.reference_extractor import (
    extract_real_pdf,
)


def _one_page_pdf(content: bytes) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        4: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>",
        5: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
    }
    return _assemble_classic(objs)


def _twins(pdf: bytes) -> tuple:
    """(engine_result, oracle_result), each (text, needs_ocr) or the
    raised-error marker 'BAIL'."""
    try:
        eng = extract_real_pdf_text(pdf)
    except RuntimeError:
        eng = "BAIL"
    try:
        orc = extract_real_pdf(pdf.decode("latin-1"))
    except RuntimeError:
        orc = "BAIL"
    return eng, orc


def test_q72_variants_twin_parity():
    """All six fixture matrix variants extract identically on both twins
    and yield the variant-blind predicted text."""
    for doc_id in range(12):
        pdf = _payload_q72(doc_id, "Sample body text for doc")
        eng, orc = _twins(pdf)
        assert eng != "BAIL" and eng == orc, doc_id
        assert eng[0] == (
            f"--- PAGE 1 ---\nMatrix M{doc_id}\nCtm Sample body text for "
            f"doc\nGrand {doc_id % 79}.75"
        )


def test_ctm_positions_transform_and_restore():
    """cm transforms device positions; Q restores — text after the Q sits
    at its untransformed position (mixed-space reading order works)."""
    content = (
        b"q 2 0 0 2 10 5 cm BT /F1 12 Tf 72 720 Td (HIGH) Tj ET Q "
        b"BT /F1 12 Tf 72 700 Td (LOW) Tj ET"
    )
    runs = pdftext.tokenize_pdf_runs(_one_page_pdf(content))
    assert runs == [[(154.0, 1445.0, "HIGH"), (72.0, 700.0, "LOW")]]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"
    # 745 pt device gap between the lines ≥ PDF_PARA_GAP → paragraph break
    assert eng[0].splitlines()[1:] == ["HIGH", "", "LOW"]


def test_ctm_rotation_golden():
    """90-degree rotation (orthogonal columns — modeled): three stacked
    lines land on ONE device line, ordered by their (rotated) x. Pinned
    on both twins."""
    content = (
        b"q 0 1 -1 0 0 0 cm "
        b"BT /F1 12 Tf 72 720 Td (A1) Tj ET "
        b"BT /F1 12 Tf 72 704 Td (B2) Tj ET "
        b"BT /F1 12 Tf 72 688 Td (C3) Tj ET Q"
    )
    # (x,y) -> (-y, x): device ys all 72 (one cluster), xs -720 < -704 < -688
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"
    assert eng[0] == "--- PAGE 1 ---\nA1 B2 C3"


def test_ctm_out_of_scope_shapes_bail_on_both_twins():
    line = b"BT /F1 12 Tf 72 720 Td (TEXT PAYLOAD HERE) Tj ET"
    for bad in (
        b"q 1 0 0.5 1 0 0 cm " + line + b" Q",     # shear
        b"q 0 0 0 0 0 0 cm " + line + b" Q",       # singular
        b"q cm " + line + b" Q",                   # operand-less cm
        b"1 0 0 1 5 5 cm " + line + b" Q Q",       # unbalanced Q (cm page)
    ):
        eng, orc = _twins(_one_page_pdf(bad))
        assert eng == "BAIL", bad
        assert orc == "BAIL", bad


def test_stray_balanced_q_without_cm_is_ignored():
    """cm-free pages keep the fast path: q/Q are geometric no-ops and an
    unbalanced Q must NOT bail (mirrored prefilter on both twins)."""
    content = (
        b"Q q BT /F1 12 Tf 72 720 Td (PLAIN SHOWN TEXT) Tj ET"
    )
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"
    assert "PLAIN SHOWN TEXT" in eng[0]


def test_name_tails_never_misread_as_state_ops():
    """/freq ends in q, /Quality starts with Q — neither may push/pop
    (the lookaround classes); with a real cm present the walk must still
    balance correctly."""
    content = (
        b"/freq gs /Quality gs q 1 0 0 1 0 0 cm "
        b"BT /F1 12 Tf 72 720 Td (NAME TAIL SAFE) Tj ET Q"
    )
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"
    assert "NAME TAIL SAFE" in eng[0]


def test_rulings_transform_through_ctm():
    """Ruling endpoints map through the SAME device space as text — a
    lattice grid drawn inside a cm wrapper must line up with its text."""
    content = (
        b"q 2 0 0 2 100 50 cm 10 20 m 30 20 l S Q 1 1 m 2 2 l S"
    )
    segs = pdftext._top_level_segments_ctm(content)
    assert segs == [(120.0, 90.0, 160.0, 90.0), (1.0, 1.0, 2.0, 2.0)]
    # whole-document path agrees
    pdf = _one_page_pdf(content + b" BT /F1 12 Tf 5 5 Td (t) Tj ET")
    assert pdftext.tokenize_pdf_rulings(pdf) == [
        [(120.0, 90.0, 160.0, 90.0), (1.0, 1.0, 2.0, 2.0)]
    ]
    # out-of-scope cm bails the rulings walk like the text walk
    assert pdftext._top_level_segments_ctm(
        b"q 1 0 0.5 1 0 0 cm 1 1 m 2 2 l S Q"
    ) is None
    assert pdftext._top_level_segments_ctm(b"Q 1 0 0 1 0 0 cm") is None


def test_nested_states_compose_row_vector_convention():
    """Inner cm applies BEFORE the outer (p' = p x M_inner x M_outer):
    outer scale 2 then inner translate (3,4) puts text-space (10, 10) at
    device (26, 28), not (23, 24)."""
    content = (
        b"q 2 0 0 2 0 0 cm q 1 0 0 1 3 4 cm "
        b"BT /F1 12 Tf 10 10 Td (P) Tj ET Q Q"
    )
    runs = pdftext.tokenize_pdf_runs(_one_page_pdf(content))
    assert runs == [[(26.0, 28.0, "P")]]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"


def test_cm_free_documents_identical_to_before():
    """The fast path is byte-identical for ordinary documents (regression
    guard for the prefilter split)."""
    pdf = write_minimal_pdf(["Claim C8\nBody steady\nTotal 8.00"])
    eng, orc = _twins(pdf)
    assert eng == orc != "BAIL"
    assert eng[0] == "--- PAGE 1 ---\nClaim C8\nBody steady\nTotal 8.00"
