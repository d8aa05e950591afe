"""Inheritable page attributes (round 7; ISO 32000 §7.7.3): /Resources
hoisted onto /Pages nodes (resolved by climbing /Parent — engine) and
/Rotate display rotation (modeled as the page's initial CTM on both
twins; the oracle's map-free walk supports the uniform-rotation case and
raises on mixed)."""

from pdf_extraction_ai_agent_spark.fixtures.minipdf import (
    write_differences_pdf,
    write_minimal_pdf,
)
from pdf_extraction_ai_agent_spark.operators import pdftext
from tests.test_ctm_pages import _twins

TEXT = "Claim C5\nBody hello there\nTotal 5.00"
WANT = "--- PAGE 1 ---\n" + TEXT


def test_inherited_resources_all_layouts():
    """/Differences font resolved from the page, the /Pages root, or an
    intermediate node of a two-level tree — identical text on both twins
    (the remap is load-bearing: a non-climbing parser would bail, never
    emit high-byte garbage)."""
    for rp in (0, 1, 2):
        for compress in (False, True):
            pdf = write_differences_pdf(
                [TEXT], compress=compress, resources_parent=rp
            )
            if rp:  # the inherited layouts carry NO page /Resources
                assert b"/Type /Page /Parent" in pdf
            eng, orc = _twins(pdf)
            assert eng == orc != "BAIL", (rp, compress)
            assert eng[0] == WANT, (rp, compress)


def test_rotate_90_reads_rotated_text_upright():
    raw = (
        "BT /F1 12 Tf 0 1 -1 0 300 72 Tm (ROT LINE ONE) Tj "
        "0 -16 Td (ROT LINE TWO) Tj ET"
    )
    pdf = write_minimal_pdf([[("raw", raw)]], rotate=90, rotate_on_pages=True)
    runs = pdftext.tokenize_pdf_runs(pdf)
    # displayed: x' = y - y0 = 72; y' = x1 - x = 612-300 / 612-316
    assert runs == [[(72.0, 312.0, "ROT LINE ONE"),
                     (72.0, 296.0, "ROT LINE TWO")]]
    eng, orc = _twins(pdf)
    assert eng == orc != "BAIL"
    assert eng[0] == "--- PAGE 1 ---\nROT LINE ONE\nROT LINE TWO"


def test_rotate_180_and_270_display_order():
    # authored upside-down → displays in natural order under /Rotate 180
    page180 = [("text", 72, 688, "L1"), ("text", 72, 704, "L2"),
               ("text", 72, 720, "L3")]
    eng, orc = _twins(write_minimal_pdf([page180], rotate=180))
    assert eng == orc != "BAIL"
    assert eng[0] == "--- PAGE 1 ---\nL1\nL2\nL3"
    # authored as an x-column → stacked lines under /Rotate 270
    page270 = [("text", 300, 400, "C1"), ("text", 284, 400, "C2"),
               ("text", 268, 400, "C3")]
    eng, orc = _twins(write_minimal_pdf([page270], rotate=270))
    assert eng == orc != "BAIL"
    assert eng[0] == "--- PAGE 1 ---\nC1\nC2\nC3"


def test_rotate_zero_and_absent_identical():
    base = write_minimal_pdf([TEXT])
    r0 = write_minimal_pdf([TEXT], rotate=0)
    assert _twins(base)[0] == _twins(r0)[0] == _twins(r0)[1]


def test_rotate_composes_with_page_ctm_and_rulings():
    """/Rotate is the OUTERMOST transform: a content cm composes under
    it, and ruling endpoints map through both."""
    raw = (
        "q 1 0 0 1 10 0 cm BT /F1 12 Tf 0 1 -1 0 290 72 Tm (CMROT) Tj ET "
        "100 200 m 100 300 l S Q"
    )
    pdf = write_minimal_pdf([[("raw", raw)]], rotate=90, rotate_on_pages=True)
    runs = pdftext.tokenize_pdf_runs(pdf)
    # text user pos (290+10, 72) → displayed (72, 612-300) = (72, 312)
    assert runs == [[(72.0, 312.0, "CMROT")]]
    segs = pdftext.tokenize_pdf_rulings(pdf)
    # (100,200)+cm→(110,200)→rot90 (200, 502); (100,300)→(110,300)→(300,502)
    assert segs == [[(200.0, 502.0, 300.0, 502.0)]]


def test_junk_rotate_bails_both_twins():
    eng, orc = _twins(write_minimal_pdf([TEXT], rotate=45))
    assert eng == "BAIL" and orc == "BAIL"


def test_mixed_rotation_engine_extracts_oracle_raises():
    """Documented twin-scope boundary: per-page MIXED rotations extract
    on the engine (page-tree walk) but raise in the map-free oracle."""
    pdf = write_minimal_pdf(["Page one text here", "Page two text here"])
    # give page 2 a /Rotate 180 by targeted header rewrite
    pdf = pdf.replace(
        b"6 0 obj\n<< /Type /Page /Parent 2 0 R ",
        b"6 0 obj\n<< /Type /Page /Parent 2 0 R /Rotate 180 ", 1,
    )
    runs = pdftext.tokenize_pdf_runs(pdf)
    assert runs is not None and len(runs) == 2
    eng, orc = _twins(pdf)
    assert eng != "BAIL" and orc == "BAIL"
