"""TJ word-break synthesis (round 7, §9.4.3 + spec.TJ_SPACE_KERN): a
displacement <= -threshold inside a TJ array prefixes one space to the
array's next show on BOTH twins — generators that kern word gaps instead
of showing space glyphs (the reference's library chain derives the same
break from glyph geometry). Intra-word kerning stays joined; a trailing
or positive displacement shows nothing; displacement never crosses array
boundaries; inside an /ActualText sequence the replacement wins."""

from pdf_extraction_ai_agent_spark import spec
from pdf_extraction_ai_agent_spark.entry_queries_ext9 import _payload_q78
from pdf_extraction_ai_agent_spark.operators import pdftext
from tests.test_ctm_pages import _one_page_pdf, _twins


def test_q78_variants_twin_parity_and_text():
    for doc_id in range(12):
        pdf = _payload_q78(doc_id, "Body words for doc sample")
        eng, orc = _twins(pdf)
        assert eng != "BAIL" and eng == orc, doc_id
        assert eng[0] == (
            f"--- PAGE 1 ---\nKern K{doc_id}\nText Body words for doc sample"
            f"\nNet {doc_id % 59}.60"
        )


def test_word_gap_kern_synthesizes_one_space():
    content = b"BT /F1 12 Tf 72 720 Td [(Hello) -250 (world)] TJ ET"
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(content)) == [[
        (72.0, 720.0, "Hello world"),
    ]]
    eng, orc = _twins(_one_page_pdf(content))
    assert eng == orc != "BAIL"


def test_threshold_boundary_and_intra_word_kern():
    """<= -TJ_SPACE_KERN breaks; anything closer to zero joins."""
    t = spec.TJ_SPACE_KERN
    at = ("BT /F1 12 Tf 72 720 Td [(X) -%g (Y)] TJ ET" % t).encode()
    below = ("BT /F1 12 Tf 72 720 Td [(X) -%g (Y)] TJ ET" % (t - 0.1)).encode()
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(at))[0][0][2] == "X Y"
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(below))[0][0][2] == "XY"
    for content in (at, below):
        eng, orc = _twins(_one_page_pdf(content))
        assert eng == orc != "BAIL"


def test_kern_never_crosses_array_or_show_boundaries():
    """Trailing and positive displacements show nothing; a gap in one
    array must not leak a space into the next."""
    shapes = {
        b"BT /F1 12 Tf 72 720 Td [(tail) -500] TJ [(next)] TJ ET": "tailnext",
        b"BT /F1 12 Tf 72 720 Td [(a) 250 (b)] TJ ET": "ab",
        b"BT /F1 12 Tf 72 720 Td [(a) -300 -300 (b)] TJ ET": "a b",
    }
    for content, want in shapes.items():
        assert pdftext.tokenize_pdf_runs(_one_page_pdf(content))[0][0][2] == want
        eng, orc = _twins(_one_page_pdf(content))
        assert eng == orc != "BAIL"


def test_hex_shows_and_actualtext_interplay():
    hexed = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[<48656C6C6F> -300 <776F726C64>] TJ ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(hexed))[0][0][2] == "Hello world"
    spanned = (
        b"BT /F1 12 Tf 72 720 Td /Span <</ActualText (REPL)>> BDC "
        b"[(a) -300 (b)] TJ EMC ET"
    )
    assert pdftext.tokenize_pdf_runs(_one_page_pdf(spanned))[0][0][2] == "REPL"
    for content in (hexed, spanned):
        eng, orc = _twins(_one_page_pdf(content))
        assert eng == orc != "BAIL"
