"""Tagged-PDF logical reading order (q66): twin equality, structure-tree
shapes, artifact exclusion, and geometric fallbacks.

Reference parity: the reference's library chain reads tagged files in
GEOMETRIC order (extract_text.py:39-66 — pdfplumber/fitz default); the
tagged rung is a separate opt-in operator on top of that contract, so
these tests also pin that the DEFAULT extraction stays geometric."""

from pdf_extraction_ai_agent_spark.fixtures.minipdf import (
    write_minimal_pdf,
    write_tagged_pdf,
)
from pdf_extraction_ai_agent_spark.operators.extract import (
    extract_real_pdf_text,
    extract_tagged_pdf_text,
)
from pdf_extraction_ai_agent_spark.operators.pdftext import (
    tokenize_pdf_tagged,
)
from pdf_extraction_ai_agent_spark.oracle.reference_extractor import (
    extract_real_pdf,
    extract_tagged_pdf,
)

# LOGICAL order: left column top-to-bottom, then right column — but the
# right column's first paragraph sits HIGHER than anything in the left
# column, so the geometric y-desc walk interleaves (p2, p0, p3, p1).
TWO_COL = [
    (72, 720, "Claim C1"),
    (72, 704, "Body sample body"),
    (320, 730, "Part two"),
    (320, 714, "Total 1.00"),
]
LOGICAL = "Claim C1\nBody sample body\nPart two\nTotal 1.00"


def test_tagged_pdf_twins_and_structure_shapes():
    """Across compression × tree shapes (flat /Pg-per-element kids, /Sect
    wrapper with inherited /Pg, /MCR reference dicts) × artifact forms:
    twins agree, logical order is restored, the /Artifact footer is
    dropped, and the geometric walk provably interleaves (the structure
    tree is load-bearing)."""
    for compress in (False, True):
        for shape in (
            dict(),
            dict(nest_sections=True),
            dict(mcr_kids=True),
        ):
            for artifact in (None, "Page 1 of 9"):
                pdf = write_tagged_pdf(
                    [TWO_COL], compress=compress, artifact=artifact, **shape
                )
                etext, eocr = extract_tagged_pdf_text(pdf)
                otext, oocr = extract_tagged_pdf(pdf.decode("latin-1"))
                assert (etext, eocr) == (otext, oocr), (compress, shape)
                assert etext == "--- PAGE 1 ---\n" + LOGICAL
                assert eocr is False
                if artifact:
                    assert artifact not in etext
                # the geometric contract on the SAME bytes interleaves the
                # columns and KEEPS the artifact — both twins, equally
                gtext, _ = extract_real_pdf_text(pdf)
                ogtext, _ = extract_real_pdf(pdf.decode("latin-1"))
                assert gtext == ogtext
                assert gtext.splitlines()[1] == "Part two"
                if artifact:
                    assert artifact in gtext


def test_tagged_pdf_multipage_markers():
    """Two pages: page markers, per-page MCID scoping (both pages reuse
    MCIDs 0..3 — legal, MCIDs are page-scoped), /Sect-per-page tree."""
    page2 = [(x, y, s.replace("1", "2")) for x, y, s in TWO_COL]
    pdf = write_tagged_pdf([TWO_COL, page2], nest_sections=True)
    etext, _ = extract_tagged_pdf_text(pdf)
    otext, _ = extract_tagged_pdf(pdf.decode("latin-1"))
    assert etext == otext
    assert etext == (
        "--- PAGE 1 ---\n" + LOGICAL
        + "\n--- PAGE 2 ---\n" + LOGICAL.replace("1", "2")
    )


def test_untagged_pdf_falls_back_to_geometric():
    """A plain (unmarked) PDF extracts identically through the tagged
    operator and the geometric one — on both twins."""
    pdf = write_minimal_pdf(["Claim C1\nBody sample body\nTotal 1.00"])
    assert tokenize_pdf_tagged(pdf) is None
    assert extract_tagged_pdf_text(pdf) == extract_real_pdf_text(pdf)
    assert extract_tagged_pdf(pdf.decode("latin-1")) == extract_real_pdf(
        pdf.decode("latin-1")
    )


def test_out_of_scope_tagging_falls_back_identically():
    """Out-of-scope tagged shapes keep twin equality by BOTH falling back
    to the geometric contract: an MCID missing from the structure tree, a
    BDC with an indirect property list, and an unbalanced EMC."""
    base = write_tagged_pdf([TWO_COL])

    # shown MCID 3 absent from the tree (drop its StructElem object body)
    broken = base.replace(b"/K 3", b"/K 2")
    for mutated in (
        broken,
        # indirect property list: swap one inline /MCID dict for a
        # same-length property NAME (keeps /Length + xref offsets valid)
        base.replace(b"/P << /MCID 0 >> BDC", b"/P /IndirectPro9 BDC"),
        # unbalanced: excise one EMC
        base.replace(b"EMC", b"   ", 1),
    ):
        etext, eocr = extract_tagged_pdf_text(mutated)
        otext, oocr = extract_tagged_pdf(mutated.decode("latin-1"))
        assert (etext, eocr) == (otext, oocr)
        # fell back: geometric interleave shows "Part two" first
        assert etext.splitlines()[1] == "Part two"


def test_encrypted_tagged_pdf_twins():
    """Encryption composes with tagging: content streams encrypt under
    the standard handler while the structure tree (dict-only objects)
    stays plaintext — both twins decrypt, then order logically, across
    RC4 V1/R2 and AESV2 V4/R4."""
    from pdf_extraction_ai_agent_spark.fixtures.minipdf import (
        write_encrypted_pdf,
    )

    plain = write_tagged_pdf([TWO_COL], artifact="Page 1 of 9")
    for revision in (2, 4):
        pdf = write_encrypted_pdf(
            [TWO_COL], owner_pwd=b"own-7", revision=revision, plain=plain
        )
        assert b"/Encrypt" in pdf and b"Part two" not in pdf  # ciphertext
        etext, eocr = extract_tagged_pdf_text(pdf)
        otext, oocr = extract_tagged_pdf(pdf.decode("latin-1"))
        assert (etext, eocr) == (otext, oocr), revision
        assert etext == "--- PAGE 1 ---\n" + LOGICAL
        assert "Page 1 of 9" not in etext


def test_tagged_pdf_property_roundtrip():
    """Randomized twin identity: arbitrary paragraph grids (1–2 pages,
    1–6 paragraphs, random two-column x/y placement, random tree shape,
    compression and artifact) extract in exactly the input (logical)
    order on BOTH twins."""
    import random

    rng = random.Random(20260818)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf"]
    for trial in range(40):
        pages = []
        for _ in range(rng.randint(1, 2)):
            items = []
            # distinct y per paragraph (>PDF_Y_TOL apart) so the geometric
            # order is well-defined; logical order is the emission order
            ys = rng.sample(range(200, 760, 8), rng.randint(1, 6))
            for y in ys:
                x = rng.choice([72, 320])
                txt = " ".join(rng.sample(words, rng.randint(1, 3)))
                items.append((x, float(y), txt))
            pages.append(items)
        pdf = write_tagged_pdf(
            pages,
            compress=rng.random() < 0.5,
            artifact="pg" if rng.random() < 0.5 else None,
            nest_sections=rng.random() < 0.3,
            mcr_kids=rng.random() < 0.3,
        )
        etext, eocr = extract_tagged_pdf_text(pdf)
        otext, oocr = extract_tagged_pdf(pdf.decode("latin-1"))
        assert (etext, eocr) == (otext, oocr), trial
        want = "\n".join(
            f"--- PAGE {i + 1} ---\n" + "\n".join(t for _, _, t in items)
            for i, items in enumerate(pages)
        ).strip()
        assert etext == want, (trial, etext, want)


def test_tagged_pdf_unmarked_but_structured_is_geometric():
    """/StructTreeRoot present but /MarkInfo missing/false → not usably
    tagged; both twins stay geometric (ISO 32000 requires Marked true)."""
    base = write_tagged_pdf([TWO_COL])
    unmarked = base.replace(b"/Marked true", b"/Markd true ")  # same length
    assert tokenize_pdf_tagged(unmarked) is None
    etext, _ = extract_tagged_pdf_text(unmarked)
    otext, _ = extract_tagged_pdf(unmarked.decode("latin-1"))
    assert etext == otext
    assert etext.splitlines()[1] == "Part two"
