"""r8 optimization pin: the per-page lattice kernel
(texttables.detect_lattice_tables) is row-identical to the declarative
join form it replaced (detect_lattice_tables_joins) — including the
duplicate-coordinate pooling of the mutual-intersection counts, strict
band containment, and the (x, txt) cell-text collation."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extraction_ai_agent_spark.operators.texttables import (
    detect_lattice_tables,
    detect_lattice_tables_joins,
    lattice_cells_from_docs,
    pdf_rulings,
    pdf_runs,
)


def _doc(doc_id: int, body: str):
    return (doc_id, "%PDF-SIM 1.0\n%%PAGE 1\n" + body)


def test_lattice_kernel_matches_join_form(spark):
    docs = [
        # regular 2x2 grid with jittered text
        _doc(1, "\n".join(
            [f"45 {y} m 495 {y} l S" for y in (258, 226, 194)]
            + [f"{x} 194 m {x} 258 l S" for x in (45, 270, 495)]
            + ["BT 50 240 Td (a) Tj ET", "BT 300 240 Td (b) Tj ET",
               "BT 60 200 Td (z) Tj ET", "BT 60 200 Td (a) Tj ET",
               "BT 299 201 Td (q) Tj ET"]
        )),
        # duplicate-y h-rules (count pooling), an unvalidated stray rule,
        # and a run outside every band
        _doc(2, "\n".join(
            ["45 258 m 200 258 l S", "250 258 m 495 258 l S",
             "45 194 m 495 194 l S", "45 100 m 495 100 l S",
             "45 194 m 45 258 l S", "495 194 m 495 258 l S",
             "BT 100 230 Td (mid) Tj ET", "BT 100 50 Td (below) Tj ET"]
        )),
        # no grid at all (rules that never cross)
        _doc(3, "45 258 m 495 258 l S\nBT 50 240 Td (x) Tj ET"),
        # multi-page: grid only on page 2
        (4, "%PDF-SIM 1.0\n%%PAGE 1\nBT 10 10 Td (p1) Tj ET\n%%PAGE 2\n"
            + "\n".join(
                [f"45 {y} m 495 {y} l S" for y in (258, 194)]
                + [f"{x} 194 m {x} 258 l S" for x in (45, 495)]
                + ["BT 50 240 Td (only) Tj ET", "BT 51 240 Td (cell) Tj ET"])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    runs, rulings = pdf_runs(df), pdf_rulings(df)
    kernel = {tuple(r) for r in detect_lattice_tables(runs, rulings).collect()}
    joins = {tuple(r) for r in detect_lattice_tables_joins(runs, rulings).collect()}
    assert kernel == joins
    assert kernel, "fixture produced no cells — test would be vacuous"
    # the duplicate-y pooling case must actually produce doc 2's band
    assert any(r[0] == 2 for r in kernel)


def test_fused_doc_kernel_matches_spark_parse(spark):
    """lattice_cells_from_docs (python line parse + grid in one pass) must
    equal detect_lattice_tables over the Spark-regex pdf_runs/pdf_rulings
    parse — including page forward-fill (elements before the first %%PAGE
    dropped, repeated markers pooled), anchored-pattern rejection of
    near-miss lines, and number-format edges the regex admits."""
    grid_body = "\n".join(
        [f"45 {y} m 495 {y} l S" for y in (258, 226, 194)]
        + [f"{x} 194 m {x} 258 l S" for x in (45, 270, 495)]
    )
    docs = [
        # pre-page elements dropped; near-miss lines (trailing space, extra
        # token after the page number, missing ET) must parse as NOTHING
        (1, "BT 50 240 Td (dropme) Tj ET\n10 194 m 10 258 l S\n"
            "%%PAGE 1 extra\n%%PAGE 1\n" + grid_body
            + "\nBT 50 240 Td (kept) Tj ET \nBT 50 240 Td (kept) Tj ET"
            + "\nBT 60 200 Td (b) Tj\nBT 300. 240.5 Td (dot) Tj ET"),
        # repeated %%PAGE markers pool elements into one page grid
        (2, "%%PAGE 1\n" + grid_body + "\n%%PAGE 2\nBT 1 1 Td (p2) Tj ET\n"
            "%%PAGE 1\nBT 60 200 Td (late) Tj ET"),
        # parens content with regex-special chars; empty text run
        (3, "%%PAGE 1\n" + grid_body
            + "\nBT 60 240 Td (a(b)c$^.*) Tj ET\nBT 70 240 Td () Tj ET"),
        (4, ""),  # empty doc
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fused = {tuple(r) for r in lattice_cells_from_docs(df).collect()}
    declarative = {
        tuple(r)
        for r in detect_lattice_tables(pdf_runs(df), pdf_rulings(df)).collect()
    }
    assert fused == declarative
    assert fused, "fixture produced no cells — test would be vacuous"


def test_streaming_kernel_carry_over_across_arrow_batches(spark):
    """The tagged-frame kernel streams arrow batches with a carry-over of
    the trailing (doc_id, page) group; with thousands of pages hashed into
    each partition the per-partition row count exceeds the arrow batch
    size (2048), so groups straddle batch boundaries — output must still
    equal the join form row-for-row."""
    body = (
        "\n".join(
            [f"45 {y} m 495 {y} l S" for y in (258, 226, 194)]
            + [f"{x} 194 m {x} 258 l S" for x in (45, 270, 495)]
        )
        + "\nBT 50 240 Td (a{i}) Tj ET\nBT 300 240 Td (b{i}) Tj ET"
        + "\nBT 60 200 Td (c{i}) Tj ET"
    )
    docs = [
        (i, "%PDF-SIM 1.0\n%%PAGE 1\n" + body.replace("{i}", str(i)))
        for i in range(4000)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    runs, rulings = pdf_runs(df), pdf_rulings(df)
    kernel = {tuple(r) for r in detect_lattice_tables(runs, rulings).collect()}
    joins = {tuple(r) for r in detect_lattice_tables_joins(runs, rulings).collect()}
    assert kernel == joins
    assert len(kernel) == 4000 * 3  # 2x2 grid, three occupied cells per doc
