"""Spark↔DuckDB differential test on RANDOMIZED claim text: the portable
regex/date/money expressions must agree between engines on arbitrary
generated shapes, not just the fixed driver tables (closes the oracle loop
from the other side)."""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extraction_ai_agent_spark import spec
from pdf_extraction_ai_agent_spark.functions.fields import (
    claim_number_col,
    date_col,
    name_col,
    record_amount_col,
    record_reason_col,
)

_DUCK_DATE_LADDER = (
    "strftime(try_strptime(trim({v}), ['%m/%d/%Y','%m-%d-%Y','%d/%m/%Y','%d-%m-%Y',"
    "'%m/%d/%y','%m-%d-%y','%B %d, %Y','%b %d, %Y','%Y-%m-%d','%Y/%m/%d']), '%Y-%m-%d')"
)


def _sqlq(p: str) -> str:
    return p.replace("'", "''")


def _random_texts(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    frags = [
        "claim# {c}", "Claim No: {c}", "ref {c}", "reference: {c}", "claim {c}",
        "amount ${a}", "incurred ${a}", "${a} total", "$ {a}",
        "Reason: {r}", "cause - {r}", "description {r}", "{r} happened",
        "on {d}", "DoL {d}", "date {d}", "{d}",
        "Claimant: {n}", "name - {n}", "insured {n}",
        "random words here", "### noise $$$", "12345", "a/b/c-d",
    ]
    claims = ["ABC-12345", "zx9-88/776", "Q-1", "LMN-99999-12", "12/34", "XY"]
    amounts = ["1,234.56", "10.00", "999", "0.5", "1,2,3", "50000.99"]
    reasons = ["Theft", "Water damage; severe", "fire.damage", "x", ""]
    # NOTE: date pool restricted to shapes where the engines' parsers agree
    # semantically. Known (documented) divergences kept OUT of the pool and
    # pinned by test_known_duckdb_strptime_leniency below:
    # - DuckDB try_strptime rolls invalid days over ("2/30/2024"→Mar 1);
    #   Spark/python are strict (NULL).
    # - DuckDB %Y accepts 1-4 digit years ("1/2/31"→year 31); Java 'yyyy'
    #   rejects, so Spark falls through to the 2-digit format (2031).
    # Driver corpora only synthesize valid 4-digit dates, so the q01/q02/q05
    # oracles never hit these.
    dates = ["03/12/2024", "21-02-2024", "March 5, 2024",
             "Mar 05, 1999", "2024-12-31", "not-a-date", "31/31-2024"]
    names = ["John A. Doe", "jane smith", "Mark O'Neil", "X Y"]
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 6)):
            f = rng.choice(frags)
            parts.append(
                f.format(
                    c=rng.choice(claims), a=rng.choice(amounts),
                    r=rng.choice(reasons), d=rng.choice(dates), n=rng.choice(names),
                )
            )
        sep = rng.choice([". ", "; ", "\n", " "])
        out.append(sep.join(parts))
    return out


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_field_expressions_match_duckdb(spark, seed):
    texts = _random_texts(400, seed)
    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "i",
            claim_number_col(F.col("text")).alias("claim"),
            name_col(F.col("text")).alias("name"),
            date_col(F.col("text")).alias("d"),
            record_amount_col(F.col("text")).alias("amount"),
            record_reason_col(F.col("text")).alias("reason"),
        )
        .toPandas()
        .set_index("i")
        .sort_index()
    )

    con = duckdb.connect()
    con.register("t", pdf)
    claim = (
        "COALESCE("
        + ", ".join(f"NULLIF(regexp_extract(text, '{_sqlq(p)}', 1), '')" for p in spec.CLAIM_PATTERNS)
        + ")"
    )
    raw_date = (
        "COALESCE("
        + ", ".join(f"NULLIF(regexp_extract(text, '{_sqlq(p)}', 1), '')" for p in spec.DATE_PATTERNS)
        + ")"
    )
    exp = con.sql(
        f"""
        SELECT i,
               {claim} AS claim,
               NULLIF(regexp_extract(text, '{_sqlq(spec.NAME_PATTERNS[0])}', 1), '') AS name,
               {_DUCK_DATE_LADDER.format(v=raw_date)} AS d,
               CASE WHEN NULLIF(regexp_extract(text, '{_sqlq(spec.AMOUNT_PAT)}', 1), '') IS NOT NULL
                    THEN '$' || regexp_extract(text, '{_sqlq(spec.AMOUNT_PAT)}', 1) END AS amount,
               NULLIF(trim(regexp_extract(text, '{_sqlq(spec.REASON_PAT)}', 1)), '') AS reason
        FROM t
        """
    ).df().set_index("i").sort_index()

    for col in ["claim", "name", "d", "amount", "reason"]:
        g = got[col].where(pd.notna(got[col]), None)
        e = exp[col].where(pd.notna(exp[col]), None)
        diffs = [(i, g[i], e[i]) for i in g.index if g[i] != e[i]]
        assert not diffs, f"{col}: {len(diffs)} diffs, first: {diffs[0]} (seed {seed})"


def test_known_duckdb_strptime_leniency():
    """Pin the discovered DuckDB-vs-strict-parser divergences so a DuckDB
    upgrade that changes them is noticed (and oracle inputs stay valid):

    1. the LIST form of try_strptime rolls invalid days over
       ('2/30/2024' → Mar 1) while the single-format form is strict — the
       oracle ladders use the list form, so oracle inputs must be
       calendar-valid dates (the driver corpora are);
    2. %Y accepts 1-4 digit years (year 31) where Java 'yyyy' rejects.
    """
    con = duckdb.connect()
    # single-format: strict (NULL)
    assert con.sql(
        "select try_strptime('2/30/2024', '%m/%d/%Y')"
    ).fetchone()[0] is None
    # list form: lenient rollover
    assert str(con.sql(
        "select try_strptime('2/30/2024', ['%m/%d/%Y'])"
    ).fetchone()[0]).startswith("2024-03-01")
    # %Y accepts a 2-digit year as year 31
    assert con.sql(
        "select strftime(try_strptime('1/2/31', '%m/%d/%Y'), '%Y-%m-%d')"
    ).fetchone()[0] == "0031-01-02"
    # python/Spark-equivalent strictness reference
    from datetime import datetime
    import pytest as _pytest
    with _pytest.raises(ValueError):
        datetime.strptime("2/30/2024", "%m/%d/%Y")


def test_two_digit_year_pivot_alignment(spark):
    """The native ladder's yy formats are post-adjusted to the strptime
    pivot (69-99 → 19xx), so normalize_date_col == normalize_date_py on
    every 2-digit year — the round-1 internal divergence ('12/31/99' →
    2099 vs 1999) is closed."""
    from pyspark.sql import functions as F

    from pdf_extraction_ai_agent_spark.functions.dates import (
        normalize_date_col, normalize_date_py,
    )

    vals = ["12/31/99", "1/1/69", "6/15/68", "2/29/72", "12/31/00", "7/4/23"]
    df = spark.createDataFrame([(v,) for v in vals], "raw string")
    got = {r.raw: r.norm for r in df.select(
        "raw", normalize_date_col(F.col("raw")).alias("norm")).collect()}
    for v in vals:
        assert got[v] == normalize_date_py(v), (v, got[v], normalize_date_py(v))
    assert got["12/31/99"] == "1999-12-31"
    assert got["6/15/68"] == "2068-06-15"


def _random_wc_texts(n: int, seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    headers = [
        "Claim Number    Loss Date    Indemnity Paid    Medical Paid",
        "claim no\tdate of loss\tind paid\tmed paid",
        "Claim #  |  Accident Date  |  ALAE  |  Expense",
        "nothing tabular here",                 # <2 header hits → no claims
        "Indemnity Reserve    Med Reserve",
    ]
    line_frags = [
        "W{k}042    06/15/1994    indemnity 12345.67    medical 17.00",
        "12345    1/2/99    ind paid 5,000.00",
        "ABC-99    medical 9.99 | alae 1.00",
        "{k}    07-08-2021\tindemnity reserve 3.50",
        "onecell",
        "two  cells",
        "a || b || c",
        "expense 7    W55555    02/03/2020",
        "med reserve $1,000    W77777    03/04/2021    allocated loss adjustment expense 2",
    ]
    docs = []
    for i in range(n):
        lines = []
        if rng.random() < 0.4:
            lines.append("Evaluation Date: 06-30-2024")
        if rng.random() < 0.4:
            lines.append("Carrier: Keystone Mutual & Sons Co.")
        if rng.random() < 0.2:
            lines.append("As of Date: March 5, 2024")
        lines.append(rng.choice(headers))
        for _ in range(rng.randint(0, 6)):
            lines.append(rng.choice(line_frags).format(k=rng.randint(1, 99999)))
            if rng.random() < 0.2:
                lines.append("   ")  # whitespace-only line (dropped by both)
        docs.append((i, "\n".join(lines)))
    return docs


def test_wc_cascade_differential(spark):
    """The q28 oracle's SQL replication of the greedy WC cascade must agree
    with the Arrow kernel on RANDOMIZED documents (header variants, tabs,
    pipes, reserve/expense categories, missing headers, blank lines) — not
    just the fixed q28 fixture."""
    from pdf_extraction_ai_agent_spark.entry_queries_ext2 import _q28_sql
    from pdf_extraction_ai_agent_spark.operators.wc_tabular import wc_claims

    docs = _random_wc_texts(150, seed=31)
    sdf = spark.createDataFrame(docs, "doc_id long, extracted_text string")
    got = wc_claims(sdf, keep_cols=["doc_id"]).toPandas()
    con = duckdb.connect()
    con.register("wc_docs", pd.DataFrame(docs, columns=["doc_id", "extracted_text"]))
    exp = con.sql(_q28_sql("SELECT doc_id, extracted_text FROM wc_docs")).df()

    assert sorted(got.columns) == sorted(exp.columns)
    key = sorted(got.columns)
    g = got[key].astype(str).sort_values(key).reset_index(drop=True)
    e = exp[key].astype(str).sort_values(key).reset_index(drop=True)
    assert len(g) == len(e), (len(g), len(e))
    for c in key:
        diffs = (g[c] != e[c])
        assert not diffs.any(), (c, g[diffs].head(3), e[diffs].head(3))


def test_texttables_differential(spark):
    """detect_text_tables (Spark gaps-and-islands) vs the q42 oracle SQL on
    randomized prose/table documents — pipes, tabs, variable column counts,
    lone tabular lines, leading/trailing blank lines."""
    from pdf_extraction_ai_agent_spark.entry_queries_ext6 import _q42_sql
    from pdf_extraction_ai_agent_spark.operators.texttables import detect_text_tables

    rng = random.Random(77)
    line_pool = [
        "plain prose line", "", "   ",
        "a    b", "a  b  c  d", "x\ty\tz", "p | q", "one||two",
        "word", "x  ", "  leading  pair",
    ]
    docs = []
    for i in range(200):
        lines = [rng.choice(line_pool) for _ in range(rng.randint(0, 14))]
        docs.append((i, "\n".join(lines)))
    sdf = spark.createDataFrame(docs, "doc_id long, extracted_text string")
    got = detect_text_tables(sdf, doc_col="doc_id").toPandas()
    con = duckdb.connect()
    con.register("tt_docs", pd.DataFrame(docs, columns=["doc_id", "extracted_text"]))
    exp = con.sql(_q42_sql("SELECT doc_id, extracted_text FROM tt_docs")).df()

    key = sorted(got.columns)
    assert key == sorted(exp.columns)
    g = got[key].astype(str).sort_values(key).reset_index(drop=True)
    e = exp[key].astype(str).sort_values(key).reset_index(drop=True)
    assert len(g) == len(e), (len(g), len(e))
    for c in key:
        assert (g[c] == e[c]).all(), c
