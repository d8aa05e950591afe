"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (whole-stage codegen; zero Python in the hot
path) with portable DuckDB twins in entry_queries_ext.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import spec
from ..functions.hashing import md5_long_col
from .dedup import norm_text_col, words_col

# Deterministic stopword tables for the n-gram/stopword language heuristic.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "with", "for", "that", "was"],
    "de": ["der", "die", "das", "und", "ist", "mit", "von", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "avec", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "y", "es", "con", "para", "una", "por"],
}
LANG_ORDER = ["en", "de", "fr", "es"]


def lang_score_col(text: Column, lang: str) -> Column:
    """# of word tokens that are stopwords of ``lang``."""
    w = words_col(text)
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    return F.size(F.filter(w, lambda x: F.array_contains(stop, x)))


def lang_id_col(text: Column) -> Column:
    """argmax over language stopword hits; 'und' (undetermined) when all 0.
    First-wins tiebreak in LANG_ORDER."""
    scores = {l: lang_score_col(text, l) for l in LANG_ORDER}
    best = F.lit("und")
    best_score = F.lit(0)
    for l in reversed(LANG_ORDER):
        take = (scores[l] >= best_score) & (scores[l] > 0)
        best = F.when(take, F.lit(l)).otherwise(best)
        best_score = F.when(take, scores[l]).otherwise(best_score)
    return best


# BPE-ish pre-tokenizer: letter runs / digit runs / single non-space symbol
# (a simplification of the GPT-2 pretokenizer regex).
BPE_ISH_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    text = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(text), r"\s+"))
    bpe_tokens = F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PAT), 0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens.alias("ws_tokens"),
        bpe_tokens.alias("bpe_tokens"),
        F.length(text).alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / alpha ratios + a composite score.

    Ratios are rounded to 6dp doubles (portable); composite =
    0.4·len_ok + 0.3·stopword_ratio-capped + 0.3·(1 - punct_ratio)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    w = words_col(text)
    n_words = F.size(F.filter(w, lambda x: x != ""))
    stop_en = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_en, x)))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    n_alpha = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]"), 0))
    punct_ratio = F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(n_stop.cast("double") / F.greatest(n_words, F.lit(1)), 6)
    alpha_ratio = F.round(n_alpha.cast("double") / F.greatest(n_chars, F.lit(1)), 6)
    len_ok = F.when((n_words >= 10) & (n_words <= 100000), 1.0).otherwise(0.0)
    score = F.round(
        0.4 * len_ok
        + 0.3 * F.least(stop_ratio * 4, F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio * 5, F.lit(1.0))),
        6,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        score.alias("quality_score"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: full-content 60-bit digest over normalized text
    plus a bottom-1 shingle sketch (min word-trigram hash) — the winnowing
    primitive used for fast containment checks."""
    from .dedup import shingles_col

    norm = norm_text_col(F.col(text_col))
    sh = shingles_col(F.col(text_col), 3)
    min_shingle = F.array_min(F.transform(sh, lambda s: md5_long_col(s)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        md5_long_col(norm).alias("content_hash"),
        min_shingle.alias("min_shingle_hash"),
    )


def repetition_scores(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition counters per document (Rae et al. 2021,
    §A1.1 "repetitious" filters) — the training-data quality signal that
    drops boilerplate-heavy pages: duplicate-LINE counts/characters and
    the most-frequent word-BIGRAM share. Emits exact BIGINT counters
    (fractions are a trivial downstream divide; integers hash-compare
    exactly against the DuckDB twin).

    Scale shape: both legs are two-stage aggregations keyed on
    (doc_id, line) / (doc_id, bigram) then doc_id — partial (map-side)
    aggregation applies throughout, no window over the corpus, and the
    final join is doc_id-keyed between two already-aggregated sides.
    Bigrams come from zip_with over the split word array (one light
    concat per word — interpreted HOF, but far below the Arrow-kernel
    threshold measured for minhash), so the whole operator stays in one
    explode + groupBy pipeline per leg.
    """
    text = F.col(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), text.alias("_t"))

    lines = base.select(
        "doc_id", F.explode(F.split("_t", "\n")).alias("line")
    ).where(F.col("line") != "")
    line_groups = lines.groupBy("doc_id", "line").agg(
        F.count("*").alias("cnt")
    )
    lstats = line_groups.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
         .alias("dup_lines"),
        F.sum(F.length("line") * F.col("cnt")).alias("line_chars"),
        F.sum(F.when(F.col("cnt") > 1, F.length("line") * F.col("cnt"))
               .otherwise(0)).alias("dup_line_chars"),
    )

    words = base.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("_t"), r"\s+", " ")), " "
        ).alias("w"),
    )
    n1 = F.greatest(F.size(F.col("w")) - 1, F.lit(0))
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("w"), 1, n1),
                F.slice(F.col("w"), 2, n1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    )
    bigram_groups = bigrams.groupBy("doc_id", "bigram").agg(
        F.count("*").alias("cnt")
    )
    bstats = bigram_groups.groupBy("doc_id").agg(
        F.max("cnt").alias("top_bigram_count"),
        F.sum("cnt").alias("n_bigrams"),
    )

    zero = F.lit(0).cast("long")
    return (
        base.select("doc_id")
        .join(lstats, "doc_id", "left")
        .join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", zero).alias("n_lines"),
            F.coalesce("dup_lines", zero).alias("dup_lines"),
            F.coalesce("line_chars", zero).alias("line_chars"),
            F.coalesce("dup_line_chars", zero).alias("dup_line_chars"),
            F.coalesce("top_bigram_count", zero).alias("top_bigram_count"),
            F.coalesce("n_bigrams", zero).alias("n_bigrams"),
        )
    )


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Deterministic PII scrubbing pass (training-data privacy): masks
    SSN-like, email and phone tokens with fixed placeholders and counts
    each class. Patterns/masks/order are spec data (spec.PII_*) in the
    Java-regex ∩ RE2 subset; scrubbing applies sequentially in
    spec.PII_ORDER with each class counted on the text as already
    scrubbed by earlier classes, so an earlier mask can never
    double-count inside a later pattern. Pure Catalyst expressions —
    regexp_extract_all + regexp_replace stay in whole-stage codegen,
    map-only at any scale."""
    cur = F.col(text_col)
    counts: dict[str, Column] = {}
    for key in spec.PII_ORDER:
        pat = spec.PII_PATTERNS[key]
        counts[key] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("long")
        cur = F.regexp_replace(cur, pat, spec.PII_MASKS[key])
    return df.select(
        F.col(id_col).alias("doc_id"),
        cur.alias("scrubbed_text"),
        counts["ssn"].alias("n_ssns"),
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
    )


# Gopher filtering heuristics (Rae et al. 2021, Table A1). Deterministic
# data consumed by both the Spark operator and the DuckDB twin.
GOPHER_WORD_COUNT = (50, 100_000)
GOPHER_MEAN_WORD_LEN = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1          # '#' and '...' per word
GOPHER_MAX_BULLET_RATIO = 0.9          # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_RATIO = 0.3        # lines ending with an ellipsis
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8      # words containing [A-Za-z]
GOPHER_REQ_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_REQ_STOPWORDS = 2
GOPHER_SYMBOL_PAT = r"#|\.\.\."        # leftmost non-overlapping on both engines
GOPHER_BULLET_PAT = r"^\s*[-•*]"
GOPHER_ELLIPSIS_PAT = r"(\.\.\.|…)\s*$"


def gopher_quality_flags(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Gopher quality-filter composite (Rae et al. 2021 Table A1): word
    count bounds, mean word length bounds, symbol-to-word ratio,
    bullet-line and ellipsis-line ratios, alphabetic-word ratio, and the
    required-stopword presence count, plus the AND of all rules. Ratios
    are 6dp-rounded doubles (portability precedent: quality_scores) and
    the pass flag is computed FROM the rounded values so both engines
    decide boundary cases identically. Pure map-only expressions: array
    HOFs over whitespace words / lines (bounded per document) — no
    shuffle at any scale."""
    text = F.col(text_col)
    raw_words = F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")
    n_words = F.size(raw_words).cast("long")
    nz_words = F.greatest(n_words, F.lit(1)).cast("double")
    word_chars = F.aggregate(
        raw_words, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x).cast("long"))
    mean_word_len = F.round(word_chars.cast("double") / nz_words, 6)
    n_symbols = F.size(F.regexp_extract_all(text, F.lit(GOPHER_SYMBOL_PAT), 0))
    symbol_ratio = F.round(n_symbols.cast("double") / nz_words, 6)
    lines = F.split(text, "\n")
    nz_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(GOPHER_BULLET_PAT)))
    n_ellipsis = F.size(F.filter(lines, lambda l: l.rlike(GOPHER_ELLIPSIS_PAT)))
    bullet_ratio = F.round(n_bullet.cast("double") / nz_lines, 6)
    ellipsis_ratio = F.round(n_ellipsis.cast("double") / nz_lines, 6)
    n_alpha_words = F.size(F.filter(raw_words, lambda x: x.rlike("[A-Za-z]")))
    alpha_word_ratio = F.round(n_alpha_words.cast("double") / nz_words, 6)
    norm_words = words_col(text)
    req = F.array(*[F.lit(s) for s in GOPHER_REQ_STOPWORDS])
    n_req_stop = F.size(
        F.filter(req, lambda s: F.array_contains(norm_words, s))).cast("long")

    out = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_word_ratio.alias("alpha_word_ratio"),
        n_req_stop.alias("n_req_stop"),
    )
    lo_w, hi_w = GOPHER_WORD_COUNT
    lo_m, hi_m = GOPHER_MEAN_WORD_LEN
    return out.withColumn(
        "gopher_pass",
        F.col("n_words").between(lo_w, hi_w)
        & F.col("mean_word_len").between(lo_m, hi_m)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_ratio") <= GOPHER_MAX_BULLET_RATIO)
        & (F.col("ellipsis_ratio") <= GOPHER_MAX_ELLIPSIS_RATIO)
        & (F.col("alpha_word_ratio") >= GOPHER_MIN_ALPHA_WORD_RATIO)
        & (F.col("n_req_stop") >= GOPHER_MIN_REQ_STOPWORDS),
    )


def boilerplate_filter(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """C4-style line-level boilerplate filtering (Raffel et al. 2020
    §2.2), the classic web-corpus cleaning pass. A line survives when its
    rtrim'd form ends in terminal punctuation, it has ≥
    spec.C4_MIN_WORDS_PER_LINE whitespace-delimited tokens, and it does
    not mention spec.C4_BAD_LINE_SUBSTR (lowercased). A document is kept
    when ≥ spec.C4_MIN_KEPT_LINES lines survive and the ORIGINAL text
    contains none of spec.C4_BAD_DOC_SUBSTRS. Returns one row per input
    document (kept and dropped — the boolean lets the caller filter, the
    counters feed audits).

    Scale shape: map-only. The per-line loop is an array higher-order
    filter — interpreted per element, but the alternative (posexplode →
    filter → re-aggregate) costs a full shuffle per document line set,
    which loses at 100 TB; lines-per-document is bounded while documents
    are not, so the HOF sits on the right side of the tradeoff (same
    reasoning as lang_score_col above).
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")

    def _keep(line: Column) -> Column:
        n_words = F.size(F.regexp_extract_all(line, F.lit(r"\S+"), 0))
        return (
            F.rtrim(line).rlike(spec.C4_TERMINAL_PUNCT_PAT)
            & (n_words >= F.lit(spec.C4_MIN_WORDS_PER_LINE))
            & ~F.lower(line).contains(spec.C4_BAD_LINE_SUBSTR)
        )

    kept = F.filter(lines, _keep)
    # all bad-doc substrings are lowercase, so one lowercased probe
    # implements both the case-insensitive and the literal match
    bad_doc = F.lit(False)
    for sub in spec.C4_BAD_DOC_SUBSTRS:
        bad_doc = bad_doc | F.lower(text).contains(sub)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, "\n").alias("cleaned_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        ((F.size(kept) >= F.lit(spec.C4_MIN_KEPT_LINES)) & ~bad_doc)
        .alias("doc_kept"),
    )


# ---------------------------------------------------------------------------
# character n-gram LM quality scoring (CCNet/KenLM-style, integer ppm)
# ---------------------------------------------------------------------------


def trigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document fluency score from a char-trigram LM fit on the corpus
    itself — the shape of CCNet's KenLM perplexity filter (Wenzek et al.
    2020), with the floats made exact: the conditional probability of each
    position, p(c3|c1c2) = C3(tri)/C2(prefix-bigram), is stored as the
    INTEGER floor(10^6·C3/C2) (ppm), so the per-document sum/mean are
    BIGINT-exact and the DuckDB twin hash-matches bit-for-bit (no libm
    log/pow anywhere; a downstream consumer converts mean_ppm to a
    perplexity-like score with whatever log base it likes).

    Scale shape: positions explode map-only; the trigram count table is
    bounded by charset³ (⋘ corpus) and partial-aggregates before its one
    shuffle; scoring re-joins counts onto positions BY TRIGRAM — at 100 TB
    broadcast the counts table (bounded) so the per-position join is
    map-side; the final per-doc rollup shuffles on doc_id with partial
    sums.  Both legs re-derive trigrams from the base rather than sharing
    an .alias() plan (the self-join mis-resolution trap).

    Returns (doc_id, n_trigrams, sum_ppm, mean_ppm); documents shorter
    than 3 chars score (0, 0, 0).
    """
    norm = norm_text_col(F.col(text_col))

    def _positions(d: DataFrame) -> DataFrame:
        t = norm.alias("t")
        base = d.select(F.col(id_col), t)
        # sequence(1, 0) is DESCENDING in Spark (not empty) — guard <3 chars
        tris = F.when(
            F.length("t") >= 3,
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 2),
                lambda i: F.substring(F.col("t"), i, 3),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return base.select(id_col, F.explode(tris).alias("tri"))

    pos = _positions(df)
    tri_counts = (
        _positions(df)
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("c3"))
        .withColumn("big", F.substring("tri", 1, 2))
    )
    big_counts = tri_counts.groupBy("big").agg(F.sum("c3").alias("c2"))
    counts = tri_counts.join(F.broadcast(big_counts), "big").select(
        "tri", "c3", "c2"
    )
    scored = pos.join(F.broadcast(counts), "tri").select(
        id_col,
        F.expr("c3 * 1000000 DIV c2").alias("ppm"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum("ppm").alias("sum_ppm"),
    )
    ids = df.select(id_col)
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_trigrams"), F.lit(0)).cast("long").alias("n_trigrams"),
        F.coalesce(F.col("sum_ppm"), F.lit(0)).cast("long").alias("sum_ppm"),
        F.coalesce(
            F.expr("sum_ppm DIV n_trigrams"), F.lit(0)
        ).cast("long").alias("mean_ppm"),
    )


# ---------------------------------------------------------------------------
# corpus vocabulary report (top-k word frequencies)
# ---------------------------------------------------------------------------


def vocab_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    top_n: int = 50,
) -> DataFrame:
    """Corpus-level vocabulary frequency report: the ``top_n`` words by
    total occurrences with document frequency and rank — the standard
    first look at a crawled corpus (tokenizer coverage, stopword sanity,
    boilerplate tokens that dominate).

    Scale shape: words explode map-only; occurrence counts partial-agg
    into one shuffle keyed on the word; the doc-frequency leg counts
    DISTINCT (word, doc) pairs via a pre-distinct (two-stage, no expand);
    the global top-k filter is the literal row_number()<=k adjacent to its
    window, so Catalyst plans the map-side WindowGroupLimit (no single
    partition sees more than k rows per upstream task).
    """
    from pyspark.sql import Window

    w = df.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("word")
    ).where(F.col("word") != "")
    occ = w.groupBy("word").agg(F.count(F.lit(1)).alias("n_occurrences"))
    docf = (
        w.select("word", id_col)
        .distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    merged = occ.join(docf, "word")
    win = Window.orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    return (
        merged.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= top_n)
        .select(
            F.col("rank").cast("int").alias("rank"),
            "word",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )
