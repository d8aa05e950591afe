"""Distributed BPE merge training (Sennrich et al. 2016) over the corpus
word-frequency table — the "train a tokenizer on your own corpus" step of
a training-data pipeline, expressed Spark-first.

Shape per merge round: the vocabulary is a BOUNDED table (distinct words +
counts — ⋘ corpus, the only thing that ever leaves the executors), so
pair counting is an explode + partial-aggregated groupBy over it, and the
argmax pair is a one-row collect (a fit parameter, same bounded-stats
class as the IVF centroids / packing bucket totals).  The merge is applied
as a pure string `replace` on the symbolized words — map-only — and the
next round recounts.  At 100 TB only the FIRST step (word counting) sees
the corpus; every merge round runs on the vocabulary table.

Determinism contract (what the DuckDB twin replays exactly):

- symbolization: ' ' || regexp_replace(word, '(.)', '$1 ') || '</w> '
  (every char a symbol, end-of-word marker, space-padded);
- argmax tiebreak: highest total count, then (sym_a, sym_b) ascending
  byte order;
- merge application: non-overlapping left-to-right `replace` of
  ' a b ' with ' ab ' — scanning resumes AFTER the consumed trailing
  space, so an immediately repeated pair inside one word merges its
  first occurrence only per round (Spark's UTF8String.replace, DuckDB's
  replace and Python's str.replace all agree; canonical BPE's
  lookaround regex would also merge the second occurrence — a documented
  divergence that cannot fire on the alnum word-soup corpus and keeps
  every engine bit-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import words_col


def bpe_merges(
    df: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[tuple[int, str, str, int]]]:
    """Returns (vocab, merges): ``vocab`` is the word-frequency table with
    each word's final segmentation after ``n_merges`` learned merges —
    (word, n_occ, bpe_tokens: space-joined symbols) — and ``merges`` is
    the learned [(round, sym_a, sym_b, pair_count), …] list (driver-side,
    bounded: it IS the tokenizer)."""
    from ..plans.cache import tracked_persist

    # persist the bounded word-frequency table (r8, advisor finding): every
    # merge round's argmax collect re-executed the FULL corpus explode +
    # groupBy lineage without it (n_merges+1 corpus scans), contradicting
    # the "only the first step sees the corpus" contract above
    wf = tracked_persist(
        df.select(F.explode(words_col(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    sym = F.concat(
        F.lit(" "),
        F.regexp_replace(F.col("word"), "(.)", "$1 "),
        F.lit("</w> "),
    )
    v = wf.select("word", "n_occ", sym.alias("sym"))
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        s = F.split(F.trim(F.col("sym")), " ")
        pairs = v.select(
            "n_occ",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(s) - 1),
                    lambda i: F.struct(
                        F.element_at(s, i).alias("a"),
                        F.element_at(s, i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        agg = pairs.groupBy("p.a", "p.b").agg(F.sum("n_occ").alias("w"))
        best = (
            agg.orderBy(F.col("w").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, w = best[0]["a"], best[0]["b"], int(best[0]["w"])
        merges.append((r, a, b, w))
        v = v.select(
            "word", "n_occ",
            F.replace(
                F.col("sym"), F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
            ).alias("sym"),
        )
    vocab = v.select(
        "word",
        F.col("n_occ").cast("long").alias("n_occ"),
        F.trim(F.col("sym")).alias("bpe_tokens"),
    )
    return vocab, merges
