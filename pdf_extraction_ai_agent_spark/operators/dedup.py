"""Deduplication operators for large-scale training-data pipelines.

Four families, all declarative DataFrame plans (scale notes inline):

- exact        hash-groupBy on normalized text. One shuffle on a 60-bit
               digest; at 100 TB use the digest (not the text) as the
               shuffle key so shuffle rows are ~50 bytes, not documents.
- minhash+LSH  shingle → minhash signature (narrow map + partial min-agg)
               → band buckets → bucket self-join (shuffle bounded by bucket
               sizes) → similarity estimate from signatures. No O(n²) pair
               enumeration; the classic MMDS construction.
- simhash      64-bit sign-aggregated word-hash; near-dups = small Hamming
               distance. Computed with explode + groupBy bit-sums (narrow +
               one partial agg); banding on 16-bit chunks for candidates.
- n-gram jaccard  exact verification on candidate pairs (or small corpora):
               explode distinct words, equi-join, count ratio.

Everything uses the portable md5-based hash (functions/hashing.py) so the
DuckDB oracles replay the exact same numbers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    LSH_BAND_SIZE,
    NUM_PERMS,
    md5_long_col,
    minhash_col,
)

# ---------------------------------------------------------------------------
# text normalization + shingling (shared)
# ---------------------------------------------------------------------------


def norm_text_col(text: Column) -> Column:
    """lowercase, non-alnum → space, collapse runs, trim."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "), " +", " ")
    )


def words_col(text: Column) -> Column:
    return F.split(norm_text_col(text), " ")


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles (document order, may repeat)."""
    w = words_col(text)
    idx = F.sequence(F.lit(1), F.size(w) - (k - 1))
    return F.when(
        F.size(w) >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array())


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of exact duplicates after normalization: one row per content
    digest with the canonical (min) id and the duplicate count."""
    digest = md5_long_col(norm_text_col(F.col(text_col)))
    return (
        df.select(F.col(id_col).alias("doc_id"), digest.alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       k: int = 3) -> DataFrame:
    """(doc_id, mh_0..mh_{NUM_PERMS-1}) — min over shingle hashes per
    permutation. Plan: explode shingles (narrow) → 16 partial-min aggregates
    in ONE groupBy (single shuffle keyed by doc_id)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(F.col(text_col), k)).alias("shingle"),
    )
    h = md5_long_col(F.col("shingle"))
    aggs = [F.min(minhash_col(h, i)).alias(f"mh_{i}") for i in range(NUM_PERMS)]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_bands(sig: DataFrame) -> DataFrame:
    """Signature → (doc_id, band_idx, band_key). band_key is the md5-long of
    the ':'-joined band slice — tiny shuffle rows."""
    n_bands = NUM_PERMS // LSH_BAND_SIZE
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh_{b * LSH_BAND_SIZE + j}").cast("string") for j in range(LSH_BAND_SIZE)]
        bands.append(
            F.struct(F.lit(b).alias("band_idx"),
                     md5_long_col(F.concat_ws(":", *cols)).alias("band_key"))
        )
    return sig.select("doc_id", F.explode(F.array(*bands)).alias("band")).select(
        "doc_id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 3, threshold: float = 0.5) -> DataFrame:
    """Candidate near-dup pairs from LSH buckets, scored by the signature
    jaccard estimate (fraction of agreeing minhashes), thresholded.

    Scale: the only non-broadcast shuffle is the self-join on
    (band_idx, band_key); AQE's skew-join split handles hot buckets, and a
    bucket-size cap can be added upstream for adversarial corpora.
    """
    sig = minhash_signatures(df, id_col, text_col, k)
    # disjoint column names on every leg — Spark's self-join lineage
    # dedup silently mis-resolves `alias().col` chains over a shared plan
    bands = lsh_bands(sig)
    left = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    cand = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(NUM_PERMS)])
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(NUM_PERMS)])
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(NUM_PERMS)
    )
    scored = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (matches.cast("double") / F.lit(float(NUM_PERMS))).alias("est_jaccard"),
        )
    )
    return scored.filter(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32  # 32-bit keeps the bit-sum explode at 32×words rows


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — sign aggregation over DISTINCT word hashes.

    Plan: explode distinct words → explode bit index (0..31) → groupBy doc
    summing ±1 per bit → assemble integer. Two narrow explodes + one
    shuffle. At 100 TB, fold the bit loop into a pandas UDF to cut the 32×
    row blow-up; kept declarative here for Catalyst visibility.
    """
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(words_col(F.col(text_col)))).alias("word"),
    ).filter(F.col("word") != "")
    h = md5_long_col(F.col("word"))
    bit = F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit")
    wb = w.select("doc_id", h.alias("h"), bit)
    # column-valued shift amounts need the SQL form (the python helper only
    # takes literals)
    contrib = F.when(F.expr("shiftright(h, cast(bit as int)) & 1") == 1, 1).otherwise(-1)
    sums = wb.groupBy("doc_id", "bit").agg(F.sum(contrib).alias("s"))
    assembled = sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), cast(bit as int))")).otherwise(0)
        ).alias("simhash")
    )
    return assembled


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash banding: split the 32-bit sig into 4 bytes;
    pairs sharing ≥1 byte-band are candidates (pigeonhole covers ≤3 flips),
    verified by exact Hamming distance."""
    sig = simhash(df, id_col, text_col)
    bands = sig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"),
                         F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255)).alias("band_key"))
                for b in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_key")
    l = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"),
                     "band_idx", "band_key")
    r = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"),
                     "band_idx", "band_key")
    cand = (
        l.join(r, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    return cand.select(
        "doc_a", "doc_b",
        hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# exact n-gram / word-set jaccard
# ---------------------------------------------------------------------------


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  block_col: str | None = None, threshold: float = 0.5) -> DataFrame:
    """Exact word-set jaccard via explode + equi-join on words.

    Scale: quadratic within a block — use ONLY as the verification stage on
    LSH candidates (or with a strong blocking key). ``block_col`` restricts
    pairs to equal blocks.
    """
    w = df.select(
        F.col(id_col).alias("doc_id"),
        *( [F.col(block_col).alias("block")] if block_col else [] ),
        F.explode(F.array_distinct(words_col(F.col(text_col)))).alias("word"),
    ).filter(F.col("word") != "")
    sizes = w.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_words"))
    join_keys = ["word"] + (["block"] if block_col else [])
    l = w.select(F.col("doc_id").alias("doc_a"), *join_keys)
    r = w.select(F.col("doc_id").alias("doc_b"), *join_keys)
    inter = (
        l.join(r, join_keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_words").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_words").alias("nb"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)
