"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline. Exact integer
  arithmetic via fixed-point quantization (×10^6 → bigint) so dot products
  and norms are order-independent and bit-identical in any engine; cosine is
  then one deterministic double division.
- LSH-bucketed variant (random-hyperplane signs): the scale path — queries
  only join candidates sharing a signature band instead of the full corpus.

Scale notes: brute force is a broadcast join (queries are tiny) over a
narrow map — no shuffle on the corpus side; at 10^9+ vectors switch to the
LSH variant or an IVF partitioner (cluster-id column + shuffle-free pruning
by partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000  # fixed-point scale for exact integer dot products


def quantize_col(vec: Column) -> Column:
    return F.transform(vec, lambda x: F.round(x.cast("double") * QUANT).cast("long"))


def dot_int_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def norm2_int_col(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_topk_bruteforce(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    Plan: broadcast the (tiny) query set against the corpus, integer dot +
    norms, rank per query with a window. Ties broken by neighbor id.
    """
    base = emb.select(F.col(id_col).alias("vid"), quantize_col(F.col(vec_col)).alias("q"))
    queries = base.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"), F.col("q").alias("qv")
    )
    pairs = base.join(F.broadcast(queries), F.col("vid") != F.col("query_id"))
    dot = dot_int_col(F.col("qv"), F.col("q"))
    cos = dot.cast("double") / (
        F.sqrt(norm2_int_col(F.col("qv")).cast("double"))
        * F.sqrt(norm2_int_col(F.col("q")).cast("double"))
    )
    scored = pairs.select(
        "query_id", F.col("vid").alias("neighbor_id"), F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# --- random-hyperplane LSH (scale path) -------------------------------------

import random as _random

_rng = _random.Random(11)
N_PLANES = 16


def _planes(dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes (seeded)."""
    return [[_rng.choice((-1, 1)) for _ in range(dim)] for _ in range(N_PLANES)]


def rh_signature_col(vec: Column, planes: list[list[int]]) -> Column:
    """Sign signature as a 16-bit int: bit_i = 1 iff <vec, plane_i> > 0."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(p) for p in plane]), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return sig


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family): all pairs with
    cosine ≥ threshold.

    Small corpora: blocked self-join (O(n²/blocks)). At scale set
    ``n_blocks=0`` → use the sign-LSH bands from ``cosine_topk_lsh`` as the
    blocking key instead of brute force; here the exact form doubles as the
    verification stage. Exact integer arithmetic (see module docstring), so
    the DuckDB oracle replays it bit-for-bit.
    """
    base = emb.select(F.col(id_col).alias("vid"), quantize_col(F.col(vec_col)).alias("q"))
    l = base.select(F.col("vid").alias("id_a"), F.col("q").alias("qa"))
    r = base.select(F.col("vid").alias("id_b"), F.col("q").alias("qb"))
    pairs = l.join(r, F.col("id_a") < F.col("id_b"))
    cos = dot_int_col(F.col("qa"), F.col("qb")).cast("double") / (
        F.sqrt(norm2_int_col(F.col("qa")).cast("double"))
        * F.sqrt(norm2_int_col(F.col("qb")).cast("double"))
    )
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_assignments(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer, deterministic flavor: the centroids are the
    first ``n_centroids`` vectors by id (a seeded/deterministic stand-in for
    a k-means fit, which at cluster scale runs as a separate job); every
    vector is assigned to its max-cosine centroid.

    This is the scale path's partitioner: writing the corpus partitioned by
    ``centroid_id`` makes ANN queries prune to nprobe partitions — no
    shuffle at query time at all.
    """
    base = emb.select(F.col(id_col).alias("vid"), quantize_col(F.col(vec_col)).alias("q"))
    cents = (
        base.orderBy("vid").limit(n_centroids)
        .select(F.col("vid").alias("centroid_id"), F.col("q").alias("cq"))
    )
    joined = base.join(F.broadcast(cents))
    cos = dot_int_col(F.col("q"), F.col("cq")).cast("double") / (
        F.sqrt(norm2_int_col(F.col("q")).cast("double"))
        * F.sqrt(norm2_int_col(F.col("cq")).cast("double"))
    )
    scored = joined.select("vid", "centroid_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("vid").orderBy(F.col("cosine").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(F.col("vid").alias("vec_id"), "centroid_id", F.col("cosine").alias("centroid_cosine"))
    )


def cosine_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-pruned ANN: score only vectors whose centroid is among the
    query's ``nprobe`` closest centroids. Exact re-rank on the candidate
    set; recall vs brute force asserted in tests."""
    base = emb.select(F.col(id_col).alias("vid"), quantize_col(F.col(vec_col)).alias("q"))
    assign = ivf_assignments(emb, n_centroids, id_col, vec_col)
    corpus = base.join(assign, base.vid == assign.vec_id).select("vid", "q", "centroid_id")

    cents = (
        base.orderBy("vid").limit(n_centroids)
        .select(F.col("vid").alias("centroid_id"), F.col("q").alias("cq"))
    )
    queries = base.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"), F.col("q").alias("qv")
    )
    qc = queries.join(F.broadcast(cents))
    qc_cos = dot_int_col(F.col("qv"), F.col("cq")).cast("double") / (
        F.sqrt(norm2_int_col(F.col("qv")).cast("double"))
        * F.sqrt(norm2_int_col(F.col("cq")).cast("double"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("centroid_id").asc())
    probes = (
        qc.select("query_id", "qv", "centroid_id", qc_cos.alias("c"))
        .withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    cand = corpus.join(F.broadcast(probes), "centroid_id").filter(F.col("vid") != F.col("query_id"))
    cos = dot_int_col(F.col("qv"), F.col("q")).cast("double") / (
        F.sqrt(norm2_int_col(F.col("qv")).cast("double"))
        * F.sqrt(norm2_int_col(F.col("q")).cast("double"))
    )
    scored = cand.select("query_id", F.col("vid").alias("neighbor_id"), F.round(cos, 6).alias("cosine")).distinct()
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def cosine_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: 16 hyperplane sign bits → 8 bands of 2 bits;
    candidates share ≥1 band, then exact cosine re-ranking on candidates
    only. For moderate-cosine neighbors (p_bit ≈ 0.6) this gives
    1-(1-p²)^8 ≈ 0.97 recall while pruning most of the corpus.
    """
    planes = _planes(dim)
    base = emb.select(
        F.col(id_col).alias("vid"),
        quantize_col(F.col(vec_col)).alias("q"),
        rh_signature_col(F.col(vec_col), planes).alias("sig"),
    )
    bands = base.select(
        "vid", "q",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"),
                         F.shiftright(F.col("sig"), 2 * b).bitwiseAND(F.lit(3)).alias("band_key"))
                for b in range(8)
            ])
        ).alias("band"),
    ).select("vid", "q", "band.band_idx", "band.band_key")
    qb = bands.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"), F.col("q").alias("qv"), "band_idx", "band_key"
    )
    cand = (
        bands.join(F.broadcast(qb), ["band_idx", "band_key"])
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", "qv", "vid", "q")
        .distinct()
    )
    cos = dot_int_col(F.col("qv"), F.col("q")).cast("double") / (
        F.sqrt(norm2_int_col(F.col("qv")).cast("double"))
        * F.sqrt(norm2_int_col(F.col("q")).cast("double"))
    )
    scored = cand.select("query_id", F.col("vid").alias("neighbor_id"), F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
