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
