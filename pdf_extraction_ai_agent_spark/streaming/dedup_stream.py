"""Streaming incremental near-dup candidates — the custom stateful operator
(``applyInPandasWithState``) the batch LSH family lacks: as transcripts
arrive, each doc's minhash bands are checked against the PER-BUCKET state of
previously seen docs, so near-dup pairs surface incrementally instead of
waiting for a full-corpus batch pass.

Shape: readStream → signature kernel (map-only mapInPandas, same
dedup.minhash_signatures) → band explode → groupBy(band_idx, band_key) →
applyInPandasWithState: state = the doc ids seen in this bucket (capped —
the streaming twin of lsh_candidates(max_bucket=…)); each incoming doc
emits a pair against every state member, then joins the state. Candidates
feed the same exact-verify stages as the batch path (jaccard_pairs /
pair_scores_exact) in foreachBatch.

Completeness contract (pinned in tests): with an uncapped bucket, the union
of emitted pairs over all microbatches == batch ``lsh_candidates`` on the
same corpus, regardless of how the input is split into triggers — ordering
inside a batch pairs each doc against earlier arrivals, state carries
buckets across batches.

Capped contract (``max_bucket``): mirrors batch
``lsh_candidates(max_bucket)`` — a bucket whose membership exceeds the cap
is POISONED: it emits nothing from the microbatch in which it crossed the
cap onward, and its member list is dropped from state (only the flag
remains). The one divergence from the batch twin, inherent to append-mode
streaming: pairs this bucket emitted in EARLIER microbatches were already
delivered and cannot be retracted, whereas the batch form emits none.
Pinned in tests/test_multimodal_streaming.py::
test_streaming_lsh_capped_bucket_poisons.

STATE SCHEMA v2 (`seen array<long>, poisoned boolean`): checkpoints
written by the v1 schema (`seen array<long>` only) cannot resume into this
version — applyInPandasWithState rejects the schema change. Upgrading a
live stream requires draining it and starting from a fresh checkpoint (the
batch path backfills candidates for anything missed in between).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import lsh_bands, minhash_signatures


def _stateful_bucket_pairs(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    """Shared stateful core: a (doc_id, band_idx, band_key) stream →
    (doc_a, doc_b) pairs against the per-bucket state of earlier arrivals.
    Used by both the minhash text path and the sign-LSH embedding path —
    the banding differs, the bucket-state pairing is identical."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        # poisoned mirrors batch lsh_candidates(max_bucket): a bucket whose
        # membership exceeds the cap contributes NO pairs there, so once the
        # (cap+1)-th member arrives this bucket stops emitting forever and
        # drops its member list (state shrinks to the flag). The one
        # unavoidable divergence from the batch twin is documented in the
        # module docstring: pairs emitted before the bucket crossed the cap
        # cannot be retracted in append mode.
        if state.exists:
            seen: list[int] = list(state.get[0])
            poisoned: bool = bool(state.get[1])
        else:
            seen, poisoned = [], False
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for d in pdf["doc_id"]:
                if poisoned:
                    break
                d = int(d)
                if max_bucket is not None and len(seen) >= max_bucket:
                    seen, poisoned = [], True
                    out_a, out_b = [], []  # this microbatch's emissions die too
                    break
                for s in seen:
                    if s == d:
                        continue
                    a, b = (s, d) if s < d else (d, s)
                    out_a.append(a)
                    out_b.append(b)
                seen.append(d)
        state.update((seen, poisoned))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return bands.groupBy("band_idx", "band_key").applyInPandasWithState(
        update,
        outputStructType="doc_a long, doc_b long",
        stateStructType="seen array<long>, poisoned boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_lsh_candidates(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs, emitted as docs arrive. Pairs may
    repeat across bands (same as the pre-distinct batch candidate stream) —
    the downstream verify stage dedups per microbatch."""
    sig = minhash_signatures(stream, id_col, text_col, k)
    return _stateful_bucket_pairs(lsh_bands(sig), max_bucket)


def streaming_embedding_lsh_candidates(
    stream: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Streaming near-dup candidates over an EMBEDDING stream: the sign-LSH
    banding of similarity.embedding_near_dup_pairs (exact-integer
    rh_signatures_exact → band explode) feeding the same per-bucket stateful
    pairing as the text path. Union over microbatches == the batch sign-LSH
    candidate set (pinned in tests/test_multimodal_streaming.py::
    test_streaming_embedding_lsh_matches_batch); verify stages
    (pair_scores_exact + cosine threshold) run per microbatch in
    foreachBatch exactly as in batch."""
    from ..operators.similarity import (
        PROD_BAND_BITS,
        PROD_N_PLANES,
        _band_explode,
        rh_signatures_exact,
    )

    sig = rh_signatures_exact(
        stream, n_planes=PROD_N_PLANES, id_col=id_col, vec_col=vec_col
    )
    bands = _band_explode(sig, n_planes=PROD_N_PLANES, band_bits=PROD_BAND_BITS).select(
        F.col("vid").alias("doc_id"), "band_idx", "band_key"
    )
    return _stateful_bucket_pairs(bands, max_bucket)


def streaming_window_dedup_chunks(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 12,
) -> DataFrame:
    """Streaming twin of ``dedup.window_exact_dedup``'s keep decision: as
    documents arrive, each word-window chunk is checked against the
    PER-DIGEST state of previously seen chunks and only first occurrences
    are emitted — the incremental ExactSubstr pass (new crawl snapshots
    dedup against everything already ingested without a full-corpus
    rescan).

    Shape: stream → chunk_hashes (map-only, the shared batch kernel) →
    groupBy(h) → applyInPandasWithState (state = the first (doc_id, pos)
    ever seen for this digest). Within a microbatch the group winner is
    min(doc_id, pos) — identical to the batch rule; across microbatches
    the stored first wins.

    Contract (pinned in tests): when triggers arrive in ascending doc_id
    order — the lineage/resume ingestion order — the union of emitted
    chunks over all microbatches equals the batch keep set for the same
    corpus, for any trigger split. Inherent append-mode caveat: if a
    LATER trigger carries a smaller (doc_id, pos) than an already-emitted
    chunk, the earlier emission cannot be retracted (the batch form would
    have kept only the smaller one); doc-ordered ingestion makes that
    impossible.
    """
    import pandas as pd

    from ..operators.dedup import chunk_hashes

    hashed = chunk_hashes(stream_df, text_col, id_col, window_words)

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        # id_col, not a hardcoded 'doc_id' (advisor finding: chunk_hashes
        # names its id column after id_col, so a non-default caller raised
        # KeyError here)
        rows = rows.sort_values([id_col, "pos"]).reset_index(drop=True)
        best = rows.iloc[0]
        if state.exists:
            return  # digest already represented by an earlier trigger
        state.update((int(best[id_col]), int(best["pos"])))
        yield pd.DataFrame(
            {
                id_col: [int(best[id_col])],
                "pos": [int(best["pos"])],
                "chunk": [best["chunk"]],
            }
        )

    return (
        hashed.groupBy("h")
        .applyInPandasWithState(
            update,
            outputStructType=f"{id_col} long, pos int, chunk string",
            stateStructType="d long, p int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
