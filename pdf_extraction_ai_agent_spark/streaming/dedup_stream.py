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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import lsh_bands, minhash_signatures


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
    import pandas as pd

    sig = minhash_signatures(stream, id_col, text_col, k)
    bands = lsh_bands(sig)

    def update(key, pdfs, state: GroupState):
        seen: list[int] = list(state.get[0]) if state.exists else []
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for d in pdf["doc_id"]:
                d = int(d)
                for s in seen:
                    if s == d:
                        continue
                    a, b = (s, d) if s < d else (d, s)
                    out_a.append(a)
                    out_b.append(b)
                if max_bucket is None or len(seen) < max_bucket:
                    seen.append(d)
        state.update((seen,))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return bands.groupBy("band_idx", "band_key").applyInPandasWithState(
        update,
        outputStructType="doc_a long, doc_b long",
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
