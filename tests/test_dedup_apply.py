"""Applying dedup: keep-list policy and connected-component clustering."""

from pdf_extraction_ai_agent_spark.operators import dedup


def test_keep_list(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    kept = {r.doc_id for r in dedup.dedup_keep_list(docs, pairs).collect()}
    assert kept == {1, 4, 5, 7}  # 2,3,6 are larger sides of pairs


def test_duplicate_clusters_transitive(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: min-label propagation must
    # carry 1 across the whole chain (transitivity)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_clusters_long_chain_pointer_doubling(spark):
    """A 41-node chain (diameter 40) must converge well inside the round
    cap: pointer doubling gives O(log d) rounds where plain min-label
    propagation would need 40. Also exercises the adversarial shape the
    round-1 verdict flagged (silent partial labels past max_iters)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 41)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(pairs, max_iters=9).collect()}
    assert got == {i: 1 for i in range(1, 42)}


def test_duplicate_clusters_raises_on_non_convergence(spark):
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 20)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(pairs, max_iters=1)


def test_clusters_from_lsh_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),
        (3, "the quick brown fox leaps over the lazy dog near the river bank"),
        (4, "completely different content about spark shuffle partitions and joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.3)
    clusters = {r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(pairs).collect()}
    assert clusters.get(1) == 1 and clusters.get(2) == 1 and clusters.get(3) == 1
    assert 4 not in clusters  # no near-dups → not in the pair graph
