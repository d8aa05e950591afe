"""Dedup + similarity operator semantics on controlled fixtures."""

import pytest
from pyspark.sql import functions as F

from pdf_extraction_ai_agent_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup
        (3, "The quick brown fox jumps over the lazy dog near the river bank!"),  # normalized dup
        (4, "the quick brown fox leaps over the lazy dog near the river bank"),  # near dup (1 word)
        (5, "completely different content about spark shuffle partitions and joins"),
        (6, "totally unrelated text mentioning adaptive query execution and codegen"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = dedup.exact_dedup_groups(docs).collect()
    by_canon = {r.canonical_doc_id: r.n_docs for r in groups}
    assert by_canon[1] == 3  # 1, 2, 3 collapse after normalization
    assert by_canon[4] == 1
    assert len(groups) == 4


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0
    assert (1, 4) in pairs  # near-dup must surface
    assert not any({5, 6} & {a, b} for a, b in pairs)


def test_simhash_hamming(docs):
    sig = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    ham = lambda a, b: bin(sig[a] ^ sig[b]).count("1")
    assert ham(1, 2) == 0
    assert ham(1, 3) == 0
    assert ham(1, 4) <= 8
    assert ham(1, 5) > 8

    pairs = {(r.doc_a, r.doc_b) for r in dedup.simhash_pairs(docs, max_hamming=8).collect()}
    assert (1, 2) in pairs and (1, 4) in pairs


def test_jaccard_exact(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.7 < pairs[(1, 4)] < 1.0


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = similarity.cosine_topk_bruteforce(emb, qids, k=10).collect()
    approx = similarity.cosine_topk_lsh(emb, qids, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5, f"mean LSH recall too low: {recalls}"


def test_ann_bruteforce_self_consistency(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.cosine_topk_bruteforce(emb, [0], k=5).collect()
    assert len(out) == 5
    cosines = [r.cosine for r in out]
    assert cosines == sorted(cosines, reverse=True)
    assert all(-1.0 <= c <= 1.0 for c in cosines)
