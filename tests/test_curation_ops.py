"""Unit tests for the round-7 curation operators (q85-q90 family):
window exact dedup, URL canonicalization, temperature sampling,
trigram-LM scoring, vocabulary report, semantic dedup."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# window_exact_dedup
# ---------------------------------------------------------------------------


def _wd(spark, rows, window_words=3):
    from pdf_extraction_ai_agent_spark.operators.dedup import window_exact_dedup

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = window_exact_dedup(df, window_words=window_words)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_window_dedup_drops_repeat_across_docs(spark):
    got = _wd(spark, [
        (1, "a b c x y z"),          # both chunks first occurrences
        (2, "a b c q r s"),          # first chunk is doc1's chunk0 → dropped
    ])
    assert got[1]["clean_text"] == "a b c x y z"
    assert got[1]["n_kept"] == 2 and got[1]["n_dropped"] == 0
    assert got[2]["clean_text"] == "q r s"
    assert got[2]["n_kept"] == 1 and got[2]["n_dropped"] == 1


def test_window_dedup_within_doc_and_all_dup(spark):
    got = _wd(spark, [
        (1, "a b c a b c"),          # chunk repeats within the doc
        (2, "a b c"),                # fully duplicate doc survives empty
    ])
    assert got[1]["clean_text"] == "a b c"
    assert got[1]["n_chunks"] == 2 and got[1]["n_dropped"] == 1
    assert got[2]["clean_text"] == "" and got[2]["n_kept"] == 0


def test_window_dedup_first_occurrence_is_positional(spark):
    # same chunk at pos 0 of doc 5 and pos 1 of doc 1: doc 1 pos 1 wins
    # because (doc_id, pos) orders doc-first
    got = _wd(spark, [
        (1, "x y z k e y"),
        (5, "k e y m n o"),
    ])
    assert got[1]["clean_text"] == "x y z k e y"
    assert got[5]["clean_text"] == "m n o"


def test_window_dedup_whitespace_normalized_ragged_tail(spark):
    got = _wd(spark, [(1, "  a   b\tc  d ")], window_words=3)
    # collapse → 'a b c d' → chunks 'a b c' + ragged 'd'
    assert got[1]["clean_text"] == "a b c d"
    assert got[1]["n_chunks"] == 2


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------


CANON_CASES = [
    # mixed-case prefix, www, default port, tracking-everywhere, fragment
    ("HTTP://WWW.Foo.Example.COM:80/Path/?utm_source=x&id=7&utm_campaign=y#f",
     "http://foo.example.com/Path?id=7"),
    # https default port + fbclid-only query + index.html path kept
    ("https://foo.example.com:443/a/index.html?fbclid=abc",
     "https://foo.example.com/a/index.html"),
    # tracking param mid-query, trailing slash before query
    ("https://cdn1.example.net/a/b2/?x=1&utm_medium=email",
     "https://cdn1.example.net/a/b2?x=1"),
    # non-default port is kept; path case preserved
    ("http://Host.example.com:8080/CaseKept", "http://host.example.com:8080/CaseKept"),
    # root path slash is kept (only non-root trailing slashes fold)
    ("https://example.com/", "https://example.com/"),
    # gclid dropped, '&&' re-glued
    ("https://example.com/p?a=1&gclid=g&b=2", "https://example.com/p?a=1&b=2"),
]


@pytest.mark.parametrize("raw,want", CANON_CASES)
def test_canonical_url_spark(spark, raw, want):
    from pdf_extraction_ai_agent_spark.operators.weburls import canonical_url_col

    got = (
        spark.createDataFrame([(raw,)], "url string")
        .select(canonical_url_col(F.col("url")).alias("c"))
        .collect()[0]["c"]
    )
    assert got == want


@pytest.mark.parametrize("raw,want", CANON_CASES)
def test_canonical_url_duckdb_twin(raw, want):
    import duckdb

    from pdf_extraction_ai_agent_spark.operators.weburls import canonical_url_sql

    sql = canonical_url_sql("url")
    got = duckdb.sql(
        f"SELECT {sql} AS c FROM (SELECT '{raw}' AS url)"
    ).fetchone()[0]
    assert got == want


def test_host_extraction(spark):
    from pdf_extraction_ai_agent_spark.operators.weburls import (
        canonicalize_urls,
    )

    df = spark.createDataFrame(
        [(1, 0, "http://a.example.com:8080/x"), (1, 1, "https://WWW.B.org/")],
        "doc_id long, pos int, url string",
    )
    got = {r["url"]: r["host"] for r in canonicalize_urls(df).collect()}
    assert got["http://a.example.com:8080/x"] == "a.example.com"
    assert got["https://WWW.B.org/"] == "b.org"


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------


def test_temperature_sample_flattens_and_is_deterministic(spark):
    from pdf_extraction_ai_agent_spark.operators.curation import (
        temperature_sample,
    )

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df).select("doc_id", "lang", "rate_ppm")
    got = out.collect()
    rates = {r["lang"]: r["rate_ppm"] for r in got}
    # α=1/2 flattening: the small stratum is upsampled relative to its
    # share, the big one downsampled; rates stay ≤ 1e6
    assert rates["small"] > rates["big"]
    assert all(0 < r <= 1_000_000 for r in rates.values())
    # the small stratum keep-rate (in expectation its rate) exceeds its
    # natural 10% share by ~3x: sqrt flattening
    assert rates["small"] > 200_000
    # reproducible membership: a second run selects the same rows
    again = {r["doc_id"] for r in temperature_sample(df).select("doc_id").collect()}
    assert again == {r["doc_id"] for r in got}


def test_temperature_sample_uniform_strata_keep_everything(spark):
    from pdf_extraction_ai_agent_spark.operators.curation import (
        temperature_sample,
    )

    rows = [(i, f"l{i % 4}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df)
    # equal strata → rate_ppm == 1e6 for every stratum → nothing dropped
    assert out.count() == 400


def test_temperature_rates_join_is_broadcast(spark):
    from pdf_extraction_ai_agent_spark.operators.curation import (
        temperature_sample,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, lang string")
    plan = temperature_sample(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# trigram LM scores
# ---------------------------------------------------------------------------


def test_trigram_lm_hand_computed(spark):
    from pdf_extraction_ai_agent_spark.operators.textstats import (
        trigram_lm_scores,
    )

    # corpus: 'abab' ×2 and 'abac'. normalized texts are themselves.
    # trigram starts: aba,bab | aba,bab | aba,bac
    # C3: aba=3, bab=2, bac=1 ; C2(prefix): ab=3+... prefixes: ab(aba)=3,
    # ba(bab,bac)=2+1=3 → p(aba)=3/3, p(bab)=2/3, p(bac)=1/3
    df = spark.createDataFrame(
        [(1, "abab"), (2, "abab"), (3, "abac")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in trigram_lm_scores(df).collect()}
    assert got[1]["n_trigrams"] == 2
    assert got[1]["sum_ppm"] == 1_000_000 + 666_666
    assert got[1]["mean_ppm"] == (1_000_000 + 666_666) // 2
    assert got[3]["sum_ppm"] == 1_000_000 + 333_333
    # short doc scores zeros, keeps its row
    df2 = spark.createDataFrame([(1, "ab"), (2, "abcd")], "doc_id long, text string")
    got2 = {r["doc_id"]: r.asDict() for r in trigram_lm_scores(df2).collect()}
    assert got2[1] == {"doc_id": 1, "n_trigrams": 0, "sum_ppm": 0, "mean_ppm": 0}
    assert got2[2]["n_trigrams"] == 2


# ---------------------------------------------------------------------------
# vocabulary report
# ---------------------------------------------------------------------------


def test_vocab_report_ranks_and_docfreq(spark):
    from pdf_extraction_ai_agent_spark.operators.textstats import vocab_report

    df = spark.createDataFrame(
        [(1, "red red blue"), (2, "red blue green"), (3, "Red!")],
        "doc_id long, text string",
    )
    got = vocab_report(df, top_n=2).collect()
    assert [(r["rank"], r["word"], r["n_occurrences"], r["n_docs"]) for r in got] == [
        (1, "red", 4, 3),   # normalization folds 'Red!' into red
        (2, "blue", 2, 2),
    ]


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_keep_rule_matches_bruteforce(spark):
    import itertools

    import numpy as np

    from pdf_extraction_ai_agent_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 64).astype("float32")
    # plant near-dup pairs (senior id wins)
    vecs[41] = vecs[7] + 0.01 * rng.randn(64).astype("float32")
    vecs[55] = vecs[7] + 0.01 * rng.randn(64).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r.asDict()
           for r in semantic_dedup(df, threshold=0.9, n_centroids=4).collect()}
    assert len(out) == 60
    # independent brute-force check inside each assigned cluster
    centroid = {v: out[v]["centroid_id"] for v in out}
    q = np.round(vecs.astype("float64") * 1_000_000)

    def cos(a, b):
        return round(float(q[a] @ q[b]) / (np.sqrt(q[a] @ q[a]) * np.sqrt(q[b] @ q[b])), 6)

    for v in out:
        seniors = [u for u in out
                   if u < v and centroid[u] == centroid[v] and cos(u, v) >= 0.9]
        if seniors:
            assert out[v]["is_kept"] is False
            assert out[v]["dup_of"] == min(seniors)
        else:
            assert out[v]["is_kept"] is True and out[v]["dup_of"] is None
    # the planted dups are actually exercised (same cluster as their senior)
    assert not out[41]["is_kept"] or centroid[41] != centroid[7]
    assert sum(1 for v in out if not out[v]["is_kept"]) >= 1


def test_semantic_dedup_plan_joins_on_centroid_only(spark):
    import numpy as np

    from pdf_extraction_ai_agent_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(64)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = semantic_dedup(df, threshold=0.9, n_centroids=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# host budget
# ---------------------------------------------------------------------------


def test_host_budget_caps_and_is_deterministic(spark):
    from pdf_extraction_ai_agent_spark.operators.weburls import host_budget

    rows = [(f"h{i % 3}.com", f"https://h{i % 3}.com/p{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "host string, canon_url string")
    out = host_budget(df, k=4).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append((r["rk"], r["canon_url"]))
    assert set(by_host) == {"h0.com", "h1.com", "h2.com"}
    for host, picks in by_host.items():
        assert len(picks) == 4
        assert sorted(rk for rk, _ in picks) == [1, 2, 3, 4]
    again = {(r["host"], r["rk"], r["canon_url"])
             for r in host_budget(df, k=4).collect()}
    assert again == {(r["host"], r["rk"], r["canon_url"]) for r in out}


def test_host_budget_plan_has_window_group_limit(spark):
    from pdf_extraction_ai_agent_spark.operators.weburls import host_budget

    df = spark.createDataFrame(
        [("h.com", "https://h.com/a")], "host string, canon_url string"
    )
    plan = host_budget(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# corpus shuffle
# ---------------------------------------------------------------------------


def test_corpus_shuffle_is_a_permutation_and_bucket_invariant(spark):
    from pdf_extraction_ai_agent_spark.operators.curation import corpus_shuffle

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = {r["doc_id"]: r["shuffle_pos"]
         for r in corpus_shuffle(df, n_buckets=64).collect()}
    assert sorted(a.values()) == list(range(300))
    # not the identity order (it actually shuffles)
    assert [a[i] for i in range(300)] != list(range(300))
    # bucket count shapes the plan, never the positions
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in corpus_shuffle(df, n_buckets=4).collect()}
    assert a == b


def test_corpus_shuffle_no_single_partition_exchange(spark):
    from pdf_extraction_ai_agent_spark.operators.curation import corpus_shuffle

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    plan = corpus_shuffle(df)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# cluster representatives / annotation non-leak
# ---------------------------------------------------------------------------


def test_cluster_representatives_longest_wins(spark):
    from pdf_extraction_ai_agent_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame(
        [(1, 10), (2, 40), (3, 40), (7, 5), (8, 9), (9, 100)],
        "doc_id long, n_chars long",
    )
    clusters = dedup.duplicate_clusters(pairs)
    labeled = docs.join(clusters, "doc_id", "left").select(
        "doc_id", "n_chars",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    reps = {
        r["doc_id"]: r["rnk"] == 1
        for r in labeled.withColumn("rnk", F.row_number().over(w)).collect()
    }
    # cluster {1,2,3}: 2 and 3 tie at 40 chars → smaller id 2 wins
    assert reps == {1: False, 2: True, 3: False, 7: False, 8: True, 9: True}


def test_annotation_text_never_leaks():
    from pdf_extraction_ai_agent_spark.fixtures.minipdf import write_minimal_pdf
    from pdf_extraction_ai_agent_spark.operators.extract import (
        extract_real_pdf_text,
    )
    from pdf_extraction_ai_agent_spark.oracle import reference_extractor as o

    pdf = write_minimal_pdf(
        ["Claim C77 filed by the insured party\nTotal paid 812.00"],
        annots=["note with (parens) and \\backslash and $1,234.56 inside"],
    ).decode("latin-1")
    eng, _ = extract_real_pdf_text(pdf)
    ora, _ = o.extract_real_pdf(pdf)
    assert eng == ora
    assert "parens" not in eng and "1,234.56" not in eng
    assert "Claim C77" in eng


# ---------------------------------------------------------------------------
# BPE merge training
# ---------------------------------------------------------------------------


def test_bpe_merges_hand_computed(spark):
    from pdf_extraction_ai_agent_spark.operators.bpe import bpe_merges

    # the classic Sennrich corpus: low×5 lower×2 newest×6 widest×3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    vocab, merges = bpe_merges(df, n_merges=3)
    # round 0: (e,s)/(s,t)/(t,</w>) tie at 9 → pair-ascending picks (e,s);
    # round 1: (es,t) vs (t,</w>) tie at 9 → (es,t); round 2: (est,</w>)
    assert merges == [(0, "e", "s", 9), (1, "es", "t", 9), (2, "est", "</w>", 9)]
    got = {r["word"]: (r["n_occ"], r["bpe_tokens"]) for r in vocab.collect()}
    assert got == {
        "low": (5, "l o w </w>"),
        "lower": (2, "l o w e r </w>"),
        "newest": (6, "n e w est</w>"),
        "widest": (3, "w i d est</w>"),
    }


def test_bpe_merge_replace_is_boundary_safe(spark):
    from pdf_extraction_ai_agent_spark.operators.bpe import bpe_merges

    # the learned pair merges only at SYMBOL boundaries: 'b c' in word
    # 'bc' must stay untouched when (a,b) merges — the space padding is
    # the boundary. pair weights: (a,b)=5 > (b,</w>)=4 > (b,c)=2
    df = spark.createDataFrame(
        [(1, "ab ab ab abc cab bc")], "doc_id long, text string"
    )
    vocab, merges = bpe_merges(df, n_merges=1)
    assert merges == [(0, "a", "b", 5)]
    got = {r["word"]: r["bpe_tokens"] for r in vocab.collect()}
    assert got["ab"] == "ab </w>"
    assert got["abc"] == "ab c </w>"
    assert got["cab"] == "c ab </w>"
    assert got["bc"] == "b c </w>"  # untouched: b here is not after a


def test_fuzzy_decontamination_flags_cross_split_dups(spark):
    """Planted near-dups that straddle the train/test split must be
    flagged; the candidate join is train-bands × broadcast eval-bands
    (no train-side shuffle for candidates, no cartesian)."""
    import __spark_entry__ as entry

    from pdf_extraction_ai_agent_spark.entry_queries_ext11 import (
        q100_fuzzy_decontamination,
    )

    out = q100_fuzzy_decontamination(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["jaccard"] >= 0.8 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_driver_rotation_is_numeric():
    """q100+ must sort as NEWEST (numeric), not as core (lexicographic
    'q100' < 'q33') — the driver records correctness rows for the first
    50 registered queries only."""
    import re

    import __spark_entry__ as entry

    names = list(entry.queries())

    def qnum(n):
        return int(re.match(r"q(\d+)", n).group(1))

    nums = [qnum(n) for n in names]
    # newest first: the head is the highest-numbered query, and the
    # newest pack (>= q51) is strictly descending
    assert nums[0] == max(nums)
    newest = [x for x in nums if x >= 51]
    assert newest == sorted(newest, reverse=True)
    first50 = set(names[:50])
    # the round-7 curation/HTML pack is inside the driver gate
    for q in ["q91_html_skip_tags", "q98_bpe_merges",
              "q100_fuzzy_decontamination", "q101_corpus_snapshot",
              "q102_langid_confusion", "q103_length_histogram"]:
        assert q in first50
