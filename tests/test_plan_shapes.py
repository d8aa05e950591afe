"""Physical-plan regression tests: the plans we reviewed in PLANS.md must
keep their shape — pruned scans, the mandated shuffle count, broadcast
joins where dims are small, top-N without a global sort."""

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_plan_shape(spark, transcripts_df, tmp_path_factory):
    from pdf_extraction_ai_agent_spark.plans.pipeline import extract_pipeline

    # go through parquet so the scan is a real FileSourceScan with pruning
    path = str(tmp_path_factory.mktemp("plan")) + "/t"
    transcripts_df.write.parquet(path)
    t = spark.read.parquet(path)
    plan = _plan(extract_pipeline(t, num_partitions=4))

    # column pruning reaches the scan: role is never read
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "role" not in m.group(1)
    # exactly the two mandated exchanges (salted pre-UDF + ordering window)
    assert plan.count("Exchange") == 2
    # one Arrow stage, one window
    assert plan.count("ArrowEvalPython") == 1
    assert plan.count("Window") == 1


def test_topk_uses_take_ordered(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["q07_top_claims"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for top-N


def test_recipient_join_is_broadcast(spark, sf_dir):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["q30_recipients"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_record_split_no_extra_shuffle(spark):
    """X1 explode + parse is narrow: zero exchanges over a direct source."""
    from pdf_extraction_ai_agent_spark.operators.records import split_records

    df = spark.createDataFrame(
        [("d1", 0, "Claim# ABC-12345 amount $10.00.\n\nClaim# XYZ-99999.")],
        "conv_id string, turn_idx int, extracted_text string",
    )
    plan = _plan(split_records(df))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from pdf_extraction_ai_agent_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = similarity.cosine_topk_bruteforce(emb, qids, k=10).collect()
    approx = similarity.cosine_topk_ivf(emb, qids, k=10, n_centroids=16, nprobe=6).collect()
    es, as_ = {}, {}
    for r in exact:
        es.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx:
        as_.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(es[q] & as_.get(q, set())) / len(es[q]) for q in es]
    assert sum(recalls) / len(recalls) >= 0.4, f"IVF recall too low: {recalls}"


def test_near_dup_plan_has_no_cartesian(spark, sf_dir):
    """q36's production plan must be band-bucket equi-joins + kernel verify:
    no all-pairs nested loop anywhere (round-1 verdict item 1)."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["q36_embedding_near_dups"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_jaccard_lsh_verify_plan_has_no_cartesian(spark, sf_dir):
    """q12's intersection join must be driven by the LSH candidate pair set,
    not a word-exploded corpus self-join (round-1 verdict item 4)."""
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["q12_jaccard_pairs"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the minhash signature kernel must be in the plan: candidates come from
    # LSH bands, not from the word-exploded quadratic self-join
    assert "MapInPandas" in plan


def test_sinks_roundtrip(spark, tmp_path_factory):
    from pdf_extraction_ai_agent_spark.plans import sinks

    base = str(tmp_path_factory.mktemp("sinks"))
    df = spark.createDataFrame(
        [("f1", "ABC-1", "Jo Doe", "2024-01-01", 1.0, None, "AUTO"),
         ("f2", "XYZ-2", None, None, 0.4, "boom", "WC")],
        "file_path string, claim_number string, name string, date string, confidence double, error string, lob string",
    )
    sinks.write_csv(df, base + "/csv")
    got = spark.read.option("header", True).csv(base + "/csv")
    assert got.columns == sinks.CLI_CSV_COLUMNS

    sinks.write_per_lob(df, base + "/lob")
    back = spark.read.parquet(base + "/lob")
    assert back.count() == 2
    assert {r.lob for r in back.select("lob").distinct().collect()} == {"AUTO", "WC"}
    # per-LOB partition readable directly (the "per-LOB workbook")
    auto = spark.read.parquet(base + "/lob/lob=AUTO")
    assert auto.count() == 1
