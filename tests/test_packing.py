"""Sequence packing (q82): two-phase global prefix sum — hand goldens,
bucket-count invariance, empty-input/empty-doc edges, and the
no-SinglePartition plan pin (the naive global window is the scale-killer
this operator exists to avoid)."""

import pytest

from pyspark.sql import functions as F

from pdf_extraction_ai_agent_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def spark():
    from pdf_extraction_ai_agent_spark.session import get_spark

    return get_spark(master="local[4]")


def test_hand_golden_offsets(spark):
    # BPE-ish tokens: letter runs / digit runs / single symbol
    rows = [
        (0, "aa bb cc"),        # 3 tokens  -> start 0
        (1, "x1 y,z"),          # x,1,y,',',z = 5 -> start 3
        (2, ""),                # 0 tokens  -> start 8
        (3, "one two"),         # 2 tokens  -> start 8
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in pack_sequences(df, ctx=4, n_buckets=2).collect()}
    assert got[0] == {"doc_id": 0, "n_tokens": 3, "start_offset": 0,
                      "first_seq": 0, "last_seq": 0}
    # doc 1 spans tokens [3, 8) -> sequences 0 and 1 with ctx=4
    assert got[1] == {"doc_id": 1, "n_tokens": 5, "start_offset": 3,
                      "first_seq": 0, "last_seq": 1}
    # empty doc pins to its boundary
    assert got[2] == {"doc_id": 2, "n_tokens": 0, "start_offset": 8,
                      "first_seq": 2, "last_seq": 2}
    assert got[3] == {"doc_id": 3, "n_tokens": 2, "start_offset": 8,
                      "first_seq": 2, "last_seq": 2}


def test_bucket_count_invariance(spark):
    rows = [(i, "w " * (i % 7)) for i in range(0, 200, 3)]  # gappy ids
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = sorted(pack_sequences(df, ctx=16, n_buckets=1).collect())
    for nb in (2, 8, 64):
        assert sorted(pack_sequences(df, ctx=16, n_buckets=nb).collect()) == base


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = pack_sequences(df)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "start_offset",
                           "first_seq", "last_seq"]


def test_no_single_partition_exchange(spark):
    df = spark.createDataFrame([(i, "a b c") for i in range(10)],
                               "doc_id long, text string")
    phys = pack_sequences(df)._jdf.queryExecution().sparkPlan().toString()
    assert "SinglePartition" not in phys
    assert "BroadcastHashJoin" in phys
