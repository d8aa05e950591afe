"""Self-check harness: runs every __spark_entry__ query against its DuckDB
oracle at a given sf dir and reports row-count / schema / value equality —
a local emulation of the driver's CORRECTNESS gate.

Usage: python scripts/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_cell)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(lambda x: (x is None, str(x)))).reset_index(
        drop=True
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pdf_extraction_ai_agent_spark.session import get_spark

    spark = get_spark(app_name="selfcheck", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    # storage-memory discipline: queries() releases the previous query's
    # tracked persists, so the persistent-RDD count must stay bounded by
    # ONE query's working set across the whole 44-query run (round-2
    # verdict item 3). CACHE_CAP = the largest single query's cache count
    # (q12: signatures + token table, plus slack).
    CACHE_CAP = 6
    max_cached = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            n_cached = spark.sparkContext._jsc.getPersistentRDDs().size()
            max_cached = max(max_cached, n_cached)
            if n_cached > CACHE_CAP:
                failures.append(name)
                print(f"[FAIL] {name}: {n_cached} persistent RDDs > cap {CACHE_CAP} (cache leak)")
                continue
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        status = []
        if len(got) != len(exp):
            status.append(f"rowcount {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            status.append(f"columns {sorted(got.columns)} != {sorted(exp.columns)}")
        if not status:
            g, e = _normalize(got), _normalize(exp)
            neq_cols = []
            for c in g.columns:
                if not g[c].equals(e[c]):
                    mask = ~(g[c].astype(object).fillna("∅") == e[c].astype(object).fillna("∅"))
                    n_bad = int(mask.sum())
                    neq_cols.append((c, n_bad))
                    idx = mask.idxmax()
                    print(f"    col {c}: {n_bad} diffs; first: got={g[c][idx]!r} exp={e[c][idx]!r}")
            if neq_cols:
                status.append(f"value diffs in {neq_cols}")
        if status:
            failures.append(name)
            print(f"[FAIL] {name}: {'; '.join(status)}")
        else:
            print(f"[OK]   {name}: {len(got)} rows")
    from pdf_extraction_ai_agent_spark.plans.cache import release_tracked

    release_tracked()
    print()
    print(f"peak persistent RDDs across run: {max_cached} (cap {CACHE_CAP})")
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
