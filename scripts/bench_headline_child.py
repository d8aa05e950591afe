"""A/B headline child: run the named entry queries once in a fresh JVM
against the code tree at ``root`` (HEAD or a baseline-commit worktree) and
print ONE JSON line ``{"queries": {name: sec|null}, "root": ...}``.

Used by bench.py's variance-proof protocol (round-3 verdict item 2): HEAD
and the previous round's commit run INTERLEAVED (B,H,B,H,...) in one bench
session, ≥3 reps each, so multi-minute host-interference bursts land on
both arms equally and a machine drift can never masquerade as a per-query
regression. Queries absent from a tree's ``queries()`` (newer additions)
report null there.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root, sf_dir, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    root = os.path.abspath(root)
    os.chdir(root)
    sys.path.insert(0, root)

    from pyspark.sql import functions as F

    from pdf_extraction_ai_agent_spark.session import get_spark

    spark = get_spark(
        app_name="bench_ab_child", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    import __spark_entry__ as entry

    qs = entry.queries()

    def run(name: str) -> float | None:
        fn = qs.get(name)
        if fn is None:
            return None
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        # same full-evaluation action as bench.py's in-process headline
        df.agg(
            F.count(F.lit(1)),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])),
        ).collect()
        return round(time.monotonic() - t0, 3)

    # untimed warmup: python-worker imports + codegen paid before timing
    warm = next((n for n in names if n in qs), None)
    if warm:
        run(warm)

    out = {n: run(n) for n in names}
    spark.stop()
    print(json.dumps({"queries": out, "root": root}))


if __name__ == "__main__":
    main()
