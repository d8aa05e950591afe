"""Round-8 optimization harness (guide §1.4/§1.5) — NOT the driver bench.

Per named query: time the PYTHON-SIDE BUILD (``fn(spark, sf_dir)`` — plan
construction, seed jobs, release_tracked), then the noop-sink execution
(full evaluation of every column, no agg), then the bench-style
count+xxhash agg action bench.py uses.  Optionally dumps
``explain("formatted")`` to plans/r08/<query>_<tag>.txt.

Usage:
    python bench_extra.py [--tag before] [--reps 2] q45_lattice_tables ...
    (no names → the bench HEADLINE list)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    tag = None
    reps = 1
    names = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from bench import HEADLINE
    from pdf_extraction_ai_agent_spark.session import get_spark

    if not names:
        names = HEADLINE

    spark = get_spark(
        app_name="bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        row: dict = {}
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name} build")
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            t1 = time.monotonic()
            if tag and rep == 0:
                os.makedirs("plans/r08", exist_ok=True)
                with open(f"plans/r08/{name}_{tag}.txt", "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            spark.sparkContext.setJobDescription(f"{name} noop")
            t2 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.monotonic()
            spark.sparkContext.setJobDescription(f"{name} agg")
            df2 = fn(spark, SF_DIR)
            t4 = time.monotonic()
            df2.agg(
                F.count(F.lit(1)),
                F.max(F.xxhash64(*[F.col(c) for c in df2.columns])),
            ).collect()
            t5 = time.monotonic()
            row.setdefault("build", []).append(round(t1 - t0, 3))
            row.setdefault("noop", []).append(round(t3 - t2, 3))
            row.setdefault("agg", []).append(round(t5 - t4, 3))
        out[name] = row
        print(name, json.dumps(row), flush=True)
    spark.stop()
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
