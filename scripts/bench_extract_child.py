"""Child process for the two-parallelism scaling measurement: runs the full
extraction pipeline over a cached transcripts parquet on local[N] in a FRESH
JVM and prints one JSON line {"cores": N, "turns": T, "wall_sec": S}.

Launched by bench.py once per parallelism level so the JVM/session can't
leak state between measurements (BASELINE.md sandbox evidence protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _vm_hwm_mb(pid: int) -> float:
    """Peak RSS (VmHWM) of a pid, MiB; 0 when unreadable."""
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return round(int(line.split()[1]) / 1024, 1)
    except OSError:
        pass
    return 0.0


def _proc_tree_peak_mb(root_pid: int) -> dict:
    """JVM peak RSS + summed peaks of its python worker descendants —
    the memory that the Arrow batch size actually moves."""
    children: dict[int, list[int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                ppid = int(f.read().split()[3])
            children.setdefault(ppid, []).append(int(entry))
        except (OSError, ValueError):
            continue
    workers: list[int] = []
    stack = [root_pid]
    while stack:
        p = stack.pop()
        for c in children.get(p, []):
            workers.append(c)
            stack.append(c)
    return {
        "jvm_peak_rss_mb": _vm_hwm_mb(root_pid),
        "py_workers_peak_rss_mb": round(sum(_vm_hwm_mb(w) for w in workers), 1),
        "n_py_workers": len(workers),
    }


def main():
    cores = int(sys.argv[1])
    src = sys.argv[2]

    from pyspark.sql import functions as F

    from pdf_extraction_ai_agent_spark.plans.pipeline import extract_pipeline
    from pdf_extraction_ai_agent_spark.session import get_spark

    extra_conf = {
        # size the JVM's GC / netty / fork-join pools as a true N-core
        # executor would be sized — otherwise every local[N] JVM on this
        # 32-core box spawns 32-wide thread pools and the comparison
        # measures pool-contention, not engine scaling
        "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cores}",
    }
    arrow_batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH")
    if arrow_batch:
        extra_conf["spark.sql.execution.arrow.maxRecordsPerBatch"] = arrow_batch

    spark = get_spark(
        app_name=f"bench-extract-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores * 2, 8),
        extra_conf=extra_conf,
    )
    transcripts = spark.read.parquet(src)
    n_turns = transcripts.count()

    # warm-up: spin up a python worker on EVERY core (pandas/module import
    # is ~1s per worker and must not pollute steady-state throughput), plus
    # JVM codegen
    warm = transcripts.limit(cores * 400).repartition(cores * 2)
    extract_pipeline(warm).agg(F.count(F.lit(1))).collect()

    def timed_run() -> float:
        t0 = time.monotonic()
        out = extract_pipeline(transcripts, num_partitions=cores * 2)
        # force full materialization of every column incl. spans without
        # shipping rows to the driver
        out.agg(
            F.sum(F.length("extracted_text")),
            F.sum(F.size("spans")),
            F.count(F.when(F.col("needs_ocr"), 1)),
            F.count("claim_number"),
            F.count("lob"),
        ).collect()
        return time.monotonic() - t0

    # Steady-state = best-of-N: the sandbox host shows bursty external
    # interference (identical reps vary up to ±50%), so the minimum is the
    # right estimator of achievable throughput. More reps at high
    # parallelism (cheap + most jitter-exposed), fewer at low (long runs
    # average interference out).
    reps = 5 if cores >= 8 else 3
    wall = min(timed_run() for _ in range(reps))

    jvm_pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())
    out = {"cores": cores, "turns": n_turns, "wall_sec": round(wall, 3)}
    out.update(_proc_tree_peak_mb(jvm_pid))
    if arrow_batch:
        out["arrow_batch"] = int(arrow_batch)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
