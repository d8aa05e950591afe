"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus (north-rule evidence) the extraction-throughput scaling measurement:
the SAME pipeline over the SAME cached transcripts at two parallelism
levels (local[N/4] vs local[N], fresh JVM each via a child process), with
turns/sec at both and scaling efficiency = (tps_4N / tps_N) / 4. The table
also lands in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 160k convs ≈ 1.19M turns: sized so fixed per-job costs (JVM stages,
# shuffle setup, final reduce) amortize — at 80k the round-2 kernel is fast
# enough that they dominate the local[2]↔local[8] comparison (measured
# eff 0.81 at 80k vs 0.93 at 160k, same engine; amortization is also the
# 100 TB reality)
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "160000"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SKIP_SCALING") == "1"
# the A/B arm rides with full bench runs; skip with scaling (iteration mode)
SKIP_AB = os.environ.get("SPARK_GRAFT_BENCH_SKIP_AB") == "1" or SKIP_SCALING
AB_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_AB_REPS", "3"))

# headline subset: one per operator family (full pack runs in selfcheck)
HEADLINE = [
    "q01_parse_fields",
    "q02_record_split",
    "q03_classify_lob",
    "q06_lob_summary",
    "q11_dedup_exact",
    "q13_minhash_signatures",
    "q14_minhash_lsh_pairs",
    "q16_ann_cosine_topk",
    "q19_quality_scores",
    "q23_event_windows",
    # round-2 scale paths, tracked for regressions
    "q36_embedding_near_dups",
    "q42_detect_text_tables",
    # round-4: the lattice pipeline is the heaviest operator family (95,883
    # output rows at sf0.1) — tracked so regressions are visible (verdict 6)
    "q45_lattice_tables",
    "q46_lattice_normalize",
    # round-5: the real-PDF tokenizer family (verdict item 6) — a large hot
    # code path whose round-4 1.8× regression was only caught because the
    # lattice queries had just been promoted; now tracked directly across
    # its three carrier shapes (classic+reversed layout, ObjStm/xref
    # streams, RC4+AES encryption) plus CID-font decode
    "q49_real_pdf_roundtrip",
    "q51_objstm_pdf_roundtrip",
    "q54_encrypted_pdf_roundtrip",
    "q55_cid_pdf_roundtrip",
    "q56_aes_pdf_roundtrip",
    "q57_differences_pdf_roundtrip",
    "q58_aes256_pdf_roundtrip",
    # round-6 carriers: base-encoding matrix, password book, classic
    # stream filters (the A/B base arm predates them and reports null)
    "q59_font_encodings_pdf_roundtrip",
    "q60_password_pdf_roundtrip",
    "q61_filtered_pdf_roundtrip",
    "q62_inline_image_pdf_roundtrip",
    "q63_incremental_pdf_roundtrip",
    "q64_form_xobject_pdf_roundtrip",
    "q65_encrypted_objstm_pdf_roundtrip",
    "q66_tagged_pdf_roundtrip",
    "q67_type3_pdf_roundtrip",
    "q68_hybrid_pdf_roundtrip",
    # round-7: the executed OCR slice (scan render → template OCR, then
    # the noisy-scan nearest-template rung); the A/B base arm predates
    # them and reports null
    "q69_scanned_pdf_ocr_roundtrip",
    "q70_noisy_scan_ocr_roundtrip",
    # round-7: the executed render slice (fixture render → strict PNG
    # decode → template match)
    "q71_render_pages_roundtrip",
    # round-7: top-level q/cm/Q graphics state (six matrix variants)
    "q72_ctm_pdf_roundtrip",
    # round-7: CTM × form-XObject composition (§8.10.2 splice isolation)
    "q73_ctm_form_roundtrip",
    # round-7: non-translation Tm (scaled/rotated text matrices)
    "q74_tm_matrix_roundtrip",
    # round-7: inheritable page attributes (§7.7.3.4 resources, §7.7.3.3
    # display rotation)
    "q75_inherited_resources_roundtrip",
    "q76_rotate_pdf_roundtrip",
    # late round-7 carriers: /ActualText replacement, TJ word-break kerns
    "q77_actualtext_pdf_roundtrip",
    "q78_tj_kern_pdf_roundtrip",
    # late round-7 training-data families: Gopher repetition counters
    # (two-stage aggs), PII scrubbing and C4 boilerplate filtering (both
    # map-only codegen)
    "q79_repetition_scores",
    "q80_pii_scrub",
    "q81_boilerplate_filter",
    # two-phase global prefix sum (bucketed window, no SinglePartition)
    "q82_pack_sequences",
    # Gopher quality composite (map-only HOF ratios)
    "q83_gopher_flags",
    # IVF probe-pruned ANN search (one fit → assign + probe + re-rank)
    "q84_ivf_probe_topk",
    # round-7 curation pack representatives (the A/B base arm predates
    # them and reports null): corpus-wide window dedup (digest-keyed
    # shuffle), trigram-LM scoring (explode + broadcast counts join),
    # HTML skip-tag realism through the real extraction UDF, and the
    # two-phase global shuffle rank
    "q85_window_dedup",
    "q88_trigram_lm_scores",
    "q91_html_skip_tags",
    "q95_corpus_shuffle",
]


def _cached_transcripts(spark) -> tuple[str, int]:
    """Deterministic bench transcripts, cached as parquet (distributed,
    per-conversation-seeded generation)."""
    from pdf_extraction_ai_agent_spark.fixtures.transcripts import distributed_transcripts

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_cache",
        f"transcripts_c{BENCH_CONVS}_s123",
    )
    marker = os.path.join(cache, "_SUCCESS")
    if not os.path.exists(marker):
        distributed_transcripts(spark, BENCH_CONVS, seed=123).repartition(128).write.mode(
            "overwrite"
        ).parquet(cache)
    n = spark.read.parquet(cache).count()
    return cache, n


def _input_stats(df) -> tuple[int, int]:
    """(rows, bytes) of every parquet source in the query's physical plan —
    read from parquet footers, no extra Spark job. Recorded per headline
    query so rounds can compare THROUGHPUT (rows/sec, bytes/sec), not just
    wall seconds (the round-1↔2 harness discontinuity was avoidable
    evidence loss — round-2 verdict item 7)."""
    import re

    import pyarrow.parquet as pq

    plan = df._jdf.queryExecution().executedPlan().toString()
    # capture the WHOLE bracketed path list (a scan may have several roots;
    # plan toString may elide the tail with '...' — only complete entries
    # count, so multi-root stats are a lower bound, not first-path-only)
    paths = {
        p.strip().removeprefix("file:")
        for m in re.findall(r"InMemoryFileIndex\(\d+ paths\)\[([^\]]+)\]", plan)
        for p in m.split(",")
        if p.strip().startswith("file:")
    }
    rows = nbytes = 0
    for p in paths:
        files = [p] if os.path.isfile(p) else [
            os.path.join(root, fn)
            for root, _dirs, fns in os.walk(p)
            for fn in fns
        ]
        for full in files:
            if not full.endswith(".parquet"):
                continue
            nbytes += os.path.getsize(full)
            rows += pq.ParquetFile(full).metadata.num_rows
    return rows, nbytes


def _run_headline(spark) -> tuple[dict[str, float], dict[str, dict]]:
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    timings: dict[str, float] = {}
    io_stats: dict[str, dict] = {}
    qs = entry.queries()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        # force FULL evaluation of every output column — under a bare
        # count() Catalyst prunes unused projections, so projection-only
        # queries would time little more than the parquet scan
        row = df.agg(
            F.count(F.lit(1)),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])),
        ).collect()[0]
        timings[name] = round(time.monotonic() - t0, 3)
        in_rows, in_bytes = _input_stats(df)
        io_stats[name] = {
            "input_rows": in_rows, "input_bytes": in_bytes, "output_rows": int(row[0]),
        }

    # production-hash variant of the minhash kernel (hash_impl='fast' —
    # vectorized siphash + reduceat; md5 stays the oracle-portable default):
    # recorded so the md5↔fast speedup is visible round over round
    from pdf_extraction_ai_agent_spark.entry_queries_ext import _docs
    from pdf_extraction_ai_agent_spark.operators import dedup

    t0 = time.monotonic()
    sig = dedup.minhash_signatures(_docs(spark, SF_DIR), hash_impl="fast")
    sig.agg(F.count(F.lit(1)), F.max(F.xxhash64(*[F.col(c) for c in sig.columns]))).collect()
    timings["q13_minhash_signatures_fasthash"] = round(time.monotonic() - t0, 3)

    # 'fnv' — vectorized canonical FNV-1a-64: version-stable by construction
    # (the persistable production hash for cross-run incremental dedup) and
    # measured FASTER than siphash on shingle-length tokens
    t0 = time.monotonic()
    sig = dedup.minhash_signatures(_docs(spark, SF_DIR), hash_impl="fnv")
    sig.agg(F.count(F.lit(1)), F.max(F.xxhash64(*[F.col(c) for c in sig.columns]))).collect()
    timings["q13_minhash_signatures_fnvhash"] = round(time.monotonic() - t0, 3)

    # production-geometry near-dup (threshold 0.9, 64 planes × 8-bit bands —
    # the selective-bucket configuration the docstring mandates for real
    # thresholds; the oracle-checked q36 keeps the demo 16×2 geometry for
    # its low demo threshold). Measured ~4× the demo geometry because
    # candidates stay ~3% of pairs instead of ~90%.
    from pdf_extraction_ai_agent_spark.operators import similarity
    from pdf_extraction_ai_agent_spark.plans.cache import release_tracked

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t0 = time.monotonic()
    nd = similarity.embedding_near_dup_pairs(emb, threshold=0.9, n_planes=64, band_bits=8)
    nd.agg(F.count(F.lit(1))).collect()
    timings["q36_near_dups_prod_geometry"] = round(time.monotonic() - t0, 3)
    release_tracked()  # the extra variants bypass the entry wrapper
    return timings, io_stats


def _ordering_skew_probe(spark) -> dict:
    """Round-4 evidence (verdict item 1): time the turn-ordering stage on a
    deliberately skewed corpus — ONE 4M-turn mega-conversation plus 1M
    background turns — under (a) the two-phase bucketed plan and (b) the
    old single conv-wide window. Measured on this box: ~6.1 s vs ~11.8 s
    (1.9× — the single window funnels 4M rows into one sort task while the
    bucketed plan spreads ~61 tasks over all cores); the gap grows
    linearly with conversation length, which is the 100-TB point."""
    from pyspark.sql import functions as F

    from pdf_extraction_ai_agent_spark.operators.ordering import with_turn_pos

    n_mega, n_rest = 4_000_000, 1_000_000
    mega = spark.range(n_mega).select(
        F.lit("mega").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400).alias("ts"),
    )
    rest = spark.range(n_rest).select(
        F.concat(F.lit("c"), (F.col("id") % 40000).cast("string")).alias("conv_id"),
        (F.col("id") / 40000).cast("int").alias("turn_idx"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400).alias("ts"),
    )
    df = mega.unionByName(rest).repartition(64).cache()
    df.count()
    out = {"turns": n_mega + n_rest, "mega_conv_turns": n_mega}
    for label, width in (("two_phase", 65536), ("single_window", None)):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            with_turn_pos(df, bucket_width=width).agg(
                F.max(F.xxhash64("conv_id", "turn_idx", "turn_pos"))
            ).collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[label + "_sec"] = round(best, 3)
    df.unpersist()
    return out


def _baseline_worktree() -> tuple[str, str] | None:
    """(path, sha) of a detached worktree at the previous round's commit —
    the A arm of the variance-proof headline protocol. Ref override:
    $SPARK_GRAFT_BENCH_AB_REF; default = newest commit whose message starts
    with 'round ' (the driver's per-round bookkeeping commit). Returns None
    (→ A/B skipped) when no such ref exists or the worktree can't be made."""
    here = os.path.dirname(os.path.abspath(__file__))
    ref = os.environ.get("SPARK_GRAFT_BENCH_AB_REF")
    try:
        if not ref:
            # anchored to the driver's bookkeeping SUBJECT ("round N: …") —
            # a bare "^round " also matches wrapped body lines of ordinary
            # commits (bit us: the first r4 A/B baselined against an r4
            # commit whose body wrapped onto "round A/B headline protocol")
            ref = subprocess.run(
                ["git", "rev-list", "-1", "-E", "--grep", r"^round [0-9]+:",
                 "HEAD"],
                capture_output=True, text=True, cwd=here, timeout=60,
            ).stdout.strip()
        if not ref:
            return None
        sha = subprocess.run(
            ["git", "rev-parse", ref], capture_output=True, text=True,
            cwd=here, timeout=60,
        ).stdout.strip()
        if not sha:
            return None
        path = os.path.join(here, ".bench_cache", f"ab_{sha[:12]}")
        if not os.path.isdir(os.path.join(path, "pdf_extraction_ai_agent_spark")):
            subprocess.run(["git", "worktree", "remove", "--force", path],
                           capture_output=True, cwd=here, timeout=60)
            r = subprocess.run(
                ["git", "worktree", "add", "--detach", path, sha],
                capture_output=True, text=True, cwd=here, timeout=120,
            )
            if r.returncode != 0:
                return None
        return path, sha
    except Exception:
        return None


def _pinned_corpus_dir() -> tuple[str, list[str]] | None:
    """Materialize the roundtrip payload corpora ONCE from HEAD's fixture
    generators (round-6 verdict item 2) so both A/B arms extract identical
    bytes. Keyed by HEAD sha PLUS a dirty-tree marker (advice r6 #5): a
    worktree with locally modified generators must not silently reuse the
    corpus pinned for the clean sha — the bytes would no longer match the
    tree under test. Clean re-runs within the same commit still reuse the
    parquet. Returns (dir, pinned_names) or None (→ live generators)."""
    here = os.path.dirname(os.path.abspath(__file__))
    names = [n for n in HEADLINE if n.endswith("_roundtrip")]
    if not names:
        return None
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=here, timeout=60,
        ).stdout.strip()
        if not sha:
            return None
        tag = sha[:12]
        # diff covers tracked edits; porcelain adds untracked new modules
        dirty = "".join(
            subprocess.run(
                ["git"] + args + ["--", "pdf_extraction_ai_agent_spark"],
                capture_output=True, text=True, cwd=here, timeout=60,
            ).stdout
            for args in (["diff", "HEAD"], ["status", "--porcelain"])
        )
        if dirty:
            import hashlib as _hashlib

            tag += "_d" + _hashlib.sha1(dirty.encode()).hexdigest()[:10]
        out_dir = os.path.join(here, ".bench_cache", f"pinned_{tag}")
        child = os.path.join(here, "scripts", "bench_pin_corpus.py")
        r = subprocess.run(
            [sys.executable, child, out_dir, SF_DIR, str(CPUS)] + names,
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if r.returncode != 0 or not lines:
            return None
        pinned = sorted(json.loads(lines[-1])["pinned"])
        return (out_dir, pinned) if pinned else None
    except Exception:
        return None


def _headline_ab(reps: int = 3) -> dict | None:
    """Variance-proof headline comparison (round-3 verdict item 2): HEAD vs
    the previous round's commit, run INTERLEAVED (B,H) × reps in fresh JVMs
    within this one bench session, per-query median/min/max both arms plus
    the median-ratio delta column. A ~20% machine-drift burst hits both
    arms, so only a genuine code change moves the ratio. The roundtrip
    queries additionally run DATA-PINNED (round-6 verdict item 2): one
    corpus materialized from HEAD's generators, extracted by both arms —
    their ratios measure extraction code, never fixture drift."""
    base = _baseline_worktree()
    if base is None:
        return None
    base_path, base_sha = base
    here = os.path.dirname(os.path.abspath(__file__))
    child = os.path.join(here, "scripts", "bench_headline_child.py")
    pin = _pinned_corpus_dir()
    child_env = dict(os.environ)
    if pin is not None:
        child_env["SPARK_GRAFT_BENCH_PINNED_DIR"] = pin[0]
    arms = {"base": base_path, "head": here}
    samples: dict[str, dict[str, list[float]]] = {a: {} for a in arms}
    rep_failures: list[str] = []
    for rep in range(reps):
        for arm, root in arms.items():  # base first, then head — interleaved
            # HEAD's child script also drives the baseline tree (old trees
            # may predate it); queries missing there report null
            try:
                out = subprocess.run(
                    [sys.executable, child, root, SF_DIR, str(CPUS)] + HEADLINE,
                    capture_output=True, text=True, timeout=1800,
                    env=child_env,
                )
            except (subprocess.TimeoutExpired, OSError) as e:
                # one wedged rep must not lose the session's other reps
                # (bit us r7: a single transient base-child death during a
                # load-10 burst nuked the whole A/B table) — record + go on
                rep_failures.append(f"{arm} rep{rep} {type(e).__name__}")
                continue
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if out.returncode != 0 or not lines:
                rep_failures.append(
                    f"{arm} rep{rep} child failed: {out.stderr.strip()[-300:]}"
                )
                continue
            for q, sec in json.loads(lines[-1])["queries"].items():
                if sec is not None:
                    samples[arm].setdefault(q, []).append(sec)
    if not samples["head"] and not samples["base"]:
        return {"error": "every A/B child rep failed: " + "; ".join(rep_failures)}

    def stats(vals: list[float]) -> dict:
        s = sorted(vals)
        return {
            "median": round(s[len(s) // 2], 3),
            "min": s[0],
            "max": s[-1],
        }

    queries = {}
    for q in HEADLINE:
        h, b = samples["head"].get(q), samples["base"].get(q)
        row: dict = {}
        if h:
            row["head"] = stats(h)
        if b:
            row["base"] = stats(b)
        if h and b:
            row["ratio_head_over_base"] = round(
                stats(h)["median"] / max(stats(b)["median"], 1e-9), 3
            )
        queries[q] = row
    result = {
        "baseline_sha": base_sha,
        "reps": reps,
        "queries": queries,
        # which queries ran over the shared materialized corpus (both arms)
        "data_pinned": pin[1] if pin is not None else [],
    }
    if rep_failures:
        result["rep_failures"] = rep_failures
    return result


def _scaling(transcripts_path: str) -> dict:
    """N vs 4N parallelism on identical input (fresh JVM each).

    Levels default to (CPUS/16, CPUS/4) — e.g. local[2] vs local[8] on a
    32-core box — because local mode runs BOTH the JVM task threads (Arrow
    encode/decode, shuffle) and the Python UDF workers on the same cores:
    at local[CPUS] the box is 2× oversubscribed, and even at local[CPUS/2]
    the joint JVM+python load saturates it, so throughput stops scaling for
    reasons that don't exist on a real cluster (where executor sizing
    accounts for python workers). Both default levels keep the box
    under-saturated so the comparison isolates the engine's scaling.
    Override with SPARK_GRAFT_BENCH_LEVELS="lo,hi".
    """
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts", "bench_extract_child.py")
    env_levels = os.environ.get("SPARK_GRAFT_BENCH_LEVELS")
    if env_levels:
        levels = [int(x) for x in env_levels.split(",")]
    else:
        levels = [max(CPUS // 16, 1), max(CPUS // 4, 2)]
    # host interference on this sandbox comes in multi-minute bursts — run
    # the levels INTERLEAVED (lo,hi,lo,hi,…) so a burst can't bias one side
    # of the efficiency ratio (a sequential protocol measured the same
    # engine at 0.94 and 0.79 an hour apart). r7 (verdict item 4): THREE
    # samples per level, MEDIAN kept, min/max recorded, plus the corpus
    # content hash and the host load — so cross-round turns/sec claims are
    # attributable instead of ±25% host-load noise.
    import statistics

    load_before = os.getloadavg()
    samples: dict[int, list[float]] = {c: [] for c in levels}
    turns: dict[int, int] = {}
    for cores in levels * 3:
        out = subprocess.run(
            [sys.executable, child, str(cores), transcripts_path],
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        parsed = json.loads(line)
        samples[cores].append(parsed["wall_sec"])
        turns[cores] = parsed["turns"]
    lo, hi = levels
    med = {c: statistics.median(samples[c]) for c in levels}
    tps = {c: turns[c] / med[c] for c in levels}
    eff = (tps[hi] / tps[lo]) / (hi / lo)
    return {
        "levels": levels,
        "turns": turns[hi],
        "wall_sec": {str(c): round(med[c], 3) for c in levels},
        "wall_sec_samples": {
            str(c): [round(s, 3) for s in sorted(samples[c])] for c in levels
        },
        "turns_per_sec": {str(c): round(tps[c], 1) for c in levels},
        "scaling_efficiency": round(eff, 3),
        "corpus_hash": _corpus_content_hash(transcripts_path),
        "loadavg_before": [round(v, 2) for v in load_before],
        "loadavg_after": [round(v, 2) for v in os.getloadavg()],
        "protocol": "median-of-3 fresh-JVM children per level, interleaved",
    }


def _corpus_content_hash(transcripts_path: str) -> str:
    """Order-insensitive content hash of the bench corpus (r7, verdict
    item 4): cross-round turns/sec is only comparable when the bytes
    extracted are provably the same — the hash lands next to the numbers
    in BENCH/BASELINE.md."""
    import duckdb

    con = duckdb.connect()
    n, h = con.sql(
        "SELECT count(*), bit_xor(hash(conv_id, turn_idx, ts, text, tool)) "
        f"FROM read_parquet('{transcripts_path}/*.parquet')"
    ).fetchone()
    return f"{n}:{h & 0xFFFFFFFFFFFFFFFF:016x}"


def _arrow_batch_default() -> int:
    from pdf_extraction_ai_agent_spark.session import ARROW_MAX_RECORDS_PER_BATCH

    return ARROW_MAX_RECORDS_PER_BATCH


def _arrow_batch_sweep(transcripts_path: str, cores: int) -> list[dict]:
    """Spill/OOM evidence for the extract stage (round-2 verdict item 10):
    the SAME extraction job at maxRecordsPerBatch ∈ {512, 2048, 8192},
    recording wall time + peak JVM RSS + summed python-worker peak RSS —
    justifies the Arrow batch cap in the 100-TB story (batch size bounds
    the per-worker resident pandas frame; too small pays per-batch
    overhead, too large risks executor memory)."""
    child = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts", "bench_extract_child.py"
    )
    out = []
    for batch in (512, 2048, 8192):
        env = dict(os.environ, SPARK_GRAFT_ARROW_BATCH=str(batch))
        res = subprocess.run(
            [sys.executable, child, str(cores), transcripts_path],
            capture_output=True, text=True, timeout=1200, env=env,
        )
        lines = [l for l in res.stdout.strip().splitlines() if l.startswith("{")]
        if res.returncode != 0 or not lines:
            # a dying child (e.g. OOM at the largest batch — the exact risk
            # this sweep probes) is a RESULT, not a reason to lose the rest
            # of the bench: record the failure row and keep sweeping
            out.append({
                "cores": cores, "arrow_batch": batch, "error":
                f"exit {res.returncode}: {res.stderr.strip()[-300:]}",
            })
            continue
        out.append(json.loads(lines[-1]))
    return out


def _write_bench_md(scaling: dict, timings: dict[str, float],
                    io_stats: dict[str, dict] | None = None,
                    sweep: list[dict] | None = None,
                    ab: dict | None = None,
                    ordering_probe: dict | None = None) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lo, hi = scaling["levels"]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — extraction throughput + scaling evidence\n\n"
            "Protocol (BASELINE.md): identical job (full extraction pipeline:\n"
            "salted repartition → vectorized extract UDF → ordering window →\n"
            "field parse → LOB classify) over identical cached transcripts, run\n"
            "at two local parallelism levels in fresh JVMs.\n\n"
            "| parallelism | input turns | wall sec (median) | samples | turns/sec |\n"
            "|---|---|---|---|---|\n"
        )
        for c in scaling["levels"]:
            smp = scaling.get("wall_sec_samples", {}).get(str(c), [])
            f.write(
                f"| local[{c}] | {scaling['turns']} | {scaling['wall_sec'][str(c)]} "
                f"| {', '.join(str(s) for s in smp)} "
                f"| {scaling['turns_per_sec'][str(c)]} |\n"
            )
        f.write(
            f"\nScaling efficiency local[{lo}] → local[{hi}] "
            f"(= (tps_{hi}/tps_{lo}) / {hi // lo}): **{scaling['scaling_efficiency']}**"
            f" (gate: ≥ 0.8)\n\n"
            f"Corpus content hash (rows:xor64): `{scaling.get('corpus_hash', '?')}` — "
            "cross-round turns/sec is attributable only when this hash matches.\n"
            f"Host load (1/5/15 min) before: {scaling.get('loadavg_before')} "
            f"/ after: {scaling.get('loadavg_after')}.\n\n"
            "Measurement notes: fresh JVM per level with "
            "`-XX:ActiveProcessorCount=N` (a local[N] JVM otherwise sizes "
            "GC/netty pools for all host cores); full-worker warmup; "
            "MEDIAN of 3 timed runs per level, levels interleaved so a "
            "host-load burst can't bias one side of the ratio (r7, verdict "
            "item 4); levels kept ≤ CPUS/4 because local mode co-schedules "
            "JVM task threads and python workers on the same cores (an "
            "artifact absent on real clusters, where executor sizing accounts "
            "for python workers).\n\n"
            "## vs the reference's single-node throughput\n\n"
            "The reference processes sequentially at 2–5 s/page on its "
            "fastest (non-LLM) path and 10–45 s/page on LLM paths "
            "(BASELINE.md, table_type_detector.py:238-243). Treating a turn "
            "as one page-equivalent payload, this engine sustains "
            f"~{scaling['turns_per_sec'][str(hi)]:,.0f} turns/sec on "
            f"{hi} cores (~{scaling['turns_per_sec'][str(hi)] / hi:,.0f}"
            "/core/sec) — ≥4 orders of magnitude over the reference's "
            "0.2–0.5 pages/sec, with bit-exact text parity enforced by the "
            "golden suite.\n\n"
            "Spark conf: AQE on, shuffle.partitions = 2×cores, Arrow batch "
            f"{_arrow_batch_default()} (sweep-sized),\n"
            "salted repartition (8 salt buckets) before the UDF stage.\n\n"
            "## Headline query timings (sf0.1, local[%d])\n\n"
            "Single warm-session pass (one number per query, shared JVM) — "
            "useful for IO/throughput columns; for ROUND-OVER-ROUND "
            "comparison read the A/B table below instead (fresh-JVM "
            "medians, interleaved with the previous round's commit).\n\n"
            "| query | sec | input rows | input MB | output rows | Mrows/sec |\n"
            "|---|---|---|---|---|---|\n"
            % CPUS
        )
        for k, v in timings.items():
            st = (io_stats or {}).get(k)
            if st:
                mrps = (st["input_rows"] / v / 1e6) if v else 0.0
                f.write(
                    f"| {k} | {v} | {st['input_rows']} "
                    f"| {st['input_bytes'] / 1e6:.1f} | {st['output_rows']} "
                    f"| {mrps:.3f} |\n"
                )
            else:
                f.write(f"| {k} | {v} | | | | |\n")
        if ab and "queries" in ab:
            f.write(
                "\n## Variance-proof A/B headline (HEAD vs %s, %d reps each, "
                "interleaved fresh JVMs)\n\n"
                "Both arms run in THIS session, alternating, so host-interference "
                "bursts hit them equally; only a code change moves the ratio. "
                "ratio < 1 = HEAD faster.\n\n"
                "| query | head med (min–max) | base med (min–max) | head/base |\n"
                "|---|---|---|---|\n"
                % (ab["baseline_sha"][:12], ab["reps"])
            )
            for q, row in ab["queries"].items():
                def fmt(s):
                    return (f"{s['median']} ({s['min']}–{s['max']})") if s else "—"
                f.write(
                    f"| {q} | {fmt(row.get('head'))} | {fmt(row.get('base'))} "
                    f"| {row.get('ratio_head_over_base', '—')} |\n"
                )
            if ab.get("rep_failures"):
                f.write(
                    "\nRep failures (medians above cover the surviving "
                    "reps): " + "; ".join(ab["rep_failures"]) + "\n"
                )
        elif ab and "error" in ab:
            f.write(f"\n## A/B headline: SKIPPED — {ab['error']}\n")
        if ordering_probe:
            f.write(
                "\n## Mega-conversation ordering probe (round-4)\n\n"
                "Turn ordering on a skewed corpus: one %s-turn conversation "
                "+ %s background turns. The single conv-wide window funnels "
                "the mega-conversation into ONE sort task; the production "
                "two-phase bucketed plan (operators/ordering.py) spreads it "
                "across ~turns/65536 tasks. The gap grows linearly with "
                "conversation length.\n\n"
                "| plan | wall sec |\n|---|---|\n"
                "| two-phase bucketed (production) | %s |\n"
                "| single conv-wide window (old) | %s |\n"
                % (
                    ordering_probe.get("mega_conv_turns"),
                    ordering_probe.get("turns", 0)
                    - ordering_probe.get("mega_conv_turns", 0),
                    ordering_probe.get("two_phase_sec"),
                    ordering_probe.get("single_window_sec"),
                )
            )
        if sweep:
            f.write(
                "\n## Arrow batch sweep (extract stage, local[%d], %d turns)\n\n"
                "maxRecordsPerBatch bounds the resident pandas frame per python "
                "worker; this sweep is the measured basis for the default (2048).\n\n"
                "| maxRecordsPerBatch | wall sec | JVM peak RSS MB | Σ py-worker peak RSS MB | workers |\n"
                "|---|---|---|---|---|\n"
                % (
                    sweep[0]["cores"],
                    next((r["turns"] for r in sweep if "turns" in r), 0),
                )
            )
            for row in sweep:
                if "error" in row:
                    f.write(f"| {row['arrow_batch']} | FAILED: {row['error']} | | | |\n")
                    continue
                f.write(
                    f"| {row['arrow_batch']} | {row['wall_sec']} "
                    f"| {row['jvm_peak_rss_mb']} | {row['py_workers_peak_rss_mb']} "
                    f"| {row['n_py_workers']} |\n"
                )


def main():
    from pdf_extraction_ai_agent_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    cache, _n = _cached_transcripts(spark)
    timings, io_stats = _run_headline(spark)
    # the 5M-row skew probe rides with FULL runs only — headline-only
    # iteration mode (SKIP_SCALING) stays quick
    ordering_probe = None if SKIP_SCALING else _ordering_skew_probe(spark)
    spark.stop()

    scaling = None
    sweep = None
    ab = None
    if not SKIP_AB:
        ab = _headline_ab(AB_REPS)
    if not SKIP_SCALING:
        scaling = _scaling(cache)
        sweep = _arrow_batch_sweep(cache, scaling["levels"][-1])
        _write_bench_md(scaling, timings, io_stats, sweep, ab, ordering_probe)

    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "query_io": io_stats,
        "sf": SF_DIR,
    }
    if scaling:
        result.update(
            {
                "extraction_turns": scaling["turns"],
                "extraction_turns_per_sec": scaling["turns_per_sec"],
                "scaling_levels": scaling["levels"],
                "scaling_efficiency": scaling["scaling_efficiency"],
                "scaling_wall_sec_samples": scaling["wall_sec_samples"],
                "corpus_hash": scaling["corpus_hash"],
                "loadavg": {
                    "before": scaling["loadavg_before"],
                    "after": scaling["loadavg_after"],
                },
            }
        )
    if sweep:
        result["arrow_batch_sweep"] = sweep
    if ab:
        result["headline_ab"] = ab
    if ordering_probe:
        result["ordering_skew_probe"] = ordering_probe
    print(json.dumps(result))


if __name__ == "__main__":
    main()
