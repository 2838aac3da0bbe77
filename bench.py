"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: total seconds over the query set, reported as the
MEDIAN over SNACKTORY_BENCH_NREPL in-process replicates (default 3;
VERDICT r5 #2: this box drifts ±20-25%, and a single-shot record let
drift write a phantom −29% regression into BENCH_r05 — the median is
drift-robust, and the per-replicate raw times are persisted in the same
JSON under "replicate_totals"/"replicate_times"). The flagship
north-star number (turns-extracted/sec) is "turns_per_sec"
(median-based); "turns_per_sec_oneshot" is the cold first replicate and
"turns_per_sec_steady" the median of warmed replicates.
SNACKTORY_BENCH_REPLICATE=N replicates the transcript input N× JVM-side
(cheap explode; used by scripts/scaling_bench.py to get a CPU-bound
workload for the N-vs-4N-core scaling-efficiency evidence; that mode
defaults to 1 in-process replicate since its long runs replicate
externally).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SNACKTORY_BENCH_REPLICATE", "1"))
N_REPL = int(os.environ.get(
    "SNACKTORY_BENCH_NREPL",
    "1" if os.environ.get("SNACKTORY_BENCH_EXTRACT_ONLY") else "3"))


def bench_extracted(spark, path: str, factor: int, cpus: int):
    """The production plan shape (scan → gate → salted repartition → Arrow
    UDF), with the synthetic load multiplier applied AFTER the shuffle via a
    JVM-side explode — the shuffle carries only the base rows, the UDF does
    factor× work (the part whose scaling the metric tracks)."""
    from pyspark.sql import functions as F
    from snacktory_spark.pipeline.extract_job import (DEFAULT_SALT_SPAN,
                                                      read_transcripts)
    from snacktory_spark.schema import EXTRACTED_SCHEMA
    from snacktory_spark.udf import extract_map_in_pandas

    from snacktory_spark.pipeline.extract_job import ensure_py_files
    ensure_py_files(spark)
    df = read_transcripts(spark, path)
    gated = (df.select("conv_id", "turn_idx", "role", "tool", "ts", "text")
             .filter(F.col("text").isNotNull() & (F.length("text") > 0)))
    salt = F.xxhash64(F.col("conv_id"),
                      (F.col("turn_idx") / F.lit(DEFAULT_SALT_SPAN)).cast("long"))
    salted = gated.repartition(cpus * 2, salt)
    if factor > 1:
        salted = (salted
                  .withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(factor)])))
                  .withColumn("conv_id", F.concat_ws("-", "conv_id", "rep"))
                  .drop("rep"))
    return salted.mapInPandas(extract_map_in_pandas, schema=EXTRACTED_SCHEMA)


def main():
    from pyspark.sql import functions as F
    from snacktory_spark.data.synth import ensure_synth
    from snacktory_spark.pipeline.extract_job import build_session, extracted_df

    import __spark_entry__ as entrymod

    sdir = ensure_synth(SF_DIR, include_extraction=False)
    spark = build_session(app="snacktory-bench", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    from statistics import median

    extras: dict[str, float] = {}

    # warm the Python worker pool (first python stage pays worker+import
    # startup; steady-state throughput is what the metric tracks)
    from snacktory_spark.pipeline.extract_job import read_transcripts
    tdf = read_transcripts(spark, f"{sdir}/transcripts.parquet")
    n_turns = tdf.count()

    def _noop(it):
        for pdf in it:
            yield pdf[["conv_id"]]
    tdf.repartition(CPUS * 2).mapInPandas(_noop, "conv_id string").count()

    # relational/window/dedup/ANN headliners from the driver query set
    qs = entrymod.queries()
    rel_queries = ["turn_ordering", "conv_stats", "pricing_summary",
                   "nation_orders", "top_orders_per_segment", "event_sessions",
                   "doc_token_stats", "doc_fingerprint", "knn_cosine",
                   # round-3 training-pipeline headliners
                   "decontaminate", "token_pack", "chunk_dedup",
                   "doc_repetition"]
    if os.environ.get("SNACKTORY_BENCH_EXTRACT_ONLY"):
        rel_queries = []

    n_extracted = 0
    rep_timings: list[dict[str, float]] = []
    for _rep in range(max(1, N_REPL)):
        timings: dict[str, float] = {}
        t0 = time.time()
        n_extracted = bench_extracted(spark, f"{sdir}/transcripts.parquet",
                                      REPLICATE, CPUS).count()
        timings["extract_turns"] = round(time.time() - t0, 3)
        for name in rel_queries:
            t0 = time.time()
            try:
                # prefer the constituent query fn (r5 registry composites
                # merged some entries; benching constituents keeps the
                # series comparable round-over-round)
                fn = getattr(entrymod, f"q_{name}", None) or qs[name]
                fn(spark, SF_DIR).count()
                timings[name] = round(time.time() - t0, 3)
            except Exception as e:  # pragma: no cover
                timings[name] = -1.0
                extras[f"{name}_error"] = str(e)[:120]
        rep_timings.append(timings)

    # r8: the end-to-end corpus-prep DAG (extract → quality gate → dedup
    # → decontaminate → seq-pack) — reported as its OWN metric, outside
    # the headline total, so the headline series stays comparable
    # round-over-round while the chain a real user runs still gets a
    # measured wall-clock (VERDICT r7 #1)
    if not os.environ.get("SNACKTORY_BENCH_EXTRACT_ONLY"):
        pipe_times = []
        for _rep in range(max(1, N_REPL)):
            t0 = time.time()
            try:
                entrymod.q_corpus_prep(spark, SF_DIR).count()
                pipe_times.append(round(time.time() - t0, 3))
            except Exception as e:  # pragma: no cover
                extras["corpus_prep_error"] = str(e)[:120]
                break
        if pipe_times:
            from statistics import median as _med
            extras["corpus_prep_sec"] = round(_med(pipe_times), 3)
            extras["corpus_prep_times"] = pipe_times

    # median-of-replicates per query (drift-robust record); raw
    # per-replicate times persisted alongside
    names = list(rep_timings[0])
    med = {}
    for name in names:
        ok = [t[name] for t in rep_timings if t.get(name, -1) > 0]
        med[name] = round(median(ok), 3) if ok else -1.0
    rep_totals = [round(sum(v for v in t.values() if v > 0), 3)
                  for t in rep_timings]
    extract_times = [t["extract_turns"] for t in rep_timings
                     if t["extract_turns"] > 0]
    extras["n_turns"] = n_turns
    extras["n_extracted"] = n_extracted
    if extract_times:
        extras["turns_per_sec"] = round(
            n_extracted / median(extract_times), 1)
        extras["turns_per_sec_oneshot"] = round(
            n_extracted / extract_times[0], 1)
        warmed = extract_times[1:] or extract_times
        extras["turns_per_sec_steady"] = round(
            n_extracted / median(warmed), 1)

    out = {
        "metric": "headline-queries-total",
        "value": round(median(rep_totals), 3),
        "unit": "sec",
        "queries": med,
        "sf": SF_DIR,
        "cpus": CPUS,
        "replicate": REPLICATE,
        "n_replicates": len(rep_timings),
        "replicate_totals": rep_totals,
        "replicate_times": {n: [t[n] for t in rep_timings] for n in names},
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
