"""Profile the extraction hot loop (VERDICT r7 #7).

`extract_turns` is ~38% of the headline bench total, and no round has
profiled the per-document Python path itself (the r2 overhead audit
split parse/score/format at stage granularity only). This script runs
the EXACT per-row function the pipeline ships (udf.extract_row — the
body of the mapInPandas stage) over the same corpus bench.py measures
(the synthetic sf0.1 transcripts), single-threaded under cProfile, and
reports the top functions by self-time plus per-document latency
quantiles. No Spark: the hot loop is pure Python per row, so the
profile is the executor-side truth without JVM noise.

Usage: python scripts/profile_extract.py [n_docs] [sort]
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
SORT = sys.argv[2] if len(sys.argv) > 2 else "tottime"


def load_corpus(n: int):
    import pyarrow.parquet as pq

    from snacktory_spark.data.synth import ensure_synth

    sdir = ensure_synth("/root/testdata/sf0.1", include_extraction=False)
    t = pq.read_table(f"{sdir}/transcripts.parquet", columns=["text"])
    texts = [x for x in t.column("text").to_pylist() if x]
    return texts[:n]


def main():
    from snacktory_spark.udf import extract_row

    texts = load_corpus(N_DOCS)
    print(f"profiling extract_row over {len(texts)} docs "
          f"({sum(len(t) for t in texts) / 1e6:.1f} MB text)")

    # warm the module-level regex/rule tables first (the steady state
    # bench.py measures — workers are warmed before timing)
    for t in texts[:50]:
        extract_row(t, "")

    # per-doc latency quantiles (un-profiled pass: cProfile's tracing
    # overhead would distort them)
    times = []
    for t in texts:
        t0 = time.perf_counter()
        extract_row(t, "")
        times.append(time.perf_counter() - t0)
    times.sort()
    n = len(times)
    tot = sum(times)
    print(f"un-profiled: {n / tot:.0f} docs/s single-core | per-doc "
          f"p50={times[n // 2] * 1e3:.2f}ms "
          f"p90={times[int(n * .9)] * 1e3:.2f}ms "
          f"p99={times[int(n * .99)] * 1e3:.2f}ms "
          f"max={times[-1] * 1e3:.1f}ms")

    prof = cProfile.Profile()
    prof.enable()
    for t in texts:
        extract_row(t, "")
    prof.disable()
    out = io.StringIO()
    stats = pstats.Stats(prof, stream=out)
    stats.sort_stats(SORT).print_stats(30)
    print(out.getvalue())


if __name__ == "__main__":
    main()
