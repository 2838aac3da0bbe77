"""No-Spark scaling control: the extraction function under plain
multiprocessing at N and 4N cores.

BASELINE.md cites this control (first run in round 1, inline) as the
machine's own ceiling — committed as a script in r8 so any session can
re-measure it NEXT TO a Spark replicate: when the Spark eff(2->8)
number moves, this decides in one minute whether the box moved or the
pipeline did. No Spark, no JVM: load the same sf0.1 texts bench.py
extracts, fork a Pool confined (inherited sched_setaffinity) to
exactly N cores, and time the identical udf.extract_row loop.

Usage: python scripts/mp_control.py [cores ...]   (default: 2 8)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CORES = [int(c) for c in sys.argv[1:]] or [2, 8]


def _work(texts):
    from snacktory_spark.udf import extract_row
    n = 0
    for t in texts:
        extract_row(t, "")
        n += 1
    return n


def load_texts():
    import pyarrow.parquet as pq

    from snacktory_spark.data.synth import ensure_synth

    sdir = ensure_synth("/root/testdata/sf0.1", include_extraction=False)
    t = pq.read_table(f"{sdir}/transcripts.parquet", columns=["text"])
    return [x for x in t.column("text").to_pylist() if x]


def run(texts, cores: int) -> float:
    """Docs/sec with a pool of `cores` workers pinned to cores
    0..cores-1 (children inherit the affinity set before fork)."""
    os.sched_setaffinity(0, set(range(cores)))
    try:
        chunks = [texts[i::cores * 4] for i in range(cores * 4)]
        with mp.get_context("fork").Pool(cores) as pool:
            # warm the rule tables in every worker before timing
            pool.map(_work, [texts[:20]] * cores)
            t0 = time.perf_counter()
            done = sum(pool.map(_work, chunks))
            wall = time.perf_counter() - t0
        assert done == len(texts)
        return len(texts) / wall
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count())))


def main():
    texts = load_texts()
    print(f"{len(texts)} docs")
    rates = {}
    for c in CORES:
        rates[c] = run(texts, c)
        print(f"cores={c}: {rates[c]:.0f} docs/s "
              f"({rates[c] / c:.0f}/core)")
    cs = sorted(rates)
    for a, b in zip(cs, cs[1:]):
        print(f"eff({a}->{b}) = "
              f"{(rates[b] / rates[a]) / (b / a):.3f}")


if __name__ == "__main__":
    main()
