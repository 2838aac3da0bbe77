"""Scaling-efficiency evidence for the BASELINE.json north rule.

No real multi-executor cluster exists in this sandbox, so the rule's
"N → 4N executors with ≥0.8 throughput scaling efficiency" is evidenced by
running the IDENTICAL extraction job at two parallelism levels — local[8]
and local[32] (fresh JVM each) — on the same replicated input, and
comparing steady-state turns/sec. Results land in BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPLICATE = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def run(cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SNACKTORY_BENCH_REPLICATE=str(REPLICATE),
               SNACKTORY_BENCH_EXTRACT_ONLY="1")
    # confine the WHOLE process tree (JVM + python workers) to `cpus` CPUs:
    # emulates an N-core cluster honestly — with local[N] alone, the JVM's
    # shuffle/GC/codegen threads would spill onto the idle cores and inflate
    # the small-configuration throughput
    cmd = [sys.executable, "/root/repo/bench.py"]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd,
                         capture_output=True, text=True, env=env, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench (cpus={cpus}):\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def main():
    r8 = run(8)
    r32 = run(32)
    tp8 = r8["turns_per_sec"]
    tp32 = r32["turns_per_sec"]
    eff = (tp32 / tp8) / 4.0
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    md = f"""# BENCH/BASELINE — measured throughput & scaling efficiency

Flagship job: full snacktory-parity extraction over the synthetic transcript
table (`snacktory_spark.pipeline.extract_job.extracted_df`: scan → gate →
salted repartition → Arrow-vectorized mapInPandas), identical input and plan
at both parallelism levels; fresh JVM per run; Python workers warmed before
timing (steady-state throughput).

| config | turns extracted | wall (s) | turns/sec |
|---|---|---|---|
| local[8]  (N)  | {r8.get('n_extracted', r8['n_turns'])} | {r8['queries']['extract_turns']} | {tp8} |
| local[32] (4N) | {r32.get('n_extracted', r32['n_turns'])} | {r32['queries']['extract_turns']} | {tp32} |

**Scaling efficiency (N→4N)** = (turns/sec@32 ÷ turns/sec@8) ÷ 4 =
**{eff:.3f}** (target ≥ 0.8 per BASELINE.json).

Input: sf0.1 synthetic transcripts × {REPLICATE} (JVM-side replication;
~{r8['n_turns']} turns, mix of templated article HTML, golden reference
fixtures, and plain-text turns per FIXTURES.md §1).

Raw bench lines:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(f"tp8={tp8} tp32={tp32} efficiency={eff:.3f}")
    print("wrote /root/repo/BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
