"""Same-window interleaved bench A/B: HEAD vs a reference commit
(VERDICT r9 next #2, applied to r10): run the EXACT driver protocol
(`bench.py`, subprocess per leg, median-of-3 in-process replicates) on
two trees alternately in ONE session, both orders, so the box's
monotonic/windowed drift (CLAUDE.md: ±20%+) cancels instead of writing
phantom deltas.

NOT part of the driver's frozen measurement: bench.py is untouched; this
harness only *invokes* it per tree and aggregates.

Usage:
  python bench_extra.py [--ref ed92b9d] [--sf /root/testdata/sf1.0]
                        [--cpus 32] [--order BAAB,ABBA] [--out PATH]

A = the reference tree (git archive of --ref into a temp dir, with its
bench.py's hard-coded `sys.path.insert(0, "/root/repo")` rewritten to the
exported tree so it imports ITS OWN package, not HEAD's). B = HEAD
(/root/repo). Both trees share /root/repo/data/synth (SYNTH_ROOT is an
absolute path in both), so input-layout changes benefit BOTH sides — the
deltas reported here are CODE-only and therefore conservative for any
round that also improved the generated input layout.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tarfile
import tempfile
import time

REPO = "/root/repo"


def export_ref(ref: str) -> str:
    d = tempfile.mkdtemp(prefix=f"ab_{ref}_")
    tar = os.path.join(d, "tree.tar")
    with open(tar, "wb") as f:
        subprocess.run(["git", "-C", REPO, "archive", ref], stdout=f, check=True)
    with tarfile.open(tar) as tf:
        tf.extractall(d, filter="data")
    os.unlink(tar)
    # the exported bench.py must import the EXPORTED package: its
    # sys.path line pins /root/repo, which would silently run HEAD code
    bench = os.path.join(d, "bench.py")
    src = open(bench).read()
    patched = src.replace('sys.path.insert(0, "/root/repo")',
                          f'sys.path.insert(0, "{d}")')
    assert patched != src, "bench.py sys.path line not found in ref tree"
    open(bench, "w").write(patched)
    return d


def run_leg(tree: str, sf: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS=str(cpus))
    t0 = time.time()
    p = subprocess.run([sys.executable, os.path.join(tree, "bench.py")],
                       env=env, cwd=tempfile.gettempdir(),
                       capture_output=True, text=True, timeout=3600)
    wall = round(time.time() - t0, 1)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["_wall_s"] = wall
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="ed92b9d")
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--order", default="BAAB,ABBA")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "ab_r10.json"))
    args = ap.parse_args()

    ref_tree = export_ref(args.ref)
    trees = {"A": ref_tree, "B": REPO}
    legs = []
    seq = [c for block in args.order.split(",") for c in block]
    print(f"A={args.ref} ({ref_tree})  B=HEAD  sf={args.sf} "
          f"cpus={args.cpus}  order={''.join(seq)}", flush=True)
    for i, which in enumerate(seq):
        rec = run_leg(trees[which], args.sf, args.cpus)
        legs.append({"pos": i, "side": which, "value": rec["value"],
                     "queries": rec["queries"],
                     "replicate_totals": rec.get("replicate_totals"),
                     "corpus_prep_sec": rec.get("corpus_prep_sec"),
                     "turns_per_sec_steady": rec.get("turns_per_sec_steady"),
                     "wall_s": rec["_wall_s"]})
        print(f"leg {i} [{which}] value={rec['value']} "
              f"extract={rec['queries'].get('extract_turns')} "
              f"steady_tps={rec.get('turns_per_sec_steady')}", flush=True)

    def med(side, key):
        vals = [l[key] for l in legs if l["side"] == side and l[key] is not None]
        return round(statistics.median(vals), 3) if vals else None

    qnames = list(legs[0]["queries"])
    summary = {
        "ref": args.ref, "sf": args.sf, "cpus": args.cpus,
        "order": "".join(seq),
        "value_median": {s: med(s, "value") for s in "AB"},
        "corpus_prep_median": {s: med(s, "corpus_prep_sec") for s in "AB"},
        "steady_tps_median": {s: med(s, "turns_per_sec_steady") for s in "AB"},
        "per_query_median": {
            q: {s: round(statistics.median(
                [l["queries"][q] for l in legs
                 if l["side"] == s and l["queries"].get(q, -1) > 0]), 3)
                for s in "AB"}
            for q in qnames},
        "legs": legs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("value_median", "corpus_prep_median",
                       "steady_tps_median")}))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
