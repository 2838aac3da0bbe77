"""Measured recall of the trained-PQ ADC search vs exact L2.

VERDICT r5 #3 asked for trained codebooks + an ADC search path; this
script turns that into a measured component (the pq analog of
BENCH/minhash_recall.md): for every vector of the sf0.01 embeddings
table as the query, compare ADC top-k against exact squared-L2 top-k,
sweeping the number of per-subspace k-means training iterations
(0 = the raw seed-slice codebooks the r5 layout demo used). Writes
BENCH/pq_recall.md.

Usage: python scripts/pq_recall.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

N_SUB, SUB_DIM = 4, 16
K_LIST = (1, 10)


def adc_rank(X: np.ndarray, books, q: np.ndarray) -> np.ndarray:
    """Vector order by ADC distance (same LUT round-6 convention as
    textops.pq_adc_topk), ties by index."""
    codes = np.empty((len(X), N_SUB), dtype=np.int64)
    for j in range(N_SUB):
        seg = X[:, j * SUB_DIM:(j + 1) * SUB_DIM]
        d = ((seg[:, None, :] - np.asarray(books[j])[None, :, :]) ** 2
             ).sum(axis=2)
        codes[:, j] = np.argmin(d, axis=1)
    lut = np.array([[round(float(((q[j * SUB_DIM:(j + 1) * SUB_DIM]
                                   - np.asarray(books[j][c])) ** 2).sum()),
                          6)
                     for c in range(len(books[j]))]
                    for j in range(N_SUB)])
    adc = np.array([round(float(sum(lut[j, codes[i, j]]
                                    for j in range(N_SUB))), 6)
                    for i in range(len(X))])
    return np.lexsort((np.arange(len(X)), adc))


def main():
    from pyspark.sql import SparkSession, functions as F

    from snacktory_spark.textops import pq_train

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .appName("pq-recall").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rows = sorted((r["vec_id"], list(r["embedding"]))
                  for r in emb.collect())
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    seeds = [rows[i][1] for i in range(len(rows)) if ids[i] in (1, 2, 3, 4)]

    results = {}
    for n_iter in (0, 1, 3):
        books = pq_train(emb, seeds, n_sub=N_SUB, sub_dim=SUB_DIM,
                         n_iter=n_iter)
        rec = {k: [] for k in K_LIST}
        for qi in range(len(X)):
            q = X[qi]
            exact = np.lexsort(
                (np.arange(len(X)), ((X - q) ** 2).sum(axis=1)))
            approx = adc_rank(X, books, q)
            for k in K_LIST:
                want = set(ids[exact[:k]])
                got = set(ids[approx[:k]])
                rec[k].append(len(want & got) / k)
        results[n_iter] = {k: float(np.mean(v)) for k, v in rec.items()}
        print(f"n_iter={n_iter}: " + ", ".join(
            f"recall@{k}={results[n_iter][k]:.3f}" for k in K_LIST))

    # --- IVF-probed ADC (VERDICT r6 #2): recall vs scan fraction -------
    # Coarse cells come from the RAW seed vectors (the ann_partitions
    # IVF layer); codebooks are the registered n_iter=1 training. For
    # each nprobe, ADC ranks ONLY vectors whose cell is among the
    # query's nprobe nearest cells; recall is against the exhaustive
    # exact top-k, scan_frac is the probed cells' share of the corpus.
    books1 = pq_train(emb, seeds, n_sub=N_SUB, sub_dim=SUB_DIM, n_iter=1)
    C = np.asarray(seeds, dtype=np.float64)
    cell = np.array([np.lexsort((np.arange(len(C)),
                                 ((C - X[i]) ** 2).sum(axis=1)))[0]
                     for i in range(len(X))])
    probed = {}
    for nprobe in (1, 2, 3, 4):
        rec = {k: [] for k in K_LIST}
        frac = []
        for qi in range(len(X)):
            q = X[qi]
            d2c = ((C - q) ** 2).sum(axis=1)
            probe = set(np.lexsort((np.arange(len(C)), d2c))[:nprobe])
            mask = np.isin(cell, list(probe))
            frac.append(mask.mean())
            exact = np.lexsort(
                (np.arange(len(X)), ((X - q) ** 2).sum(axis=1)))
            order = adc_rank(X[mask], books1, q)
            sub_ids = ids[mask][order]
            for k in K_LIST:
                want = set(ids[exact[:k]])
                rec[k].append(len(want & set(sub_ids[:k])) / k)
        probed[nprobe] = ({k: float(np.mean(v)) for k, v in rec.items()},
                          float(np.mean(frac)))
        print(f"nprobe={nprobe}: scan_frac={probed[nprobe][1]:.3f}, "
              + ", ".join(f"recall@{k}={probed[nprobe][0][k]:.3f}"
                          for k in K_LIST))

    lines = [
        "# Trained-PQ ADC search: measured recall vs exact L2",
        "",
        f"All {len(X)} vectors of the sf0.01 embeddings table as "
        "queries; 4 subspaces x 16 dims, k=4 codes/subspace (the "
        "registered ann_partitions configuration); codebooks trained "
        "with textops.pq_train from the 4 fixed seed vectors; recall "
        "averaged over all queries (generated by scripts/pq_recall.py):",
        "",
        "| training iterations | recall@1 | recall@10 |",
        "|---|---|---|",
    ]
    for n_iter in (0, 1, 3):
        label = {0: "0 (raw seed slices — the r5 layout demo)",
                 1: "1 (the registered configuration)",
                 3: "3"}[n_iter]
        lines.append(f"| {label} | {results[n_iter][1]:.3f} | "
                     f"{results[n_iter][10]:.3f} |")
    lines += [
        "",
        "A 4-entry codebook over 16-dim subspaces is a deliberately "
        "coarse 1-byte-per-vector layout (corpus compressed 256x) — "
        "recall is bounded by quantization, and the measured gain from "
        "training the codebooks is the point: the ADC ordering is only "
        "as good as the cell geometry, which is why real stores train "
        "(and why the r6 query trains rather than slicing seeds). At "
        "billion-vector scale the same plan shape holds with k=256 "
        "codes/subspace and an IVF pre-filter (the ann_partitions cell "
        "column); ADC rerank cost stays one scan of the probed cells.",
        "",
        "## IVF-probed ADC: recall vs scan fraction (r7)",
        "",
        "Same corpus/queries; coarse cells from the raw 4 seed vectors "
        "(the ann_partitions IVF layer), codebooks at the registered "
        "n_iter=1 training; per query the ADC scan is restricted to the "
        "nprobe nearest cells (textops.ivf_probe_cells + the cell "
        "column pq_codes now emits). Recall is against the exhaustive "
        "exact top-k; scan_frac is the probed cells' average share of "
        "the corpus — the per-query cost on a cell-partitioned store:",
        "",
        "| nprobe | scan fraction | recall@1 | recall@10 |",
        "|---|---|---|---|",
    ]
    for nprobe in (1, 2, 3, 4):
        r, fr = probed[nprobe]
        label = f"{nprobe} (registered)" if nprobe == 2 else f"{nprobe}"
        lines.append(f"| {label} | {fr:.3f} | {r[1]:.3f} | "
                     f"{r[10]:.3f} |")
    lines += [
        "",
        "nprobe=4 scans every cell and reproduces the exhaustive "
        "n_iter=1 ADC row above. At this deliberately coarse k=4 "
        "quantization, probing HELPS recall@1 (0.60 at nprobe=1 vs "
        "0.39 exhaustive): the cell filter removes distractor vectors "
        "from other cells that the 4-entry codebooks quantize onto "
        "near-identical codes, which exhaustive ADC then misranks "
        "ahead of the true neighbor. With finer codebooks (k=256) the "
        "distractor effect shrinks and the curve becomes the familiar "
        "monotone recall-vs-cost trade; either way nprobe is the "
        "tunable per-query cost knob (scan_frac column), which is why "
        "billion-vector stores ship probe-then-rerank.",
    ]
    with open("/root/repo/BENCH/pq_recall.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote /root/repo/BENCH/pq_recall.md")
    spark.stop()


if __name__ == "__main__":
    main()
