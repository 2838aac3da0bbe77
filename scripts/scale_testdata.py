"""Rebuild an sfN-shaped measurement bed from the committed sf0.1 testdata.

The driver measures the round at a driver-generated scale factor (r9: a
/root/testdata/sf1.0 that no longer exists in this sandbox). To keep
optimizing AT the measured scale, this script replicates the sf0.1 tables
K times with disjoint key spaces (stride remap on every PK/FK column), so
per-key group sizes, join fan-outs and window widths match a natively
generated sfN table: 10x the keys, not 10x-bigger groups. nation/region
are dimension tables and are copied as-is.

Layout intentionally mimics the driver's writer (pyarrow defaults, 1Mi
rows/row-group): the r9 driver tables measured 1-2 row groups for
everything but lineitem — the under-split-scan behavior `_split_scan`
exists for — so the bed reproduces the driver's scan parallelism, not an
idealized one.

Measurement aid only: nothing in the query paths reads this directory
unless SPARK_GRAFT_SF_DIR points at it, and the oracle gate never does.

Usage: python scripts/scale_testdata.py [K] [out_root]
  K defaults to 10 (sf0.1 -> sf1.0); out dir is <out_root>/sf<0.1*K>.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000  # far above every key in sf0.1 (max ~600k)

# table -> columns remapped into a disjoint range per replica
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["nation", "region"]


def scale_table(name: str, k: int, out_dir: str) -> None:
    import pyarrow.compute as pc

    src = pq.read_table(f"{SRC}/{name}.parquet")
    reps = []
    for i in range(k):
        t = src
        for col in KEY_COLS[name]:
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), pa.scalar(i * STRIDE, pa.int64()))
            t = t.set_column(idx, t.schema.field(idx), shifted)
        reps.append(t)
    out = pa.concat_tables(reps)
    pq.write_table(out, f"{out_dir}/{name}.parquet")
    md = pq.ParquetFile(f"{out_dir}/{name}.parquet").metadata
    print(f"{name}: {md.num_rows} rows, {md.num_row_groups} row groups")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_scaled"
    sf = 0.1 * k
    out_dir = os.path.join(out_root, f"sf{sf:g}")
    os.makedirs(out_dir, exist_ok=True)
    for name in KEY_COLS:
        scale_table(name, k, out_dir)
    for name in COPY_TABLES:
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{out_dir}/{name}.parquet")
        print(f"{name}: copied")
    open(os.path.join(out_dir, "_DONE"), "w").close()
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
