"""The distributed extraction pipeline (SURVEY.md §2.6, §4).

Plan shape (deliberately narrow — scan → filter → salted exchange → Arrow
UDF map → write; the ONLY shuffle is the explicit salted repartition):

  read parquet/iceberg (explicit schema, predicate pushdown + column pruning
      reach the scan — we select only the needed columns)
  → filter(text IS NOT NULL AND length(text) > 0)   [cheap JVM-side gate]
  → repartition(P, xxhash64(conv_id, turn_idx DIV SALT_SPAN))
      conv_id-hash salting: turns of one mega-conversation spread over
      ceil(len/SALT_SPAN) partitions — defuses long-conversation skew while
      keeping SALT_SPAN-turn runs co-located (north-star requirement)
  → mapInPandas(extract)        [Arrow-vectorized, no per-row Python]
  → write parquet partitioned by bucket = pmod(xxhash64(conv_id), N_BUCKETS)

Checkpoint/resume: after a successful write the job derives a per-bucket
manifest (rows/bytes/ok/error counts) from the written data and stores it
under <out>/_manifest/. A resumed run anti-joins input buckets against the
manifest and only processes missing buckets; partitionOverwriteMode=dynamic
makes per-bucket output overwrites idempotent.

At 100 TB: buckets bound the blast radius of a failure (a killed job loses
at most the in-flight buckets), the manifest is tiny driver-side state, and
resume is an O(buckets) filter, not a table diff.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import TRANSCRIPT_SCHEMA
from ..udf import extract_map_in_pandas
from ..schema import EXTRACTED_SCHEMA

DEFAULT_SALT_SPAN = 64      # turns of one conv kept together per salt unit
DEFAULT_N_BUCKETS = 64      # output commit granularity


def ensure_py_files(spark: SparkSession) -> None:
    """Ship the snacktory_spark package to executor Python workers.

    The spark-submit deployment uses ``--py-files snacktory_spark.zip``; when
    driven from an arbitrary session (driver harness, notebook) we build the
    zip on the fly and addPyFile it, so workers can unpickle the UDFs no
    matter what the driver's cwd/sys.path is.
    """
    sc = spark.sparkContext
    if sc._jsc is None:
        return
    if getattr(sc, "_snacktory_pyfiles_added", False):
        return
    sc.addPyFile(build_pyfiles_zip())
    sc._snacktory_pyfiles_added = True


def build_pyfiles_zip() -> str:
    """Build (or reuse) the snacktory_spark executor zip; returns its
    path. The name is CONTENT-ADDRESSED — a hash of the package's file
    list, sizes and mtimes: a pid-keyed name collides when pids recycle
    across runs and silently ships a STALE module set to the executors
    (observed as ModuleNotFoundError for any module added since).
    Identical sources reuse the cached zip; any change produces a new
    name; the build is atomic (tmp + rename), so concurrent builders
    race safely."""
    import hashlib
    import tempfile
    import zipfile

    import snacktory_spark
    pkg_dir = os.path.dirname(os.path.abspath(snacktory_spark.__file__))
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for name in sorted(files):
            if name.endswith(".py"):
                full = os.path.join(root, name)
                st = os.stat(full)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                entries.append((full, rel, st.st_size, st.st_mtime_ns))
    entries.sort(key=lambda x: x[1])
    digest = hashlib.sha1(repr([(r, s, m) for _f, r, s, m
                                in entries]).encode()).hexdigest()[:16]
    zpath = os.path.join(tempfile.gettempdir(),
                         f"snacktory_spark-{digest}.zip")
    if not os.path.exists(zpath):
        tmp = zpath + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full, rel, _s, _m in entries:
                zf.write(full, rel)
        os.replace(tmp, zpath)
    return zpath


def build_session(app: str = "snacktory-extract", master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    b = (SparkSession.builder.appName(app)
         # local mode runs everything in the driver JVM; the 1g default heap
         # causes cache thrashing/GC stalls with large HTML rows
         .config("spark.driver.memory", os.environ.get("SNACKTORY_DRIVER_MEM", "24g"))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         # large HTML rows: keep Arrow batches small to bound worker memory
         # (512×500KB cap = 256MB worst case per in-flight batch; raising to
         # 2048 gains ~8% throughput when rows are known-small)
         .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                 os.environ.get("SNACKTORY_ARROW_BATCH", "512"))
         .config("spark.sql.parquet.compression.codec", "zstd")
         .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
         .config("spark.sql.session.timeZone", "UTC"))
    if master:
        b = b.master(master)
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b.getOrCreate()


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Scan with explicit schema (never inferred); Iceberg tables load via
    spark.table() when the path is a catalog identifier."""
    if "/" not in path and "." in path:
        return spark.table(path)  # iceberg/catalog identifier
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)


def manifest_dir(output_path: str) -> str:
    return output_path.rstrip("/") + "/_manifest"


_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


class _ManifestIO:
    """Manifest I/O that follows output_path's filesystem scheme.

    Plain POSIX paths use local I/O (atomic via os.replace); scheme'd paths
    (``file:``, ``hdfs:``, ``s3a:``, ...) go through the Hadoop FileSystem
    API so resume state lands NEXT TO THE DATA on cluster deployments —
    driver-local manifests for an s3:// output would strand resume state on
    one machine (ADVICE r1). The ``file:`` scheme exercises the Hadoop
    branch end-to-end in tests.
    """

    def __init__(self, spark: SparkSession | None, output_path: str):
        self.out = output_path.rstrip("/")
        self.mdir = manifest_dir(output_path)
        self.hadoop = bool(_SCHEME_RE.match(output_path))
        if self.hadoop:
            if spark is None:
                raise ValueError(
                    f"manifest path {self.mdir!r} has a filesystem scheme; "
                    "a SparkSession is required for Hadoop FileSystem I/O")
            jvm = spark._jvm
            self._jPath = jvm.org.apache.hadoop.fs.Path
            self._fs = self._jPath(self.mdir).getFileSystem(
                spark._jsc.hadoopConfiguration())

    def write_atomic(self, rec: dict) -> None:
        """tmp+rename so a kill mid-write never leaves a corrupt manifest."""
        self.write_named(f"bucket-{rec['bucket']:05d}.json", rec)

    def write_named(self, name: str, rec: dict) -> None:
        """Atomic write of an arbitrary named manifest record (used by
        corpus_prep_job for its chain-level record)."""
        if self.hadoop:
            dest = self._jPath(self.mdir + "/" + name)
            tmp = self._jPath(self.mdir + "/" + name + ".tmp")
            out = self._fs.create(tmp, True)
            out.write(json.dumps(rec).encode("utf-8"))
            out.close()
            # hadoop rename does not overwrite; delete-then-rename leaves at
            # worst a MISSING manifest (bucket re-runs — safe direction)
            self._fs.delete(dest, False)
            self._fs.rename(tmp, dest)
        else:
            os.makedirs(self.mdir, exist_ok=True)
            path = os.path.join(self.mdir, name)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, path)

    def read_named(self, name: str) -> dict | None:
        """Read one named manifest record; None when missing or torn."""
        if self.hadoop:
            p = self._jPath(self.mdir + "/" + name)
            if not self._fs.exists(p):
                return None
            stream = self._fs.open(p)
            try:
                raw = bytes(stream.readAllBytes())
            finally:
                stream.close()
            try:
                return json.loads(raw)
            except json.JSONDecodeError:
                return None
        path = os.path.join(self.mdir, name)
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def out_exists(self, rel: str) -> bool:
        """Existence check for a path under output_path (e.g. the packed
        sink's _SUCCESS marker), following the same filesystem scheme."""
        full = self.out + "/" + rel
        if self.hadoop:
            return bool(self._fs.exists(self._jPath(full)))
        return os.path.exists(full)

    def iter_records(self):
        if self.hadoop:
            mpath = self._jPath(self.mdir)
            if not self._fs.exists(mpath):
                return
            for st in self._fs.listStatus(mpath):
                name = st.getPath().getName()
                if not name.endswith(".json"):
                    continue
                stream = self._fs.open(st.getPath())
                try:
                    raw = bytes(stream.readAllBytes())
                finally:
                    stream.close()
                try:
                    yield json.loads(raw)
                except json.JSONDecodeError:
                    continue  # torn write from a killed run = incomplete
        else:
            if not os.path.isdir(self.mdir):
                return
            for name in os.listdir(self.mdir):
                if not name.endswith(".json"):
                    continue
                try:
                    with open(os.path.join(self.mdir, name)) as f:
                        yield json.load(f)
                except (json.JSONDecodeError, OSError):
                    continue  # torn write from a killed run = incomplete

    def clean_stale(self, keep: set[int]) -> list[int]:
        """Delete bucket data dirs and manifest records NOT certified
        complete-and-compatible (ADVICE r2).

        Dynamic partition overwrite only clears partitions the new run
        writes, so a prior run with a different input_path / n_buckets (or
        a dirty non-resume dir) leaves bucket=N dirs the new run never
        touches — silently corrupting the combined dataset. Anything not
        in `keep` is either stale-incompatible or incomplete-and-about-to-
        be-rewritten; deleting both is safe and restores the invariant
        "every bucket dir on disk has a matching manifest record".
        Returns the bucket numbers whose data dirs were removed."""
        removed = []
        if self.hadoop:
            opath = self._jPath(self.out)
            if self._fs.exists(opath):
                for st in self._fs.listStatus(opath):
                    name = st.getPath().getName()
                    if (st.isDirectory() and name.startswith("bucket=")):
                        try:
                            b = int(name.split("=", 1)[1])
                        except ValueError:
                            continue
                        if b not in keep:
                            self._fs.delete(st.getPath(), True)
                            removed.append(b)
            mpath = self._jPath(self.mdir)
            if self._fs.exists(mpath):
                for st in self._fs.listStatus(mpath):
                    name = st.getPath().getName()
                    b = _manifest_bucket(name)
                    if b is not None and b not in keep:
                        self._fs.delete(st.getPath(), False)
        else:
            if os.path.isdir(self.out):
                for name in os.listdir(self.out):
                    full = os.path.join(self.out, name)
                    if os.path.isdir(full) and name.startswith("bucket="):
                        try:
                            b = int(name.split("=", 1)[1])
                        except ValueError:
                            continue
                        if b not in keep:
                            shutil.rmtree(full, ignore_errors=True)
                            removed.append(b)
            if os.path.isdir(self.mdir):
                for name in os.listdir(self.mdir):
                    b = _manifest_bucket(name)
                    if b is not None and b not in keep:
                        try:
                            os.remove(os.path.join(self.mdir, name))
                        except OSError:
                            pass
        removed = sorted(removed)
        if removed:
            # WARN with the explicit bucket list (ADVICE r3): this purge
            # is destructive by design; if a caller ever points
            # output_path at an unrelated partitioned dataset, this line
            # is the job-log evidence of what was wiped.
            logging.getLogger(__name__).warning(
                "clean_stale: removed %d stale bucket dir(s) under %s: %s",
                len(removed), self.out, removed)
        return removed


def _manifest_bucket(name: str) -> int | None:
    """bucket number of a manifest file name ('bucket-00007.json'), else
    None (tmp files are also claimed: a torn .tmp is never a valid record)."""
    m = re.match(r"bucket-(\d+)\.json(\.tmp)?$", name)
    return int(m.group(1)) if m else None


def load_manifest(output_path: str, spark: SparkSession | None = None,
                  expect_input_path: str | None = None,
                  expect_n_buckets: int | None = None) -> dict[int, dict]:
    """Read per-bucket completion records.

    Records whose recorded input_path / n_buckets don't match the expected
    values are IGNORED (treated as incomplete): resuming the same output dir
    against a different input or bucket count must not silently skip work
    (ADVICE r1). Records written before these fields existed pass through.
    """
    out = {}
    for row in _ManifestIO(spark, output_path).iter_records():
        if (expect_input_path is not None
                and row.get("input_path") is not None
                and row["input_path"] != expect_input_path):
            continue
        if (expect_n_buckets is not None
                and row.get("n_buckets") is not None
                and int(row["n_buckets"]) != expect_n_buckets):
            continue
        out[int(row["bucket"])] = row
    return out


def extracted_df(df: DataFrame, n_buckets: int = DEFAULT_N_BUCKETS,
                 salt_span: int = DEFAULT_SALT_SPAN,
                 partitions: int | None = None,
                 lineage: bool = True) -> DataFrame:
    """transcripts DataFrame → extracted DataFrame (lazy, no write).

    `lineage=False` drops the per-row `input_file` capture (the UDF then
    emits NULL for that column): mapInPandas is opaque to column pruning,
    so a query that discards lineage — the oracled q_corpus_prep /
    extract oracles project it away — would otherwise materialize a
    ~60-byte path string per row and carry it through the salt exchange
    and the Arrow boundary both ways. The WRITE path (run_extract) keeps
    the default: manifests derive their source-file stats from it."""
    ensure_py_files(df.sparkSession)
    gated = (df
             .select("conv_id", "turn_idx", "role", "tool", "ts", "text")
             .filter(F.col("text").isNotNull() & (F.length("text") > 0)))
    if lineage:
        # input_file is captured at the scan stage but attached AFTER
        # the filter: a projection containing input_file_name() (marked
        # nondeterministic) blocks predicate pushdown, and the
        # IsNotNull(text) gate must reach the parquet scan
        gated = gated.withColumn("input_file", F.input_file_name())
    salt = F.xxhash64(F.col("conv_id"),
                      (F.col("turn_idx") / F.lit(salt_span)).cast("long"))
    if not partitions:
        # explicit count: AQE would coalesce this exchange by shuffle-byte
        # size, which starves the CPU-heavy UDF stage of parallelism
        partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    salted = gated.repartition(partitions, salt)
    out = salted.mapInPandas(extract_map_in_pandas, schema=EXTRACTED_SCHEMA)
    return out.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


def extracted_dedup_df(df: DataFrame, n_buckets: int = DEFAULT_N_BUCKETS,
                       partitions: int | None = None,
                       lineage: bool = True) -> DataFrame:
    """The reference's result cache (S6, SCache.java) re-expressed at
    scale: extract each DISTINCT text exactly once, then join the result
    back to every row by content hash.

    Worth it when the duplicate ratio is high (templated pages, retried
    tool turns, crawl re-fetches): UDF cost scales with DISTINCT texts,
    while the added cost is one dropDuplicates shuffle of (hash, text) and
    one hash-join on a 32-char key. Output schema and content match
    extracted_df row for row (per-row input_file/input_bytes lineage is
    preserved from the original scan; `lineage=False` skips the
    input_file capture and emits NULL, mirroring extracted_df's flag);
    work distribution is by content hash — uniform by construction, so
    no conversation-length skew."""
    from ..udf import extract_distinct_map_in_pandas
    from ..schema import EXTRACT_SCHEMA

    ensure_py_files(df.sparkSession)
    gated = (df
             .select("conv_id", "turn_idx", "role", "tool", "ts", "text")
             .filter(F.col("text").isNotNull() & (F.length("text") > 0)))
    if lineage:
        gated = gated.withColumn("input_file", F.input_file_name())
    hashed = (gated
              # sha256, not md5: the hash is a content-EQUALITY key here
              # (md5 chosen-prefix collisions are practical, and a collision
              # would silently assign one page's extraction to another)
              .withColumn("h", F.sha2(F.col("text"), 256))
              # utf-8 input size per row, captured before text is dropped
              .withColumn("input_bytes", F.octet_length("text").cast("long")))
    if not partitions:
        partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    distinct = (hashed.select("h", "text")
                .dropDuplicates(["h"])
                .repartition(partitions, "h"))
    res_schema = ("h string, "
                  + ", ".join(f"{f.name} {f.dataType.simpleString()}"
                              for f in EXTRACT_SCHEMA.fields)
                  + ", output_bytes long")
    res = distinct.mapInPandas(extract_distinct_map_in_pandas, schema=res_schema)
    joined = hashed.drop("text").join(res, "h")
    out = joined.select(
        "conv_id", "turn_idx", "role", "tool", "ts",
        *[f.name for f in EXTRACT_SCHEMA.fields],
        "input_bytes", "output_bytes",
        # schema parity with extracted_df(lineage=False): column present,
        # NULL values — nothing was captured, so nothing transits the join
        *([F.col("input_file")] if lineage
          else [F.lit(None).cast("string").alias("input_file")]))
    return out.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


def run_extract(spark: SparkSession, input_path: str, output_path: str,
                n_buckets: int = DEFAULT_N_BUCKETS,
                salt_span: int = DEFAULT_SALT_SPAN,
                partitions: int | None = None,
                resume: bool = True,
                bucket_batch: int | None = None,
                files_per_bucket: int | None = None,
                dedup_texts: bool = False) -> dict:
    """Run (or resume) the extraction job. Returns run metrics.

    Buckets are processed in WAVES of `bucket_batch` (default: quarter of
    the missing buckets, min 8): each wave is written + manifested before
    the next starts, so a killed job loses at most one in-flight wave and a
    resume skips every committed bucket. At 100 TB this is the knob that
    bounds the blast radius of a failure.

    The input text column is scanned exactly ONCE per wave (the extract
    pass itself); with dedup_texts=True it is read twice (hash side +
    distinct side of the self-join) in exchange for extracting each
    distinct text once. The extraction UDF is strictly 1-row-in/1-row-out and
    emits input_bytes + input_file lineage columns, so every manifest
    metric (rows, input/output bytes, source files) is derived from one
    scan of the much smaller written output. input_rows counts rows that
    entered extraction, i.e. after the null/empty-text scan gate.

    files_per_bucket (optional) bounds the sink's file count: without it,
    every UDF partition that holds a bucket's rows writes a file into that
    bucket dir (up to `partitions` files/bucket — fine for throughput, bad
    for 100-TB namenode/manifest pressure). Setting it adds one exchange on
    (bucket, file-salt) after extraction plus a sortWithinPartitions on
    (conv_id, turn_idx), so each bucket dir gets ~files_per_bucket files
    whose rows are stored in stable turn order (better scan locality and
    parquet compression for downstream readers).
    """
    # Dynamic per-partition overwrite is load-bearing: with the static
    # default, wave 2 (or a resume) would DELETE every previously committed
    # bucket directory under output_path (ADVICE r1). build_session sets it,
    # but run_extract accepts any SparkSession — enforce it here, and
    # restore the caller's value afterwards: leaving it flipped silently
    # changes overwrite semantics of UNRELATED partitioned writes later in
    # the same session (ADVICE r2).
    _MODE_KEY = "spark.sql.sources.partitionOverwriteMode"
    try:
        prev_mode = spark.conf.get(_MODE_KEY)
    except Exception:
        prev_mode = "static"  # spark's shipped default
    spark.conf.set(_MODE_KEY, "dynamic")
    try:
        return _run_extract_waves(
            spark, input_path, output_path, n_buckets, salt_span,
            partitions, resume, bucket_batch, files_per_bucket, dedup_texts)
    finally:
        spark.conf.set(_MODE_KEY, prev_mode or "static")


def _run_extract_waves(spark, input_path, output_path, n_buckets, salt_span,
                       partitions, resume, bucket_batch, files_per_bucket,
                       dedup_texts) -> dict:
    df_all = read_transcripts(spark, input_path)

    mio = _ManifestIO(spark, output_path)
    done = load_manifest(output_path, spark=spark,
                         expect_input_path=input_path,
                         expect_n_buckets=n_buckets) if resume else {}
    # Purge bucket dirs/manifests not certified by `done` BEFORE processing:
    # an incompatible prior run (different input_path / n_buckets) or a
    # non-resume rerun leaves data dirs dynamic overwrite never clears,
    # silently corrupting the combined dataset (ADVICE r2).
    stale = mio.clean_stale(keep=set(done))
    missing = [b for b in range(n_buckets) if b not in done]
    if not missing:
        return {"skipped": True, "completed_buckets": len(done),
                "stale_buckets_removed": len(stale)}
    if bucket_batch is None:
        bucket_batch = max(8, len(missing) // 4)

    df_all = df_all.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))

    totals = {"input_rows": 0, "input_bytes": 0, "output_rows": 0,
              "ok_rows": 0, "error_rows": 0, "buckets_written": 0,
              "resumed_buckets_skipped": len(done), "waves": 0,
              "stale_buckets_removed": len(stale)}

    for w in range(0, len(missing), bucket_batch):
        wave = missing[w:w + bucket_batch]
        df = df_all.filter(F.col("bucket").isin(wave))
        if dedup_texts:
            out = extracted_dedup_df(df.drop("bucket"), n_buckets=n_buckets,
                                     partitions=partitions)
        else:
            out = extracted_df(df.drop("bucket"), n_buckets=n_buckets,
                               salt_span=salt_span, partitions=partitions)
        if files_per_bucket:
            # distinct hash seed: pmod(xxhash64(conv_id), k) with the SAME
            # hash as the bucket column is fully correlated when
            # gcd(k, n_buckets) > 1 (power-of-two defaults collapse every
            # bucket to ONE salt -> one skewed write task; review finding)
            fsalt = F.pmod(F.xxhash64(F.lit("fsalt"), F.col("conv_id")),
                           F.lit(files_per_bucket))
            # leading "bucket" satisfies the dynamic-partition writer's
            # required ordering, so it won't re-sort (and destroy the
            # (conv_id, turn_idx) order) at write time
            out = (out.repartition(len(wave) * files_per_bucket,
                                   F.col("bucket"), fsalt)
                   .sortWithinPartitions("bucket", "conv_id", "turn_idx"))
        (out.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(output_path))

        # per-bucket manifest (rows/bytes/lineage) from ONE column-pruned
        # scan of this wave's written bucket dirs — neither the input nor
        # the extracted text column is re-read (byte sizes are UDF-emitted).
        # EXPLICIT schema: a fully-empty wave writes no data files and
        # schema inference would fail (empty-input robustness)
        from pyspark.sql.types import IntegerType, StructField, StructType
        written_schema = StructType(
            list(EXTRACTED_SCHEMA.fields)
            + [StructField("bucket", IntegerType(), True)])
        try:
            written = (spark.read.schema(written_schema).parquet(output_path)
                       .filter(F.col("bucket").isin(wave)))
            rows_ok = True
        except Exception:
            rows_ok = False  # nothing ever written (e.g. empty input)
        rows = [] if not rows_ok else (written.groupBy("bucket")
                .agg(F.count("*").alias("output_rows"),
                     F.sum("output_bytes").alias("output_bytes"),
                     F.sum("input_bytes").alias("input_bytes"),
                     F.sum(F.when(F.col("extract_ok"), 1).otherwise(0)).alias("ok_rows"),
                     F.sum(F.when(~F.col("extract_ok"), 1).otherwise(0)).alias("error_rows"),
                     F.approx_count_distinct("conv_id").alias("approx_convs"),
                     F.countDistinct("input_file").alias("n_input_files"),
                     F.min("input_file").alias("first_input_file"))
                .collect())
        seen_buckets = set()
        for r in rows:
            rec = {"bucket": int(r["bucket"]),
                   "input_rows": int(r["output_rows"]),  # UDF is 1-in/1-out
                   "output_rows": int(r["output_rows"]),
                   "input_bytes": int(r["input_bytes"] or 0),
                   "output_bytes": int(r["output_bytes"] or 0),
                   "ok_rows": int(r["ok_rows"]),
                   "error_rows": int(r["error_rows"]),
                   "approx_convs": int(r["approx_convs"]),
                   "n_input_files": int(r["n_input_files"]),
                   "first_input_file": r["first_input_file"],
                   "input_path": input_path,
                   "n_buckets": n_buckets}
            mio.write_atomic(rec)
            seen_buckets.add(rec["bucket"])
        # buckets with zero input rows are complete too — manifest them so
        # resume doesn't re-plan them forever
        for b in wave:
            if b not in seen_buckets:
                mio.write_atomic({
                    "bucket": b, "input_rows": 0, "output_rows": 0,
                    "input_bytes": 0, "output_bytes": 0,
                    "ok_rows": 0, "error_rows": 0, "approx_convs": 0,
                    "n_input_files": 0, "first_input_file": None,
                    "input_path": input_path, "n_buckets": n_buckets})
        totals["input_rows"] += sum(int(r["output_rows"]) for r in rows)
        totals["input_bytes"] += sum(int(r["input_bytes"] or 0) for r in rows)
        totals["output_rows"] += sum(int(r["output_rows"]) for r in rows)
        totals["ok_rows"] += sum(int(r["ok_rows"]) for r in rows)
        totals["error_rows"] += sum(int(r["error_rows"]) for r in rows)
        totals["buckets_written"] += len(rows)
        totals["waves"] += 1

    return totals
