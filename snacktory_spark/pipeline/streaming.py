"""Structured-Streaming extraction (optional incremental mode).

The reference is strictly batch (SURVEY.md §2.6: snacktory is stateless per
document), so streaming is an extension, not a port: new transcript files
land in a directory/Iceberg table → readStream → the SAME vectorized
extraction stage → writeStream parquet with checkpointing. Extraction is
stateless per row, so no watermark/state is needed; exactly-once comes from
the sink checkpoint. `run_streaming_once` uses availableNow to drain the
backlog and stop — the incremental analog of the batch job's manifest
resume.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..schema import EXTRACTED_SCHEMA, TRANSCRIPT_SCHEMA
from ..udf import extract_map_in_pandas


def streaming_extracted(spark: SparkSession, input_dir: str):
    from .extract_job import ensure_py_files
    ensure_py_files(spark)
    stream = (spark.readStream
              .schema(TRANSCRIPT_SCHEMA)
              .parquet(input_dir))
    gated = (stream
             .select("conv_id", "turn_idx", "role", "tool", "ts", "text")
             .filter(F.col("text").isNotNull() & (F.length("text") > 0)))
    return gated.mapInPandas(extract_map_in_pandas, schema=EXTRACTED_SCHEMA)


def run_streaming_once(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str, timeout_sec: int = 300) -> bool:
    """Drain all currently-available input files, then stop (availableNow)."""
    out = streaming_extracted(spark, input_dir)
    query = (out.writeStream
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .outputMode("append")
             .start())
    return query.awaitTermination(timeout_sec)
