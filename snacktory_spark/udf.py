"""Arrow-vectorized extraction UDFs (SURVEY.md §1.2, §3 EP1 Spark mapping).

The whole reference library is one scalar ``String html → JResult`` function;
here it becomes a single vectorized pandas UDF / mapInPandas stage: Arrow
batch in → per-row pure-python extraction (module-level compiled regex/rule
tables, warm per worker like the reference's static Patterns) → Arrow batch
out. No per-row Python dispatch from the JVM.

Failure policy for web-scale runs: a row that throws yields an empty result
with extract_ok=false + extract_error, never a task failure.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

# DOM text/serialize walks recurse to the document depth; adversarial pages
# nest thousands of levels (the 500KB input cap bounds depth to ~100k).
# Deeper than this still degrades safely to extract_ok=false.
if sys.getrecursionlimit() < 30_000:
    sys.setrecursionlimit(30_000)

# The DOM carries parent<->child reference cycles, so every parsed document
# is reclaimed by the cyclic GC; default gen-0 threshold (700) triggers
# collections mid-parse constantly. Wider thresholds = +5-10% throughput
# (measured), bounded retention (a few documents between sweeps).
import gc as _gc  # noqa: E402

_gc.set_threshold(50_000, 500, 1_000)

from .extractor import empty_result, extract
from .schema import EXTRACT_SCHEMA

_RESULT_FIELDS = [f.name for f in EXTRACT_SCHEMA.fields]


def extract_row(text: str | None, url: str | None) -> dict:
    """Extract one row; never raises."""
    if not text:
        res = empty_result(url or "")
        res["extract_ok"] = False
        res["extract_error"] = "empty text"
        return res
    try:
        res = extract(text, url or "")
        res["extract_ok"] = True
        res["extract_error"] = None
        return res
    except Exception as e:  # noqa: BLE001 — robustness over a 10^12-row table
        res = empty_result(url or "")
        res["extract_ok"] = False
        res["extract_error"] = f"{type(e).__name__}: {e}"[:500]
        return res


def _results_to_frame(results: list[dict]) -> pd.DataFrame:
    cols: dict[str, list] = {name: [] for name in _RESULT_FIELDS}
    for res in results:
        for name in _RESULT_FIELDS:
            cols[name].append(res.get(name))
    frame = pd.DataFrame(cols)
    # TimestampType wants datetime64; dates are tz-aware UTC python datetimes
    frame["date"] = pd.to_datetime(frame["date"], utc=True, errors="coerce")
    return frame


def extract_batch(text: pd.Series, url: pd.Series | None = None) -> pd.DataFrame:
    """Vectorized batch extraction: two Series in, struct-frame out."""
    if url is None:
        url = pd.Series([""] * len(text))
    results = [extract_row(t, u) for t, u in zip(text, url)]
    return _results_to_frame(results)


def make_extract_udf():
    """Scalar Arrow-vectorized UDF returning the EXTRACT_SCHEMA struct.

    Usage: df.withColumn("res", extract_udf(col("text"), col("url")))
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(EXTRACT_SCHEMA)
    def extract_udf(text: pd.Series, url: pd.Series) -> pd.DataFrame:
        return extract_batch(text, url)

    return extract_udf


def extract_map_in_pandas(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: transcript batches → flat extracted batches.

    Expects columns conv_id, turn_idx, role, tool, ts, text (and optionally
    url). Emits EXTRACTED_SCHEMA-shaped batches. Used by the pipeline for
    fuller control over batch shape than the scalar UDF.
    """
    for pdf in iterator:
        url = pdf["url"] if "url" in pdf.columns else pd.Series([""] * len(pdf))
        out = _results_to_frame([extract_row(t, u) for t, u in zip(pdf["text"], url)])
        keys = [k for k in ("conv_id", "turn_idx", "role", "tool", "ts")
                if k in pdf.columns]
        # lineage columns (EXTRACTED_SCHEMA tail): exact input/output byte
        # sizes + source file, so manifests derive from a column-pruned scan
        # of the written output alone (no re-read of either text column)
        out["input_bytes"] = [
            len(t.encode("utf-8")) if isinstance(t, str) else 0
            for t in pdf["text"]]
        out["output_bytes"] = [
            len(t.encode("utf-8")) if isinstance(t, str) else 0
            for t in out["text"]]
        out["input_file"] = (pdf["input_file"].reset_index(drop=True)
                             if "input_file" in pdf.columns else None)
        yield pd.concat([pdf[keys].reset_index(drop=True), out], axis=1)


def extract_distinct_map_in_pandas(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage for the dedup-extract path: (h, text) batches →
    (h, <EXTRACT_SCHEMA fields>, output_bytes). One extraction per DISTINCT
    text; the caller joins results back to every row by h."""
    for pdf in iterator:
        out = _results_to_frame([extract_row(t, "") for t in pdf["text"]])
        out.insert(0, "h", pdf["h"].reset_index(drop=True))
        out["output_bytes"] = [
            len(t.encode("utf-8")) if isinstance(t, str) else 0
            for t in out["text"]]
        yield out
