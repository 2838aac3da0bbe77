"""Shared corpus-prep expression machinery (round 9).

These builders were born inside ``__spark_entry__.py``'s registered
queries (q_corpus_prep / q_seq_pack / q_token_pack) and moved here so the
production job (`corpus_prep_job.run_corpus_prep`) and the oracled query
provably execute the SAME code — the round-8 review already showed that
two hand-kept copies of plan-shape-sensitive machinery drift
(`_pack_sequences` consolidation); a job/query split would reopen that.
``__spark_entry__`` imports them back under its historical private names.

Everything here builds JVM-side Catalyst expressions (higher-order
functions, windows, joins) — no Python executes per row, so none of this
needs to ship to executor Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

#: quality-gate stopword probe (SURVEY §2 quality ops; tiny by design —
#: the gate measures "has SOME function words", not language ID)
DEFAULT_STOPWORDS = ("the", "of", "and", "to", "a", "in", "is", "it",
                     "that", "for")


def tokens_expr(col: str = "text"):
    """The corpus-prep whitespace tokenizer, as one shared expression:
    lower → trim → split on runs of whitespace. Every stage of the chain
    (gate, grams, packing) must tokenize identically or survivors drift
    between stages."""
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def conf_true(spark: SparkSession, key: str) -> bool:
    """True unless the session explicitly set `key` to false (both
    exchange-reuse knobs are default-on)."""
    try:
        return spark.conf.get(key).lower() == "true"
    except Exception:
        return True


def zip_grams(toks_expr, k: int, m):
    """k-gram array as k shifted slices zip_with-ed together, O(k·n)
    per row. The transform-over-sequence construction is O(n²) when the
    token source is an INLINE expression: catalyst's filter pushdown
    substitutes column aliases into HOF lambda bodies, so
    slice(split(text), i, k) re-runs the split once per element
    (measured: 79s → 9s on corpus_prep at sf0.1). Here split(text)
    appears only as the k slice arguments — evaluated k times per row,
    never per element — and the lambda body touches lambda vars only.
    `m` is the gram-count expression (n-k+1, clamped ≥0)."""
    acc = F.slice(toks_expr, 1, m)
    for j in range(2, k + 1):
        acc = F.zip_with(acc, F.slice(toks_expr, j, m),
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return acc


def corpus_gate_pred(stopwords=DEFAULT_STOPWORDS, min_tokens: int = 30,
                     min_stopword_ratio: float = 0.01,
                     max_bigram_dup: float = 0.1):
    """Quality-gate predicate over a bound token-array lambda variable —
    token count, stopword ratio, bigram-repetition fraction, all narrow
    JVM HOF expressions (zero shuffles). Use as
    ``df.filter(F.forall(F.array(toks), corpus_gate_pred()))`` — the
    forall(array(·)) wrapper is a let-binding so the tokenization runs
    ONCE per row (catalyst inlines column aliases into filters; measured
    ~160µs/row x ~8 re-evaluations without it)."""
    stop = F.array(*[F.lit(w) for w in stopwords])

    def pred(t):
        # t is a bound lambda variable carrying the token array — every
        # reference is a cheap variable read
        n = F.size(t).cast("long")
        sw = F.round(
            F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
            / n, 4)
        bigrams = zip_grams(t, 2, F.greatest(n - 1, F.lit(0)).cast("int"))
        dupf = F.when(
            n >= 2,
            F.round(1.0 - F.size(F.array_distinct(bigrams))
                    / (n - 1), 4)).otherwise(F.lit(0.0))
        return ((n >= min_tokens) & (sw >= min_stopword_ratio)
                & (dupf <= max_bigram_dup))

    return pred


def seed_bench_grams(tr: DataFrame, gram_width: int = 8,
                     n_seeds: int = 3) -> list[str]:
    """The demo benchmark set used by the oracled q_corpus_prep AND the
    job's equality tests: the first-`gram_width`-token gram of the
    EXTRACTED text of turn 0 of the `n_seeds` smallest conv_ids. Bounded
    by construction (two driver collects of ≤ n_seeds rows; the
    conv_id/turn_idx filters push to the parquet scan before the UDF
    stage). Production jobs pass a real benchmark-gram table instead
    (run_corpus_prep's bench_grams_path)."""
    from .extract_job import extracted_df

    ids = [r[0] for r in (tr.filter(F.col("turn_idx") == 0)
                          .select("conv_id").distinct()
                          .orderBy("conv_id").limit(n_seeds).collect())]
    btoks = tokens_expr()
    rows = (extracted_df(
        tr.filter((F.col("turn_idx") == 0) & F.col("conv_id").isin(ids)),
        partitions=1)  # ≤ n_seeds rows — don't spin up 2×CPUs UDF tasks
        .filter(F.col("extract_ok") & (F.length("text") > 0))
        .select(F.when(F.size(btoks) >= gram_width,
                       F.concat_ws(" ", F.slice(btoks, 1, gram_width)))
                .alias("gram"))
        .filter(F.col("gram").isNotNull()).collect())
    return sorted({r["gram"] for r in rows})


def pack_sequences(spark: SparkSession, base: DataFrame, narrow: DataFrame,
                   group_col: str, order_cols, seq_len: int) -> DataFrame:
    """Fixed-length packing via the two-level exclusive prefix sum — the
    ONE copy of the plan-shape-sensitive machinery shared by q_seq_pack,
    q_corpus_prep stage 5, and run_corpus_prep (review finding r8: two
    hand-kept copies had to stay in sync or a fix to one would silently
    miss the other).

    `base` carries (group_col, *order_cols, toks, n); `narrow` the same
    minus toks. The prefix sum runs on `narrow` ONLY — column pruning
    must produce byte-identical range-exchange subtrees in the totals
    and cumsum branches so ReusedExchange pins them to one physical
    shuffle (see q_seq_pack's docstring for the full why)."""
    order_cols = list(order_cols)
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    parts = (narrow.repartitionByRange(n_parts, group_col, *order_cols)
             .withColumn("_pid", F.spark_partition_id()))
    if not (conf_true(spark, "spark.sql.exchange.reuse")
            or conf_true(spark, "spark.sql.adaptive.enabled")):
        # unreachable under default configs (both knobs default-on). The
        # cache is intentionally NOT unpersist()ed here — the query is
        # lazy and the blocks must outlive this builder; a caller that
        # disables BOTH knobs owns the unpersist after its action.
        parts = parts.persist()
    totals = parts.groupBy("_pid", group_col).agg(F.sum("n").alias("_tot"))
    w_off = (Window.partitionBy(group_col).orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_pid", group_col,
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
        .cast("long").alias("_off"))
    w_local = (Window.partitionBy("_pid", group_col).orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, -1))
    local_before = F.coalesce(F.sum("n").over(w_local), F.lit(0))
    starts = (parts.withColumn("_lb", local_before)
              .join(F.broadcast(offsets), ["_pid", group_col])
              .select(*order_cols, (F.col("_off") + F.col("_lb"))
                      .cast("long").alias("gstart")))
    g = base.join(starts, order_cols)
    s0 = F.floor(F.col("gstart") / seq_len)
    s1 = F.floor((F.col("gstart") + F.col("n") - 1) / seq_len)
    spans = (g.select(group_col, "toks", "n", "gstart",
                      F.explode(F.sequence(s0, s1)).alias("seq_idx"))
             .withColumn("lo", F.greatest(F.col("gstart"),
                                          F.col("seq_idx") * seq_len))
             .withColumn("hi", F.least(F.col("gstart") + F.col("n") - 1,
                                       F.col("seq_idx") * seq_len
                                       + (seq_len - 1))))
    at = (lambda pos: F.element_at(
        "toks", (pos - F.col("gstart") + 1).cast("int")))
    spans = spans.select(
        group_col, F.col("seq_idx").cast("long").alias("seq_idx"),
        (F.col("hi") - F.col("lo") + 1).alias("cnt"),
        F.col("lo").alias("lo_gpos"), at(F.col("lo")).alias("lo_tok"),
        F.col("hi").alias("hi_gpos"), at(F.col("hi")).alias("hi_tok"))
    return (spans.groupBy(group_col, "seq_idx")
            .agg(F.sum("cnt").cast("long").alias("n_tokens"),
                 F.min_by("lo_tok", "lo_gpos").alias("first_tok"),
                 F.max_by("hi_tok", "hi_gpos").alias("last_tok")))
