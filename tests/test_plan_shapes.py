"""Physical-plan regression gate: the 100-TB-critical plan shapes are
ASSERTED, not just documented in BENCH/PLANS.md. A change that turns a
broadcast hash join into a nested loop, drops a pushed filter, or
collapses a window onto one partition fails here."""

import io
import sys
from contextlib import redirect_stdout

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from snacktory_spark.pipeline.extract_job import build_session
    spark = build_session(app="pytest-plans", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="module")
def em():
    import __spark_entry__ as em
    return em


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


FORBIDDEN_EVERYWHERE = ("BroadcastNestedLoopJoin", "CartesianProduct")


def _check(plan: str):
    for bad in FORBIDDEN_EVERYWHERE:
        assert bad not in plan, f"{bad} crept into a headline plan"
    return plan


def test_extraction_pushdown_and_single_exchange(spark):
    from snacktory_spark.pipeline.extract_job import (extracted_df,
                                                      read_transcripts)
    tdf = read_transcripts(
        spark, "/root/repo/data/synth/sf0.001/transcripts.parquet")
    plan = _check(plan_of(extracted_df(tdf)))
    assert "PushedFilters: [IsNotNull(text)]" in plan
    # exactly ONE exchange: the salted repartition (AQE may add query
    # stages, but only one Exchange node may exist in the initial plan)
    assert plan.count("+- Exchange") + plan.count(":- Exchange") == 1
    assert "MapInPandas" in plan


def test_broadcast_joins_for_small_dims(spark, em):
    plan = _check(plan_of(em.q_nation_orders(spark, SF_DIR)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anti_join_shape(spark, em):
    plan = _check(plan_of(em.q_customers_without_orders(spark, SF_DIR)))
    assert "LeftAnti" in plan


def test_top_k_uses_window_group_limit(spark, em):
    plan = _check(plan_of(em.q_top_orders_per_segment(spark, SF_DIR)))
    assert "WindowGroupLimit" in plan


def test_token_pack_window_is_partitioned(spark, em):
    df = em.q_token_pack(spark, SF_DIR)
    plan = _check(plan_of(df))
    # the data window must be partitioned by _pid — never a global
    # single-partition sort of the table (VERDICT r2 wrong #1)
    assert "windowspecdefinition(_pid" in plan
    assert "rangepartitioning(doc_id" in plan
    # LOAD-BEARING: the totals branch and the cumsum branch must share
    # ONE physical range shuffle (independent executions could sample
    # different boundaries -> silently wrong shards). Assert the executed
    # plan reuses the exchange.
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_decontaminate_is_hash_join(spark, em):
    plan = _check(plan_of(em.q_decontaminate(spark, SF_DIR)))
    assert "BroadcastHashJoin" in plan
    assert "Generate" in plan  # exploded grams, not substring scans


def test_chunk_dedup_prunes_map_side(spark, em):
    plan = _check(plan_of(em.q_chunk_dedup(spark, SF_DIR)))
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def test_source_quota_prunes_map_side(spark, em):
    plan = _check(plan_of(em.q_source_quota(spark, SF_DIR)))
    assert plan.count("WindowGroupLimit") >= 2


def test_vocab_topk_never_global_sorts(spark, em):
    plan = _check(plan_of(em.q_vocab_topk(spark, SF_DIR)))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan  # a global ORDER BY would add one


def test_no_python_row_udfs_in_relational_plans(spark, em):
    # ArrowEvalPython (pandas UDF) or BatchEvalPython (row UDF) in the
    # relational headliners would mean Python crept into the hot path
    for name in ("pricing_summary", "event_sessions", "doc_token_stats",
                 "doc_repetition", "knn_cosine"):
        plan = _check(plan_of(em.queries()[name](spark, SF_DIR)))
        assert "EvalPython" not in plan, name
