"""Physical-plan guardrails (SURVEY.md §4): these tests pin the
*scale* properties — pushdown, pruning, broadcast, top-k — that the
value-level oracle can't see. A regression here is a 100-TB regression
even when results stay correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from direct_kafka_stream_spark import QUERIES
from direct_kafka_stream_spark.io import load_table
from direct_kafka_stream_spark.plans import inspect

from tests.conftest import SF_DIR


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["q_filter"].spark(spark, SF_DIR)
    pushed = inspect.pushed_filters(df)
    assert "l_quantity" in pushed
    assert "l_returnflag" in pushed


def test_projection_prunes_scan_columns(spark):
    df = QUERIES["q_project"].spark(spark, SF_DIR)
    rs = inspect.read_schema(df)
    assert "l_extendedprice" in rs
    assert "l_shipdate" not in rs  # unreferenced column never read
    assert "l_returnflag" not in rs


def test_multiway_join_broadcasts_dims(spark):
    df = QUERIES["q_join_multiway"].spark(spark, SF_DIR)
    plan = inspect.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    # the date filter must prune orders before the fact join
    assert "1997" in plan or "o_orderdate" in inspect.pushed_filters(df)


def test_limit_is_topk_not_global_sort(spark):
    df = QUERIES["q_limit"].spark(spark, SF_DIR)
    assert inspect.plan_contains(df, "TakeOrderedAndProject")


def test_hot_path_is_codegen(spark):
    """The TPC-H-Q1-shaped aggregate must run inside whole-stage
    codegen (JVM, vectorized), not interpreted."""
    df = QUERIES["q_agg_group"].spark(spark, SF_DIR)
    assert inspect.codegen_stage_count(df) >= 1


def test_semi_join_planned(spark):
    df = QUERIES["q_join_semi"].spark(spark, SF_DIR)
    assert inspect.plan_contains(df, "LeftSemi")


def test_partition_pruning_shape(spark):
    """Filters on the broadcast side reduce the build side before the
    exchange — region filter must sit under the broadcast, not above
    the join."""
    r = load_table(spark, SF_DIR, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, SF_DIR, "nation")
    df = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    pushed = inspect.pushed_filters(df)
    assert "r_name" in pushed


def test_asof_join_is_single_shuffle(spark):
    """The as-of join must plan as ONE hash shuffle on the key (union +
    running window), never a quadratic range join — the property that
    makes it survive 100 TB."""
    df = QUERIES["q_join_asof"].spark(spark, SF_DIR)
    assert inspect.exchange_count(df) == 1
    assert "NestedLoop" not in inspect.physical_plan(df)


def test_q18_broadcasts_filtered_aggregate(spark):
    """Q18's HAVING-filtered order set must broadcast into the orders
    join (no second fact shuffle) and the final top-k must be
    TakeOrdered, not a global sort."""
    df = QUERIES["q_tpch_q18"].spark(spark, SF_DIR)
    plan = inspect.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert inspect.plan_contains(df, "TakeOrderedAndProject")


def test_correlated_subquery_decorrelates(spark):
    """Catalyst must rewrite the Q17 correlated subquery into an
    aggregate + join (no per-row subquery execution): the plan contains
    a join and a partial/final aggregate pair, not a Subquery node per
    row."""
    df = QUERIES["q_subquery_correlated"].spark(spark, SF_DIR)
    plan = inspect.physical_plan(df)
    assert "Join" in plan
    assert "HashAggregate" in plan
