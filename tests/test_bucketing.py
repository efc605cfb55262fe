"""Bucketed co-located join: writing both sides with matching
``bucketBy`` layouts must eliminate the join shuffle entirely, and the
bucketed join must return exactly the rows of the plain join."""

from __future__ import annotations

import pytest

from kafka_go_streamer_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from kafka_go_streamer_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(
        orders, "orders_b", str(base / "orders"), ["o_orderkey"], 8
    )
    write_bucketed(
        lineitem, "lineitem_b", str(base / "lineitem"), ["o_orderkey"], 8
    )
    yield "orders_b", "lineitem_b", orders, lineitem
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt, _, _ = bucketed_tables
    # force the sort-merge path: with broadcast disabled, an unbucketed
    # join MUST shuffle, so the zero-Exchange assertion below is only
    # satisfiable via the bucket layout
    with _no_broadcast(spark):
        plan = (
            bucketed_join(spark, lt, rt, ["o_orderkey"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    # SMJ on sorted buckets, or shuffled-hash under
    # preferSortMergeJoin=false — either way the load-bearing facts
    # are the absent Exchange (bucket co-partitioning reused) and the
    # bucket-pruned scan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in plan
    assert "SelectedBucketsCount" in plan


def test_unbucketed_join_shuffles_both_sides(spark, bucketed_tables):
    """Control: the same join over the raw frames plans two shuffles —
    what bucketing removed."""
    _, _, orders, lineitem = bucketed_tables
    with _no_broadcast(spark):
        plan = (
            orders.join(lineitem, "o_orderkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    assert plan.count("Exchange hashpartitioning") == 2


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt, orders, lineitem = bucketed_tables
    got = sorted(
        bucketed_join(spark, lt, rt, ["o_orderkey"]).collect(),
        key=lambda r: (r.o_orderkey, r.l_quantity, r.l_extendedprice),
    )
    want = sorted(
        orders.join(lineitem, "o_orderkey").collect(),
        key=lambda r: (r.o_orderkey, r.l_quantity, r.l_extendedprice),
    )
    assert got == want


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key reuses the layout too: partial+final
    aggregate collapse onto the bucketed scan with zero Exchange."""
    lt, _, _, _ = bucketed_tables
    from pyspark.sql import functions as F

    plan = (
        spark.table(lt)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.saved)
