"""Bucketed-table layout: pre-shuffle a fact table ONCE at write time
so every later join/aggregation on the bucket key runs shuffle-free.

This is the storage-level half of the 100 TB join story. A repeated
join (fact ⋈ fact, or fact ⋈ large-dim) on the same key pays a full
shuffle of both sides per query; bucketing moves that shuffle to write
time — `bucketBy(n, key)` hash-partitions rows into `n` files per
partition — and Catalyst then plans SortMergeJoin / hash aggregation
over matching bucket layouts with NO Exchange on the bucketed side(s).
At 100 TB the write-side cost amortizes over every downstream query;
the reference engine has no analogue (its only sink is Kafka,
SURVEY.md §2.1 #11).

No oracle twin: bucketing is a physical-layout property, invisible to
result values by design — verification is plan-shape (zero Exchange)
plus result equality against the unbucketed join, in
tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    external parquet table registered in the session catalog.

    ``num_buckets`` should be sized so one bucket of the LARGEST table
    using this layout fits a single task comfortably (~128-256 MB);
    all tables that join on ``bucket_cols`` must use the same count,
    or Spark falls back to shuffling the mismatched side.
    """
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two catalog tables previously written with matching
    ``bucketBy`` layouts on ``on`` — planned with zero Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
