"""Small-file compaction: size-derived output file counts, value
preservation, and partition-layout preservation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_go_streamer_spark.operators.compaction import (
    compact_parquet,
    compact_partitioned_parquet,
    dataset_files,
    plan_file_count,
)
from kafka_go_streamer_spark.sources.tables import load_table


def test_plan_file_count_math():
    assert plan_file_count(0, 100) == 1
    assert plan_file_count(1, 100) == 1
    assert plan_file_count(100, 100) == 1
    assert plan_file_count(101, 100) == 2
    assert plan_file_count(1000, 100) == 10


def test_compact_many_small_files_to_one(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(64).write.parquet(src)  # fragment: 64 tiny files
    assert len(dataset_files(src)) == 64

    n = compact_parquet(spark, src, dst, target_bytes=1 << 30)
    assert n == 1
    assert len(dataset_files(dst)) == 1
    # every row preserved bit-exact (per-row compare: no float
    # re-aggregation, whose sum order would differ across layouts)
    a = spark.read.parquet(src).select("event_id", "value").collect()
    b = spark.read.parquet(dst).select("event_id", "value").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_compact_respects_target_size(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "sized")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(32).write.parquet(src)
    total = sum(os.path.getsize(f) for f in dataset_files(src))
    target = max(total // 4, 1)
    n = compact_parquet(spark, src, dst, target_bytes=target)
    assert n == plan_file_count(total, target)
    assert len(dataset_files(dst)) == n
    assert n >= 4  # actually split, not a single blob


def test_partitioned_compaction_preserves_pruning(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "part_frag"), str(tmp_path / "part_compact")
    ev = load_table(spark, sf_dir, "events")
    # fragmented partitioned layout: many files inside each partition
    ev.repartition(16).write.partitionBy("event_type").parquet(src)
    counts = compact_partitioned_parquet(
        spark, src, dst, "event_type", target_bytes=1 << 30
    )
    assert set(counts.values()) == {1}
    # layout preserved: partition dirs survive...
    dirs = {e for e in os.listdir(dst) if e.startswith("event_type=")}
    assert dirs == {f"event_type={k}" for k in counts}
    # ...and a partition filter reaches the scan as a PartitionFilter
    # (pruning, not a post-scan row filter) with values intact
    df = spark.read.parquet(dst)
    one = sorted(counts)[0]
    filtered = df.filter(F.col("event_type") == one)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert f"event_type#" in plan.split("PartitionFilters:")[1][:200]
    got = filtered.count()
    want = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == one)
        .count()
    )
    assert got == want
