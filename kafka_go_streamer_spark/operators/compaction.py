"""Small-file compaction: rewrite a parquet dataset into
size-targeted files.

The classic large-pipeline failure mode: a streaming sink or an
over-parallel batch write leaves thousands of KB-sized parquet files
per partition, and every later scan pays a task per file (plus
NameNode/listing pressure). Compaction rewrites the data into files
near a target size. The reference engine has no storage at all (its
only sink is Kafka, SURVEY.md §2.1 #11); this is storage-level
machinery for the materialized artifacts this repo DOES write (the IVF
vector store, bucketed tables, checkpointed sinks).

Spark-first shape: measure the dataset's on-disk bytes from the file
listing (driver-side metadata, no data read), derive the output file
count, and rewrite via ``repartition(n)`` — one round-robin shuffle
that also heals skewed input files. For partitioned datasets, compact
WITHIN each partition directory so partition pruning is preserved.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Target bytes per output file. Parquet-on-object-store sweet spot is
#: 128 MB - 1 GB; tests shrink it to force multi-file layouts.
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dataset_files(path: str, suffix: str = ".parquet") -> list[str]:
    """All data files under ``path`` (recursive), metadata skipped."""
    out: list[str] = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(suffix) and not n.startswith(("_", ".")):
                out.append(os.path.join(root, n))
    return out


def plan_file_count(total_bytes: int, target_bytes: int) -> int:
    """ceil(total/target), minimum 1 — pure so it is unit-testable."""
    if total_bytes <= 0:
        return 1
    return -(-total_bytes // target_bytes)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite the parquet dataset at ``src`` into ``dst`` with files
    sized near ``target_bytes``; returns the planned file count.

    The size estimate comes from the INPUT listing (compressed bytes),
    so the output lands near the target without a pre-pass over the
    data. One round-robin repartition — no key skew, no sort."""
    files = dataset_files(src)
    total = sum(os.path.getsize(f) for f in files)
    n = plan_file_count(total, target_bytes)
    spark.read.parquet(src).repartition(n).write.mode(
        "overwrite"
    ).parquet(dst)
    return n


def compact_partitioned_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_col: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict[str, int]:
    """Compact a hive-partitioned dataset WITHOUT destroying its
    layout: each ``{partition_col}=value`` directory is rewritten
    independently to its own size-derived file count, so partition
    pruning (and any DPP probe against it, cf. operators/ivf_store.py)
    keeps working. Returns {partition_value: file_count}.

    Per-partition writes are independent jobs — on a cluster they
    pipeline; the listing work is pure driver-side metadata."""
    out: dict[str, int] = {}
    prefix = partition_col + "="
    for entry in sorted(os.listdir(src)):
        if not entry.startswith(prefix):
            continue
        part_src = os.path.join(src, entry)
        files = dataset_files(part_src)
        total = sum(os.path.getsize(f) for f in files)
        n = plan_file_count(total, target_bytes)
        spark.read.parquet(part_src).repartition(n).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, entry))
        out[entry[len(prefix):]] = n
    return out
