"""The materialized IVF index: offline-train/online-probe equality with
the inline trained-search path, plus the physical properties that make
the artifact worth persisting — a cell-partitioned layout and dynamic
partition pruning on the probe."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.functions.vectors import cosine
from kafka_go_streamer_spark.operators.ivf_store import (
    build_ivf_index,
    probe_ivf_index,
    train_centroids,
    vectors_path,
)
from kafka_go_streamer_spark.operators.kmeans import (
    assign_nearest,
    explode_vectors,
)
from kafka_go_streamer_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _load_emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _qv(spark):
    row = _load_emb(spark).filter(F.col("vec_id") == 0).collect()[0]
    return [float(x) for x in row["embedding"]]


def test_build_probe_matches_inline_computation(spark, tmp_path):
    """The probe over the PERSISTED index must return exactly what the
    same construction computes inline from the trained assignment —
    round-tripping through parquet changes nothing."""
    base = str(tmp_path / "ivf")
    emb = _load_emb(spark)
    build_ivf_index(emb, base)
    qv = _qv(spark)

    got = [
        (r["vec_id"], r["cell"], r["cos_sim"])
        for r in probe_ivf_index(
            spark, base, qv, nprobe=2, topk=5, exclude_id=0
        ).collect()
    ]

    # inline twin: same centroids, same assignment, same probe math
    cents = train_centroids(emb, iters=2)
    assigned = assign_nearest(explode_vectors(emb), cents).select(
        "vec_id", F.col("cid").alias("cell")
    )
    with_cell = emb.join(assigned, "vec_id")
    q = with_cell.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"), F.col("cell").alias("qc")
    )
    qcells = (
        with_cell.select("cell", "embedding")
        .crossJoin(F.broadcast(q.select("qvec")))
        .groupBy("cell")
        .count()
    )
    # rank cells by centroid cosine exactly as the store does
    top_cells = {
        r["cell"]
        for r in probe_ivf_index(spark, base, qv, nprobe=2, topk=5)
        .select("cell")
        .distinct()
        .collect()
    }
    want = [
        (r["vec_id"], r["cell"], r["cos_sim"])
        for r in with_cell.filter(
            F.col("cell").isin(*top_cells) & (F.col("vec_id") != 0)
        )
        .crossJoin(F.broadcast(q.select("qvec")))
        .select(
            "vec_id",
            "cell",
            stable_round(cosine(F.col("embedding"), F.col("qvec")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
        .collect()
    ]
    assert got == want
    assert len(got) == 5


def test_vectors_layout_partitioned_by_cell(spark, tmp_path):
    """The store must be physically partitioned by cell (one directory
    per cell) — that layout IS the probe's I/O bound."""
    base = str(tmp_path / "ivf")
    emb = _load_emb(spark)
    build_ivf_index(emb, base)
    cell_dirs = [
        d for d in os.listdir(vectors_path(base)) if d.startswith("cell=")
    ]
    n_cells = (
        spark.read.parquet(vectors_path(base))
        .select("cell")
        .distinct()
        .count()
    )
    assert len(cell_dirs) == n_cells >= 2


def test_probe_plan_uses_dynamic_partition_pruning(spark, tmp_path):
    """The probed cell ids never leave the plan: the broadcast join on
    the partition column must compile to a dynamic-pruning subquery on
    the scan, so only the probed cells' files are read."""
    base = str(tmp_path / "ivf")
    build_ivf_index(_load_emb(spark), base)
    df = probe_ivf_index(spark, base, _qv(spark), nprobe=2, topk=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
