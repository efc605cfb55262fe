"""Materialized IVF index: the offline-training / online-probe split.

``ann_ivf_search_trained`` (plans/scale_ops.py) trains its Lloyd
centroids inline so the whole path stays oracle-checkable in one
statement — but its docstring promises what production actually does:
train ONCE offline, persist the index, and serve probes against the
artifact. This module is that artifact:

* ``build_ivf_index`` — OFFLINE: k = ceil(sqrt(n)) centroids from full
  Lloyd iterations (operators/kmeans.py primitives), persisted as

  - ``{base}/centroids`` — the trained quantizer, (cid, pos, c) long
    form, k x dims rows (tiny: ~1M x 64 even at 10^12 vectors);
  - ``{base}/vectors``  — the corpus + its cell assignment, parquet
    PARTITIONED BY cell, so a probe's I/O is pruned to the probed
    cells' directories and never scans the other ~k-1/k of the data.

* ``probe_ivf_index`` — ONLINE: score the k centroids against the
  query (a k-row job — no corpus touch), take the top ``nprobe``
  cells, and join them broadcast against the partitioned store.
  The cell ids stay INSIDE the plan (no driver collect): Spark's
  dynamic partition pruning turns the broadcast join on the partition
  column into runtime partition filters, which
  tests/test_ivf_store.py asserts on the physical plan.

The reference engine has no persistent state at all (its only sink is
Kafka, SURVEY.md §2.1 #11); this is storage-level machinery for the
north-star ANN family, verified by test equality against the inline
trained-search construction rather than a DuckDB twin (writes are not
queries).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_go_streamer_spark.functions.rounding import stable_round
from kafka_go_streamer_spark.operators.kmeans import (
    assign_nearest,
    explode_vectors,
    seed_centroids,
    update_centroids,
)


def centroids_path(base: str) -> str:
    return os.path.join(base, "centroids")


def vectors_path(base: str) -> str:
    return os.path.join(base, "vectors")


def train_centroids(
    emb: DataFrame, iters: int = 2, k: int | None = None
) -> DataFrame:
    """Trained centroid table (cid, pos, c) after ``iters`` full Lloyd
    rounds; k defaults to ceil(sqrt(n)) inside the plan (no action)."""
    k_df = (
        emb.agg(F.ceil(F.sqrt(F.count(F.lit(1)))).alias("_k"))
        if k is None
        else None
    )
    ex = explode_vectors(emb).localCheckpoint(eager=True)
    cents = seed_centroids(ex, k, k_df=k_df)
    for _ in range(iters):
        cents = update_centroids(ex, assign_nearest(ex, cents))
    return cents


def build_ivf_index(
    emb: DataFrame, base: str, iters: int = 2, k: int | None = None
) -> None:
    """OFFLINE: train the quantizer and persist the two index artifacts
    (see module docstring). The vectors table is written partitioned by
    cell — the write shuffles once on the assignment, and every later
    probe prunes to its cells' files."""
    cents = train_centroids(emb, iters=iters, k=k)
    cents.write.mode("overwrite").parquet(centroids_path(base))
    ex = explode_vectors(emb)
    assigned = assign_nearest(ex, cents).select(
        "vec_id", F.col("cid").alias("cell")
    )
    (
        emb.join(assigned, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(vectors_path(base))
    )


def _query_long(spark: SparkSession, qv: list[float]) -> DataFrame:
    """(pos, qv) long form of the query vector — a k-free tiny frame."""
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(qv)], "pos int, q double"
    )


def probe_ivf_index(
    spark: SparkSession,
    base: str,
    qv: list[float],
    nprobe: int = 2,
    topk: int = 5,
    exclude_id: int | None = None,
    min_cell_sim: float = -1.0,
) -> DataFrame:
    """ONLINE probe against a persisted index: rank the k stored
    centroids by cosine to ``qv`` (k-row work), then broadcast the top
    ``nprobe`` cell ids into the partitioned vectors table — dynamic
    partition pruning keeps the scan to those cells — and return the
    cosine top-k within them. No driver-side collect anywhere; the
    probed cell set lives inside the plan.

    ``min_cell_sim`` floors the centroid cosine a cell must clear to be
    probed (skip cells pointing away from the query even when nprobe
    would allow them). It doubles as the selective predicate Spark's
    DynamicPartitionPruning rule requires on the build side — without
    it the probe would scan every cell directory despite the join."""
    q = _query_long(spark, qv)
    q_norm = float(sum(v * v for v in qv)) ** 0.5

    cents = spark.read.parquet(centroids_path(base))
    scored = (
        cents.join(F.broadcast(q), "pos")
        .groupBy("cid")
        .agg(
            F.sum(F.col("c") * F.col("q")).alias("dot"),
            F.sum(F.col("c") * F.col("c")).alias("cc"),
        )
        .select(
            "cid",
            stable_round(
                F.col("dot") / (F.sqrt("cc") * F.lit(q_norm)), 6
            ).alias("qsim"),
        )
    )
    top_cells = (
        scored.filter(F.col("qsim") > F.lit(min_cell_sim))
        .orderBy(F.col("qsim").desc(), F.col("cid").asc())
        .limit(nprobe)
        .select(F.col("cid").alias("cell"))
    )

    vecs = spark.read.parquet(vectors_path(base))
    if exclude_id is not None:
        vecs = vecs.filter(F.col("vec_id") != exclude_id)
    qv_arr = F.array(*[F.lit(float(v)) for v in qv])
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            qv_arr,
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return (
        vecs.join(F.broadcast(top_cells), "cell")
        .select(
            "vec_id",
            "cell",
            stable_round(dot / (vnorm * F.lit(q_norm)), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(topk)
    )
